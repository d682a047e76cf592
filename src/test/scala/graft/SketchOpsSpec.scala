package graft

import org.apache.spark.sql.functions._
import graft.ops.SketchOps

/** Count-min sketch laws: addition-mergeability across shards, the
  * never-undercount invariant for EVERY gram (not just the gate's top-k),
  * forced-collision overcounting, and the top-k plan shape.
  */
class SketchOpsSpec extends SparkSpec {

  import spark.implicits._

  private def counts(dir: String) =
    SketchOps.gramsOf(Tables.t(spark, dir, "documents"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))

  test("grid of a union is the cell-wise sum of the shards' grids") {
    val docs = Tables.t(spark, sf, "documents")
    val full = SketchOps.sketchOf(
      SketchOps.gramsOf(docs).groupBy("g").agg(count(lit(1)).as("cnt")))
    val shardA = SketchOps.gramsOf(docs.filter(col("doc_id") % 2 === 0))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val shardB = SketchOps.gramsOf(docs.filter(col("doc_id") % 2 === 1))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val merged = SketchOps.sketchOf(shardA).unionByName(SketchOps.sketchOf(shardB))
      .groupBy("r", "bucket").agg(sum("bsum").as("bsum"))
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("r", "bucket").collect().toSeq.map(_.toSeq)
    assert(dump(merged) == dump(full))
  }

  test("estimate never undercounts, for every gram in the corpus") {
    val c = counts(sf).cache()
    val under = SketchOps.estimateAgainst(c, SketchOps.sketchOf(c))
      .join(c, Seq("g"))
      .filter(col("est") < col("cnt")).count()
    assert(under == 0L)
    c.unpersist()
  }

  test("forced collisions (width 2) overcount strictly but stay bounded by column mass") {
    val c = Seq(("a b c", 10L), ("d e f", 7L), ("g h i", 5L), ("j k l", 3L))
      .toDF("g", "cnt")
    val sk = SketchOps.sketchOf(c, depth = 1, width = 2L)
    val est = SketchOps.estimateAgainst(c, sk, depth = 1, width = 2L)
      .join(c, Seq("g")).collect()
      .map(r => r.getAs[String]("g") -> (r.getAs[Long]("est"), r.getAs[Long]("cnt")))
      .toMap
    // 4 grams into 2 cells: at least one pair collides (pigeonhole)
    assert(est.values.exists { case (e, c0) => e > c0 })
    // and no estimate exceeds the total mass
    assert(est.values.forall { case (e, _) => e <= 25L })
    assert(est.values.forall { case (e, c0) => e >= c0 })
  }

  test("degenerate inputs: short-doc-only and empty corpora yield empty grids, no failure") {
    val short = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    assert(SketchOps.gramsOf(short).isEmpty,
      "docs under n tokens must contribute no grams")
    val emptyCounts = SketchOps.gramsOf(short)
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    assert(SketchOps.sketchOf(emptyCounts).isEmpty)
    assert(SketchOps.estimateAgainst(emptyCounts,
      SketchOps.sketchOf(emptyCounts)).isEmpty)
  }

  test("approx-percentile verdicts hold and exact disc percentiles are true ranks") {
    val rows = SketchOps.approxPercentile(spark, sf).collect()
    assert(rows.length == 3) // A/N/R return flags
    rows.foreach { r =>
      assert(r.getAs[Int]("p50_within") == 1 && r.getAs[Int]("p90_within") == 1)
      assert(r.getAs[Long]("p50_disc") <= r.getAs[Long]("p90_disc"))
    }
    // cross-check one exact percentile against a brute-force sort
    val vals = Tables.t(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "A")
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS c")
      .orderBy("c").collect().map(_.getLong(0))
    val expect50 = vals((vals.length - 1) * 5 / 10)
    val gotA = rows.find(_.getString(0) == "A").get
    assert(gotA.getAs[Long]("p50_disc") == expect50)
  }

  test("gate verdicts hold and the top-k is a TakeOrderedAndProject, not a full-vocab window") {
    val df = SketchOps.heavyNgramsSketch(spark, sf)
    val rows = df.collect()
    assert(rows.length == SketchOps.TopK)
    assert(rows.forall(r => r.getAs[Int]("ge_exact") == 1
      && r.getAs[Int]("within_bound") == 1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k should cut via TakeOrderedAndProject before any window")
  }
}
