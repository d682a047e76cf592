package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.pipeline.{PartitionGrain, PartitionedMaterializer}

/** Partitioned materialization + ranged backfill (reference partition
  * definitions and single_run policy, executable_component.py:19-41):
  * ranged write-set, subset replacement under dynamic overwrite, and
  * partition pruning on reads.
  */
class BackfillSpec extends SparkSpec {

  private val db = "graft_backfill_spec"

  test("grain keys: ranged write sets and key derivation") {
    assert(PartitionGrain.Daily.keys(
      LocalDate.of(1996, 1, 30), LocalDate.of(1996, 2, 2)) ==
      Seq("1996-01-30", "1996-01-31", "1996-02-01"))
    assert(PartitionGrain.Monthly.keys(
      LocalDate.of(1995, 11, 1), LocalDate.of(1996, 2, 1)) ==
      Seq("1995-11", "1995-12", "1996-01"))
    assert(PartitionGrain.parse("daily") == PartitionGrain.Daily)
    intercept[IllegalArgumentException](PartitionGrain.parse("hourly"))
  }

  test("single ranged run materializes every partition; re-run replaces a subset only") {
    val src = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val keys = PartitionedMaterializer.backfill(spark, src, "o_orderdate",
      PartitionGrain.Monthly, db, "om",
      LocalDate.of(1996, 1, 1), LocalDate.of(1996, 4, 1))
    assert(keys == Seq("1996-01", "1996-02", "1996-03"))

    val tbl = s"`$db`.`om`"
    val before = spark.table(tbl).groupBy("part_key")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(before.keySet == Set("1996-01", "1996-02", "1996-03"))

    // re-backfill ONLY February from a modified source: that partition must
    // change; January and March must be byte-for-byte untouched
    PartitionedMaterializer.backfill(spark,
      src.withColumn("o_totalprice", col("o_totalprice") * 2),
      "o_orderdate", PartitionGrain.Monthly, db, "om",
      LocalDate.of(1996, 2, 1), LocalDate.of(1996, 3, 1))
    val after = spark.table(tbl).groupBy("part_key")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after.keySet == before.keySet)
    assert(after("1996-01") == before("1996-01"))
    assert(after("1996-03") == before("1996-03"))
    assert(after("1996-02")._1 == before("1996-02")._1) // replaced, not doubled
    assert(after("1996-02")._2 == before("1996-02")._2 * 2)
  }

  test("non-aligned monthly range is refused (would clobber whole partitions)") {
    val src = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    val ex = intercept[IllegalArgumentException] {
      PartitionedMaterializer.backfill(spark, src, "o_orderdate",
        PartitionGrain.Monthly, db, "om_bad",
        LocalDate.of(1996, 1, 15), LocalDate.of(1996, 2, 1))
    }
    assert(ex.getMessage.contains("not aligned"))
  }

  test("reads prune to the requested partition at plan time") {
    val src = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate")
    PartitionedMaterializer.backfill(spark, src, "o_orderdate",
      PartitionGrain.Daily, db, "od",
      LocalDate.of(1996, 1, 1), LocalDate.of(1996, 1, 11))
    val one = PartitionedMaterializer.partition(spark, db, "od", "1996-01-05")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part_key"),
      plan.take(800))
    // the partition predicate must NOT survive as a post-scan data filter —
    // pruning happens in the file index, not per-row
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("1996-01-05"))
  }
}
