package graft

import org.apache.spark.sql.functions._
import graft.ops.DsirOps

/** DSIR selection laws: target-likeness monotonicity of the importance
  * weight, target exclusion from the draw, the priority arithmetic
  * recomputed from the output columns, and sample-size/determinism
  * properties on the real fixture.
  */
class DsirOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))

  test("importance weight is monotone in target-likeness") {
    // target doc 7 speaks "alpha beta"; raw doc 1 shares its bigrams,
    // raw doc 2 is disjoint — doc 1 must weigh strictly more
    val dir = graft.TempDirs.create("graft-dsir-spec")
    docsOf(
      7L -> "alpha beta alpha beta alpha",
      1L -> "alpha beta alpha beta",
      2L -> "zeta eta theta iota kappa")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = DsirOps.dsirSelect(spark, dir)
      .select("doc_id", "imp_fp").as[(Long, Long)].collect().toMap
    assert(w(1L) > w(2L), s"target-like doc must outweigh disjoint doc: $w")
    assert(!w.contains(7L), "target docs are the reference, not candidates")
  }

  test("priority arithmetic: priority_fp = imp_fp * 65536 div u, ranked") {
    val rows = DsirOps.dsirSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val imp = r.getAs[Long]("imp_fp"); val u = r.getAs[Long]("u")
      assert(r.getAs[Long]("priority_fp") == imp * 65536L / u)
      assert(u >= 1L && u <= 65536L)
    }
    val prios = rows.map(r => (r.getAs[Long]("priority_fp"),
      r.getAs[Long]("doc_id")))
    assert(prios.sortBy(p => (-p._1, p._2)).toSeq == prios.toSeq,
      "rank order must be priority desc, doc_id asc")
  }

  test("draw excludes the target slice and fills SampleK on the fixture") {
    val got = DsirOps.dsirSelect(spark, sf)
    assert(got.count() == DsirOps.SampleK)
    assert(got.filter(col("doc_id") % 100 === 7).count() == 0)
    // deterministic: a second run is row-identical
    val a = got.collect().toSeq.map(_.toSeq)
    val b = DsirOps.dsirSelect(spark, sf).collect().toSeq.map(_.toSeq)
    assert(a == b)
  }

  test("stored-model serve ≡ in-query gate; additive append ≡ union retrain") {
    val db = "dsir_model_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    DsirOps.buildDsirModel(docs.filter(col("doc_id") < 400), db)
    DsirOps.appendToDsirModel(spark, db, docs.filter(col("doc_id") >= 400))
    val db2 = "dsir_retrain_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    DsirOps.buildDsirModel(docs, db2)
    def dump(d: String) = spark.table(s"`$d`.`${DsirOps.DsirCountsTable}`")
      .orderBy("f").collect().toSeq.map(_.toSeq)
    assert(dump(db) == dump(db2), "build+append must equal a union retrain")
    // serve against the full-corpus model reproduces the in-query gate
    val served = DsirOps.dsirSelectFromModel(spark, sf, db2)
      .collect().toSeq.map(_.toSeq)
    val gate = DsirOps.dsirSelect(spark, sf).collect().toSeq.map(_.toSeq)
    assert(served == gate)
  }

  test("delta-grown serve ≡ union retrain, through an epoch redelivery") {
    val db = "dsir_delta_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    DsirOps.buildDsirModel(docs.filter(col("doc_id") < 400), db)
    val batch = docs.filter(col("doc_id") >= 400)
    DsirOps.dsirDeltaSink("src", db)(batch, 0L)
    // crash-window redelivery: the (source, epoch) overwrite lands
    // identical bytes — counts must not double
    DsirOps.dsirDeltaSink("src", db)(batch, 0L)
    val served = DsirOps.dsirSelectFromModel(spark, sf, db)
      .collect().toSeq.map(_.toSeq)
    val db2 = "dsir_delta_retrain"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    DsirOps.buildDsirModel(docs, db2)
    val retrained = DsirOps.dsirSelectFromModel(spark, sf, db2)
      .collect().toSeq.map(_.toSeq)
    assert(served == retrained)
  }

  test("unseen features score the neutral smoothing ratio") {
    // doc 2's bigrams appear nowhere else: each feature scores
    // Scale·1·(T_r+B) div ((c_r+1)·(T_t+B)) with c_r = its own count 1
    // (it IS part of the raw model) — recompute from first principles
    val dir = graft.TempDirs.create("graft-dsir-spec-neutral")
    docsOf(
      7L -> "alpha beta alpha",
      2L -> "zeta eta")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // T_t = 2 (alpha beta, beta alpha), T_r = 1 (zeta eta), c_t=0, c_r=1
    val want = DsirOps.Scale * 1L * (1L + DsirOps.Buckets) /
      ((1L + 1L) * (2L + DsirOps.Buckets))
    val got = DsirOps.dsirSelect(spark, dir)
      .filter(col("doc_id") === 2L).select("imp_fp").as[Long].head()
    assert(got == want, s"neutral ratio: got $got want $want")
  }
}
