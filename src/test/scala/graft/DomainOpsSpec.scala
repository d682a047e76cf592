package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DomainOps

/** K-class NB domain classifier: hand-computed fixed-point rates, argmax
  * tie-break, additive append equivalence, and the training-free serving
  * plan.
  */
class DomainOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  /** A={doc1 "x x y"}, B={doc2 "z z y"}: V=3, t_A=t_B=3.
    * rate(cnt) = (1e9·(cnt+1)) div 6 → doc1 scores A=444444444,
    * B=222222221 (hand-derived) — and symmetrically for doc2.
    */
  test("hand-computed class rates and argmax") {
    val db = "graft_dc_spec_hand"
    val docs = docsDf((1L, "x x y", "A"), (2L, "z z y", "B"))
    DomainOps.buildDomainClassifier(docs, db)
    val got = DomainOps.scoreAgainst(docs, spark, db)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3)))
    assert(got.toSeq == Seq((1L, "A", 444444444L, 1),
      (2L, "B", 444444444L, 1)))
  }

  test("equal scores break lexicographically — a total, replayable order") {
    val db = "graft_dc_spec_tie"
    // both classes see the same single token once: every rate ties
    val docs = docsDf((1L, "y", "B"), (2L, "y", "A"))
    DomainOps.buildDomainClassifier(docs, db)
    val got = DomainOps.scoreAgainst(docsDf((9L, "y", "B")), spark, db)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((9L, "A")))
  }

  test("unseen tokens score the neutral smoothing floor, never drop") {
    val db = "graft_dc_spec_floor"
    DomainOps.buildDomainClassifier(
      docsDf((1L, "x x y", "A"), (2L, "z z y", "B")), db)
    // "q" is out-of-vocab: both classes rate it (1e9·1) div (3+3)
    val got = DomainOps.scoreAgainst(docsDf((7L, "q q", "A")), spark, db)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", 166666666L)))
  }

  test("build + append(batch) lands on the from-scratch full model") {
    val base = Tables.t(spark, sf, "documents").filter(col("doc_id") < 300)
    val batch = Tables.t(spark, sf, "documents").filter(col("doc_id") >= 300)
    DomainOps.buildDomainClassifier(base, "graft_dc_spec_inc")
    DomainOps.appendToDomainClassifier(spark, "graft_dc_spec_inc", batch)
    DomainOps.buildDomainClassifier(Tables.t(spark, sf, "documents"),
      "graft_dc_spec_full")
    def dump(db: String, tbl: String, cols: String*): Seq[Seq[Any]] =
      spark.table(s"`$db`.`$tbl`").select(cols.map(col).toIndexedSeq: _*)
        .orderBy(cols.map(col).toIndexedSeq: _*)
        .collect().toSeq.map(_.toSeq)
    for ((tbl, cols) <- Seq(
        DomainOps.DcCountsTable -> Seq("c", "w", "cnt"),
        DomainOps.DcTotalsTable -> Seq("c", "t_c"),
        DomainOps.DcMetaTable -> Seq("v")))
      assert(dump("graft_dc_spec_inc", tbl, cols: _*) ==
        dump("graft_dc_spec_full", tbl, cols: _*), s"table $tbl diverged")
    val served = DomainOps.domainClassifyFromModel(spark, sf,
      "graft_dc_spec_inc").collect().toSeq.map(_.toSeq)
    assert(served == DomainOps.domainClassifyFromModel(spark, sf,
      "graft_dc_spec_full").collect().toSeq.map(_.toSeq))
    assert(served.size == 500)
  }

  test("degenerate inputs: empty build refused; single-class corpus total") {
    val e = intercept[IllegalArgumentException](
      DomainOps.buildDomainClassifier(
        docsDf((1L, "x", "A")).filter(col("doc_id") < 0), "graft_dc_empty"))
    assert(e.getMessage.contains("empty corpus"))
    // one class: the argmax is trivially that class for every doc
    val db = "graft_dc_mono"
    DomainOps.buildDomainClassifier(
      docsDf((1L, "x y", "A"), (2L, "y z", "A")), db)
    val got = DomainOps.scoreAgainst(docsDf((9L, "q", "A")), spark, db)
      .collect()
    assert(got.length == 1 && got(0).getString(1) == "A")
  }

  test("domain-routed mix: strata are predicted sources, quotas honored") {
    val mixed = DomainOps.domainMixTemperature(spark, sf).collect()
    assert(mixed.nonEmpty)
    val sources = Tables.t(spark, sf, "documents")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    mixed.foreach { r =>
      assert(sources.contains(r.getAs[String]("pred_source")),
        "predicted stratum is not a known source label")
      assert(r.getAs[Int]("mix_rank") <= r.getAs[Int]("quota"))
    }
  }

  test("serving plan is training-free: stored tables only, one corpus scan") {
    val db = "graft_dc_spec_plan"
    DomainOps.buildDomainClassifier(
      Tables.t(spark, sf, "documents").filter(col("doc_id") < 100), db)
    val served = DomainOps.domainClassifyFromModel(spark, sf, db)
    val plan = served.queryExecution.executedPlan.toString
    // exactly one scan of the corpus (the frame being scored); the model
    // side must come from the stored tables, not a training re-aggregation
    assert(plan.sliding("documents.parquet".length)
      .count(_ == "documents.parquet") == 1,
      "serve path re-scanned the corpus for training")
    assert(plan.contains(DomainOps.DcCountsTable))
    assert(plan.contains(DomainOps.DcTotalsTable))
  }
}
