package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.DomainOps
import graft.pipeline.DeltaModelIngest

/** Exactly-once additive model growth (the LSM delta fold): every crash
  * window re-delivered lands on the union-retrain counts bit-for-bit —
  * including mid-append (delta written, ledger not), mid-compaction
  * (combined written + stamped, pointer not switched), and a rebuild over
  * a delta-grown model (generation bump).
  */
class DeltaModelIngestSpec extends SparkSpec {

  private val db = "dc_delta_spec"
  private def fam = DomainOps.dcFamily(db)

  private def docs = Tables.t(spark, sf, "documents")
  private def slice(lo: Long, hi: Long): DataFrame =
    docs.filter(col("doc_id") >= lo && col("doc_id") < hi)

  private def effective(): Seq[(String, String, Long)] =
    DeltaModelIngest.effectiveCounts(spark, fam)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def retrain(hi: Long): Seq[(String, String, Long)] = {
    spark.sql("DROP DATABASE IF EXISTS `dc_delta_ref` CASCADE")
    DomainOps.buildDomainClassifier(slice(0, hi), "dc_delta_ref")
    spark.table(s"dc_delta_ref.${DomainOps.DcCountsTable}")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("delta folds are exact through replays, crashes, compaction and rebuild") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    DomainOps.buildDomainClassifier(slice(0, 200), db)

    // two batches land; the merged view equals the union retrain
    DeltaModelIngest.append(spark, fam, "s1", 0L,
      DomainOps.batchCounts(slice(200, 300)))
    DeltaModelIngest.append(spark, fam, "s1", 1L,
      DomainOps.batchCounts(slice(300, 380)))
    assert(effective() == retrain(380))

    // committed-epoch replay: pure no-op
    DeltaModelIngest.append(spark, fam, "s1", 1L,
      DomainOps.batchCounts(slice(300, 380)))
    assert(effective() == retrain(380))

    // mid-append crash (delta written, ledger not) then redelivery:
    // the overwrite lands identical bytes — still exact
    intercept[RuntimeException] {
      DeltaModelIngest.append(spark, fam, "s1", 2L,
        DomainOps.batchCounts(slice(380, 430)), failBeforeLedger = true)
    }
    assert(effective() == retrain(430), "crashed delta must already count once")
    DeltaModelIngest.append(spark, fam, "s1", 2L,
      DomainOps.batchCounts(slice(380, 430)))
    assert(effective() == retrain(430))

    // a second source's epochs are independent
    DeltaModelIngest.append(spark, fam, "s2", 0L,
      DomainOps.batchCounts(slice(430, 460)))
    assert(effective() == retrain(460))

    // mid-compaction crash: combined written + covers stamped, pointer
    // NOT switched — the old rule still serves exactly
    intercept[RuntimeException] {
      DeltaModelIngest.compact(spark, fam, failBeforeSwitch = true)
    }
    assert(effective() == retrain(460),
      "orphan combined leaked into the serve view")
    // the retried compaction folds everything; serving unchanged
    DeltaModelIngest.compact(spark, fam)
    assert(effective() == retrain(460))
    // plains and orphans are gone; exactly one live combined remains
    val names = spark.catalog.listTables(db).collect()
      .filter(!_.isTemporary).map(_.name)
      .filter(_.startsWith(s"${DomainOps.DcCountsTable}_dl_"))
    assert(names.length == 1 && names.head.contains("_c"),
      s"expected one combined, found ${names.toSeq}")

    // growth continues after compaction; the merged view stays exact
    DeltaModelIngest.append(spark, fam, "s1", 3L,
      DomainOps.batchCounts(slice(460, 490)))
    assert(effective() == retrain(490))

    // serving parity: the delta-grown model predicts exactly like the
    // union retrain
    val grown = DomainOps.domainClassifyFromModel(spark, sf, db)
    spark.sql("DROP DATABASE IF EXISTS `dc_delta_ref2` CASCADE")
    DomainOps.buildDomainClassifier(slice(0, 490), "dc_delta_ref2")
    assert(grown.collect().toSeq.map(_.toSeq) ==
      DomainOps.domainClassifyFromModel(spark, sf, "dc_delta_ref2")
        .collect().toSeq.map(_.toSeq))

    // REBUILD over the delta-grown model: generation bumps, old deltas
    // die, the fresh base serves alone
    DomainOps.buildDomainClassifier(slice(0, 490), db)
    assert(DeltaModelIngest.generation(spark, fam) == 1L)
    assert(!DeltaModelIngest.hasDeltas(spark, fam),
      "old-generation deltas survived the rebuild")
    assert(effective() == retrain(490))
    // and new-generation deltas fold against the new base
    DeltaModelIngest.append(spark, fam, "s1", 4L,
      DomainOps.batchCounts(slice(490, 500)))
    assert(effective() == retrain(500))
    for (d <- Seq(db, "dc_delta_ref", "dc_delta_ref2"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
  }

  test("LM delta growth: counts AND vocab fold exactly; serving equals a retrain under the frozen threshold") {
    import graft.ops.TextOps
    val lmDb = "lm_delta_spec"
    for (d <- Seq(lmDb, "lm_delta_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
    TextOps.buildLmModel(slice(0, 300), lmDb)
    val origThr = spark.table(s"$lmDb.${TextOps.LmThresholdTable}")
      .collect().toSeq
    // two streamed batches: counts + vocab deltas (the sink's two appends)
    for ((lo, hi, e) <- Seq((300L, 400L, 0L), (400L, 500L, 1L))) {
      DeltaModelIngest.append(spark, TextOps.lmCountsFamily(lmDb), "s1", e,
        TextOps.lmBatchCounts(slice(lo, hi)))
      DeltaModelIngest.append(spark, TextOps.lmVocabFamily(lmDb), "s1", e,
        TextOps.lmBatchVocab(slice(lo, hi)))
    }
    TextOps.buildLmModel(docs, "lm_delta_ref")
    def cnt(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(cnt(DeltaModelIngest.effectiveCounts(spark,
        TextOps.lmCountsFamily(lmDb))) ==
      cnt(spark.table(s"lm_delta_ref.${TextOps.LmCountsTable}")),
      "merged bigram counts diverged from the union retrain")
    assert(DeltaModelIngest.effectiveCounts(spark,
        TextOps.lmVocabFamily(lmDb))
        .collect().map(_.getString(0)).sorted.toSeq ==
      spark.table(s"lm_delta_ref.${TextOps.LmVocabTable}")
        .collect().map(_.getString(0)).sorted.toSeq,
      "merged vocabulary diverged from the union retrain")
    // serving parity under the FROZEN threshold: give the retrained ref
    // the grown model's original threshold — rows must then match exactly
    graft.store.Warehouse.saveModel(
      spark.table(s"$lmDb.${TextOps.LmThresholdTable}").limit(0)
        .sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(origThr).asJava),
          spark.table(s"$lmDb.${TextOps.LmThresholdTable}").schema),
      "lm_delta_ref", TextOps.LmThresholdTable)
    assert(TextOps.perplexityFilterFromModel(spark, sf, lmDb)
      .collect().toSeq.map(_.toSeq) ==
      TextOps.perplexityFilterFromModel(spark, sf, "lm_delta_ref")
        .collect().toSeq.map(_.toSeq),
      "delta-grown LM serve diverged from the retrain under equal thresholds")
    for (d <- Seq(lmDb, "lm_delta_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
  }

  test("QC delta growth: counts fold exactly; serving equals a retrain under the frozen threshold") {
    import graft.ops.TextOps
    val qcDb = "qc_delta_spec"
    for (d <- Seq(qcDb, "qc_delta_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
    TextOps.buildQualityClassifier(slice(0, 300), qcDb)
    val origThr = spark.table(s"$qcDb.${TextOps.QcThresholdTable}")
      .collect().toSeq
    DeltaModelIngest.append(spark, TextOps.qcFamily(qcDb), "s1", 0L,
      TextOps.qcBatchCounts(slice(300, 500)))
    TextOps.buildQualityClassifier(docs, "qc_delta_ref")
    def cnt3(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(cnt3(DeltaModelIngest.effectiveCounts(spark,
        TextOps.qcFamily(qcDb))) ==
      cnt3(spark.table(s"qc_delta_ref.${TextOps.QcTokenTable}")),
      "merged qc counts diverged from the union retrain")
    graft.store.Warehouse.saveModel(
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(origThr).asJava),
        spark.table(s"$qcDb.${TextOps.QcThresholdTable}").schema),
      "qc_delta_ref", TextOps.QcThresholdTable)
    assert(TextOps.qualityClassifierFromModel(spark, sf, qcDb)
      .collect().toSeq.map(_.toSeq) ==
      TextOps.qualityClassifierFromModel(spark, sf, "qc_delta_ref")
        .collect().toSeq.map(_.toSeq),
      "delta-grown QC serve diverged from the retrain under equal thresholds")
    for (d <- Seq(qcDb, "qc_delta_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
  }
  test("a rebuild racing an append trips the generation fence, never loses the batch silently") {
    import graft.ops.DomainOps
    val gdb = "dc_genrace_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$gdb` CASCADE")
    DomainOps.buildDomainClassifier(slice(0, 200), gdb)
    val fam2 = DomainOps.dcFamily(gdb)
    val e = intercept[IllegalStateException] {
      DeltaModelIngest.append(spark, fam2, "s1", 0L,
        DomainOps.batchCounts(slice(200, 300)),
        midAppendHook = () =>
          // the concurrent rebuild lands between the delta write and the
          // fence re-check
          DomainOps.buildDomainClassifier(slice(0, 200), gdb))
    }
    assert(e.getMessage.contains("generation moved"))
    // the stranded delta was dropped; serving sees exactly the new base
    assert(!DeltaModelIngest.hasDeltas(spark, fam2),
      "stranded old-generation delta survived")
    assert(effectiveOf(fam2) == retrain(200))
    // the retry (rebuild corpus did NOT carry the batch) lands exactly
    DeltaModelIngest.append(spark, fam2, "s1", 0L,
      DomainOps.batchCounts(slice(200, 300)))
    assert(effectiveOf(fam2) == retrain(300))
    // and the scheduled compaction entry fires on its cron
    DeltaModelIngest.append(spark, fam2, "s1", 1L,
      DomainOps.batchCounts(slice(300, 350)))
    val tt = java.time.LocalDateTime.parse("2026-01-01T00:00:00")
    val fired = new graft.pipeline.ScheduleRunner(Seq(
      DeltaModelIngest.compactionEntry("dc-compact", "0 4 * * *", fam2)),
      startAt = tt).tick(spark, tt.plusHours(4))
    assert(fired == Seq("dc-compact"))
    assert(effectiveOf(fam2) == retrain(350),
      "cron compaction changed the merged view")
    spark.sql(s"DROP DATABASE IF EXISTS `$gdb` CASCADE")
  }

  private def effectiveOf(f: DeltaModelIngest.Family): Seq[(String, String, Long)] =
    DeltaModelIngest.effectiveCounts(spark, f)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("expectation verdicts fold exactly: stream + redelivery + " +
      "compaction equals the single-shot suite over the union") {
    import graft.ops.ExpectationOps
    val exDb = "ex_delta_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$exDb` CASCADE")
    ExpectationOps.buildExpectationCounts(slice(0, 200), exDb)
    val sink = ExpectationOps.expectationsDeltaSink("s1", exDb)
    sink(slice(200, 350), 0L)
    sink(slice(200, 350), 0L)  // redelivery: identical bytes, no double count
    sink(slice(350, 500), 1L)
    def dump(df: DataFrame) = df.collect().map(_.toSeq).toSeq
    val union = ExpectationOps.withRates(
        ExpectationOps.docBatchVerdicts(slice(0, 500)))
      .orderBy("check_id")
    assert(dump(ExpectationOps.expectationsFromModel(spark, exDb)) ==
      dump(union), "streamed verdicts diverged from the single-shot suite")
    DeltaModelIngest.compact(spark, ExpectationOps.expectationsFamily(exDb))
    assert(dump(ExpectationOps.expectationsFromModel(spark, exDb)) ==
      dump(union), "compaction changed the served verdicts")
    spark.sql(s"DROP DATABASE IF EXISTS `$exDb` CASCADE")
  }
}
