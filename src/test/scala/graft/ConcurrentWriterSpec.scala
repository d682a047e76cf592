package graft

import org.apache.spark.sql.functions._
import graft.ops.{IncrementalClusters, RetrievalOps}
import graft.pipeline.{CorpusPipeline, DeltaModelIngest}

/** Two LIVE SparkSessions contending for the SAME stored-model family —
  * the production shape of streaming ingest + cron rebuild (round-12
  * verdict #5). Contract under test, per fenced family: exactly one
  * writer wins; the other refuses LOUDLY (LeaseHeldException while the
  * winner is in flight, the fence refusal afterwards); the final state
  * equals the winner's alone — never a silent merge or a double-count.
  *
  * The `midHook` seams run while the winner HOLDS the lease, so the
  * loser's attempt is driven inside the true contention window rather
  * than before/after it.
  */
class ConcurrentWriterSpec extends SparkSpec {

  private def docs(s: org.apache.spark.sql.SparkSession) =
    Tables.t(s, sf, "documents").select("doc_id", "text")

  test("bm25: append-vs-append and append-vs-rebuild across two sessions " +
      "— loser refuses in-flight (lease) and after (fence); state = winner") {
    val db = "cw_bm25"
    for (d <- Seq(db, "cw_bm25_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
    val base = docs(spark).filter(col("doc_id") < 300)
    val batch = docs(spark).filter(col("doc_id") >= 300)
    RetrievalOps.buildBm25Index(base, db)
    val s2 = spark.newSession()
    val batch2 = docs(s2).filter(col("doc_id") >= 300)
    var inFlight: Seq[String] = Nil
    RetrievalOps.appendToBm25Index(spark, db, batch, midHook = () => {
      // the second live session's APPEND inside the winner's window
      val ea = intercept[CorpusPipeline.LeaseHeldException](
        RetrievalOps.appendToBm25Index(s2, db, batch2))
      // and its REBUILD (the cron-refresh shape) inside the same window
      val er = intercept[CorpusPipeline.LeaseHeldException](
        RetrievalOps.buildBm25Index(docs(s2), db))
      inFlight = Seq(ea.getMessage, er.getMessage)
    })
    assert(inFlight.size == 2 && inFlight.forall(_.contains("lease")),
      s"in-flight losers must refuse on the lease: $inFlight")
    // after the winner: the same batch is a fence-refused replay
    val e = intercept[IllegalArgumentException](
      RetrievalOps.appendToBm25Index(s2, db, batch2))
    assert(e.getMessage.contains("refused"))
    // state equals the winner's alone — bit-equal to one fresh full build
    RetrievalOps.buildBm25Index(docs(spark), "cw_bm25_ref")
    def dump(d: String, tbl: String, cols: String*): Seq[Seq[Any]] =
      spark.table(s"`$d`.`$tbl`").select(cols.map(col).toIndexedSeq: _*)
        .orderBy(cols.map(col).toIndexedSeq: _*).collect().toSeq.map(_.toSeq)
    for ((tbl, cols) <- Seq(
        RetrievalOps.PostingsTable -> Seq("w", "doc_id", "tf"),
        RetrievalOps.DfTable -> Seq("w", "df"),
        RetrievalOps.DocLenTable -> Seq("doc_id", "dl"),
        RetrievalOps.TotalsTable -> Seq("n_docs", "total_len")))
      assert(dump(db, tbl, cols: _*) == dump("cw_bm25_ref", tbl, cols: _*),
        s"$tbl diverged from the single-writer state")
    // rebuild AFTER the contention window succeeds (the lease is free)
    RetrievalOps.buildBm25Index(docs(s2), db)
  }

  test("clusters: append-vs-append and append-vs-rebuild across two " +
      "sessions — loser refuses; labeling equals the single-writer state") {
    val db = "cw_cl"
    for (d <- Seq(db, "cw_cl_ref"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
    val corpus = IncrementalClusters.corpusDocsRange(spark, sf)
    val batch = IncrementalClusters.batchDocsRange(spark, sf)
    val corpusBands = graft.ops.TextOps.bandsOfDocs(corpus)
    IncrementalClusters.buildClusterState(spark, corpus, db)
    val s2 = spark.newSession()
    val batch2 = IncrementalClusters.batchDocsRange(s2, sf)
    var inFlight: Seq[String] = Nil
    IncrementalClusters.appendBatchClusters(spark, batch, corpusBands, db,
      midHook = () => {
        val ea = intercept[CorpusPipeline.LeaseHeldException](
          IncrementalClusters.appendBatchClusters(s2, batch2,
            graft.ops.TextOps.bandsOfDocs(
              IncrementalClusters.corpusDocsRange(s2, sf)), db))
        val er = intercept[CorpusPipeline.LeaseHeldException](
          IncrementalClusters.buildClusterState(s2,
            IncrementalClusters.corpusDocsRange(s2, sf), db))
        inFlight = Seq(ea.getMessage, er.getMessage)
      })
    assert(inFlight.size == 2 && inFlight.forall(_.contains("lease")))
    // after the winner: the replayed batch trips the append-only id fence
    val e = intercept[IllegalArgumentException](
      IncrementalClusters.appendBatchClusters(s2, batch2, corpusBands, db))
    assert(e.getMessage.contains("append-only"))
    // labeling equals one fresh build over corpus ∪ batch (the
    // append≡rebuild law the oracle gate proves, restated under contention)
    IncrementalClusters.buildClusterState(spark,
      corpus.unionByName(batch), "cw_cl_ref")
    def labels(d: String): Seq[(Long, Long)] =
      IncrementalClusters.clusterState(spark, d)
        .select("doc_id", "canonical_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(labels(db) == labels("cw_cl_ref"),
      "contended labeling diverged from the single-writer rebuild")
  }

  test("delta model: second-session redelivery is absorbed exactly once; " +
      "a second-session rebuild trips the generation fence loudly") {
    import graft.ops.DomainOps
    val db = "cw_dc"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val all = Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "source")
    val base = all.filter(col("doc_id") < 300)
    val batch = all.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    DomainOps.buildDomainClassifier(base, db)
    val fam = DomainOps.dcFamily(db)
    val s2 = spark.newSession()
    val batch2 = Tables.t(s2, sf, "documents")
      .select("doc_id", "text", "source")
      .filter(col("doc_id") >= 300 && col("doc_id") < 400)
    // append-vs-append: both sessions deliver the SAME (srcTag, epoch) —
    // the delta-table overwrite + ledger make the second a no-op, so the
    // merged view counts the batch exactly once
    DeltaModelIngest.append(spark, fam, "cw-src", 0L,
      DomainOps.batchCounts(batch))
    DeltaModelIngest.append(s2, fam, "cw-src", 0L,
      DomainOps.batchCounts(batch2))
    def effective: Seq[(String, String, Long)] =
      DeltaModelIngest.effectiveCounts(spark, fam)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
    val once = DomainOps.batchCounts(
        all.filter(col("doc_id") < 400))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(effective == once,
      "two-session redelivery must merge to exactly one batch, never two")
    // append-vs-rebuild: session 2 rebuilds INSIDE session 1's append
    // window — the generation fence drops the stranded delta and refuses
    val tail = all.filter(col("doc_id") >= 400 && col("doc_id") < 450)
    val eg = intercept[IllegalStateException](
      DeltaModelIngest.append(spark, fam, "cw-src-b", 0L,
        DomainOps.batchCounts(tail),
        midAppendHook = () =>
          DomainOps.buildDomainClassifier(
            Tables.t(s2, sf, "documents")
              .select("doc_id", "text", "source")
              .filter(col("doc_id") < 400), db)))
    assert(eg.getMessage.contains("generation moved"))
    // state equals the winner's (the rebuild): no stranded delta serves
    assert(!DeltaModelIngest.hasDeltas(spark, fam),
      "old-generation delta survived the rebuild")
    assert(effective == once,
      "post-race merged view must equal the rebuild's corpus exactly")
  }
}
