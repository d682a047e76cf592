package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.RetrievalOps

/** BM25 inverted-index retrieval: hand-computed fixed-point scores, stored
  * vs in-session parity, additive append equivalence, the append-only
  * fence, and the partition-pruned / training-free serving plan.
  */
class RetrievalOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** d1="a a b" d2="a c" d3="b b b c": N=3, total_len=9, df(a)=df(b)=2.
    * Hand-derived staged fixed point (dlr, tf_fp, idf_fp worked by hand):
    * query a → d1 contrib 8250, d2 6949; query b → d3 8800, d1 6000.
    */
  test("hand-computed staged fixed-point scores and rank order") {
    val db = "graft_bm25_spec_hand"
    RetrievalOps.buildBm25Index(
      docsDf(1L -> "a a b", 2L -> "a c", 3L -> "b b b c"), db)
    val terms = Seq((100L, "a"), (200L, "b")).toDF("query_id", "w")
    val got = RetrievalOps.bm25TopKFor(terms, spark, db)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (100L, 1, 1L, 1L, 8250L), (100L, 2, 2L, 1L, 6949L),
      (200L, 1, 3L, 1L, 8800L), (200L, 2, 1L, 1L, 6000L)))
  }

  test("multi-term scores sum per doc; unmatched docs never rank") {
    val db = "graft_bm25_spec_sum"
    RetrievalOps.buildBm25Index(
      docsDf(1L -> "a a b", 2L -> "a c", 3L -> "b b b c"), db)
    val got = RetrievalOps.bm25TopKFor(
        Seq((7L, "a"), (7L, "b")).toDF("query_id", "w"), spark, db)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // d1 = 8250 + 6000 (both terms), d3 = b only, d2 = a only
    assert(got.toSeq == Seq((1L, 2L, 14250L), (3L, 1L, 8800L),
      (2L, 1L, 6949L)))
  }

  test("build + append(batch) is bit-equal to a from-scratch full build") {
    val base = Tables.t(spark, sf, "documents").filter(col("doc_id") < 300)
    val batch = Tables.t(spark, sf, "documents").filter(col("doc_id") >= 300)
    RetrievalOps.buildBm25Index(base, "graft_bm25_spec_inc")
    RetrievalOps.appendToBm25Index(spark, "graft_bm25_spec_inc", batch)
    RetrievalOps.buildBm25Index(Tables.t(spark, sf, "documents"),
      "graft_bm25_spec_full")
    def dump(db: String, tbl: String, cols: String*): Seq[Seq[Any]] =
      spark.table(s"`$db`.`$tbl`").select(cols.map(col).toIndexedSeq: _*)
        .orderBy(cols.map(col).toIndexedSeq: _*)
        .collect().toSeq.map(_.toSeq)
    for ((tbl, cols) <- Seq(
        RetrievalOps.PostingsTable -> Seq("w", "doc_id", "tf", "bkt"),
        RetrievalOps.DfTable -> Seq("w", "df"),
        RetrievalOps.DocLenTable -> Seq("doc_id", "dl"),
        RetrievalOps.TotalsTable -> Seq("n_docs", "total_len")))
      assert(dump("graft_bm25_spec_inc", tbl, cols: _*) ==
        dump("graft_bm25_spec_full", tbl, cols: _*), s"table $tbl diverged")
    // and the served ranking agrees between the two index lineages
    val q = RetrievalOps.bm25TopKFromIndex(spark, sf, "graft_bm25_spec_inc")
      .collect().toSeq.map(_.toSeq)
    assert(q == RetrievalOps.bm25TopKFromIndex(spark, sf,
      "graft_bm25_spec_full").collect().toSeq.map(_.toSeq))
    assert(q.nonEmpty)
  }

  test("append-only fence: overlapping or empty batches are refused loudly") {
    val db = "graft_bm25_spec_fence"
    RetrievalOps.buildBm25Index(docsDf(1L -> "a b", 5L -> "c d"), db)
    val e = intercept[IllegalArgumentException](
      RetrievalOps.appendToBm25Index(spark, db, docsDf(5L -> "c d")))
    assert(e.getMessage.contains("refused"))
    intercept[IllegalArgumentException](
      RetrievalOps.appendToBm25Index(spark, db,
        docsDf(1L -> "a").filter(col("doc_id") < 0)))
    // a non-index table never serves: the layout property is demanded
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bm25_spec_rogue")
    spark.sql("CREATE TABLE graft_bm25_spec_rogue.bm25_postings (w STRING) " +
      "USING parquet")
    val e2 = intercept[IllegalArgumentException](
      RetrievalOps.bm25TopKFor(Seq((1L, "a")).toDF("query_id", "w"),
        spark, "graft_bm25_spec_rogue"))
    assert(e2.getMessage.contains("num_buckets"))
  }

  test("degenerate inputs: empty build refused; empty probe slice and " +
      "single-doc corpus stay total") {
    // empty corpus: the build refuses loudly (an index over nothing
    // would serve nothing silently)
    val e = intercept[IllegalArgumentException](
      RetrievalOps.buildBm25Index(
        docsDf(1L -> "a").filter(col("doc_id") < 0), "graft_bm25_empty"))
    assert(e.getMessage.contains("empty corpus"))
    // single-doc corpus: n_docs = 1, df = 1 → idf odds (2-2+1)/3
    val db1 = "graft_bm25_solo"
    RetrievalOps.buildBm25Index(docsDf(1L -> "a a"), db1)
    val solo = RetrievalOps.bm25TopKFor(
      Seq((7L, "a")).toDF("query_id", "w"), spark, db1).collect()
    assert(solo.length == 1 && solo(0).getLong(4) > 0)
    // probe slice empty (no doc_id % 97 == 3 in a 2-doc corpus of other
    // ids): serving returns an empty frame, never a job failure
    val db2 = "graft_bm25_noprobe"
    RetrievalOps.buildBm25Index(docsDf(1L -> "a b", 2L -> "c d"), db2)
    assert(RetrievalOps.bm25TopKFromIndex(spark,
      "/root/testdata/sf0.001", db2) != null)
    val noTerms = RetrievalOps.bm25TopKFor(
      Seq.empty[(Long, String)].toDF("query_id", "w"), spark, db2)
    assert(noTerms.isEmpty)
  }

  test("bm25 decontam flags only non-eval docs, bounded by the eval query count") {
    val flagged = RetrievalOps.bm25Decontam(spark, sf).collect()
    assert(flagged.nonEmpty)
    val nEval = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 100 === 7).count()
    flagged.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 100 != 7,
        "an eval doc flagged itself — candidates must exclude the eval slice")
      val hits = r.getAs[Long]("n_eval_hits")
      assert(hits >= 1 && hits <= nEval)
    }
  }

  test("phrase search: anchor alignment finds exact consecutive runs only") {
    val db = "graft_phrase_spec"
    RetrievalOps.buildPhraseIndex(
      docsDf(1L -> "a b c a b c", 2L -> "c b a", 3L -> "b b b c"), db)
    def terms(ws: String*) =
      ws.zipWithIndex.map { case (w, k) => (7L, k, w) }
        .toDF("query_id", "k", "w")
    // two occurrences in doc 1; the scrambled doc 2 never matches
    val m1 = RetrievalOps.phraseSearchFor(terms("a", "b", "c"), spark, db)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(m1.toSeq == Seq((1L, 2L)))
    // repeated-word phrase: "b b c" matches doc 3 exactly once (anchor 2)
    val m2 = RetrievalOps.phraseSearchFor(terms("b", "b", "c"), spark, db)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(m2.toSeq == Seq((3L, 1L)))
    // a phrase crossing nothing: "c a b" occurs once in doc 1
    val m3 = RetrievalOps.phraseSearchFor(terms("c", "a", "b"), spark, db)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(m3.toSeq == Seq((1L, 1L)))
    // serve plan: pruned positions scan, no corpus scan for manual terms
    val plan = RetrievalOps.phraseSearchFor(terms("a", "b", "c"), spark, db)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"))
    assert(plan.contains(RetrievalOps.PositionsTable))
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"))
  }

  test("phrase appends land bit-equal to a full rebuild; fence refuses; cron entries fire") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    for (db <- Seq("phrase_inc", "phrase_full"))
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    RetrievalOps.buildPhraseIndex(docs.filter(col("doc_id") < 300), "phrase_inc")
    RetrievalOps.appendToPhraseIndex(spark, "phrase_inc",
      docs.filter(col("doc_id") >= 300))
    RetrievalOps.buildPhraseIndex(docs, "phrase_full")
    def dump(db: String) = spark.table(s"`$db`.`${RetrievalOps.PositionsTable}`")
      .orderBy("w", "doc_id", "pos").collect().toSeq.map(_.toSeq)
    assert(dump("phrase_inc") == dump("phrase_full"))
    val e = intercept[IllegalArgumentException](
      RetrievalOps.appendToPhraseIndex(spark, "phrase_inc",
        docs.filter(col("doc_id") >= 300)))
    assert(e.getMessage.contains("refused"))
    // the retrieval + chunk cron rebuild entries fire and materialize
    import java.time.LocalDateTime
    import graft.pipeline.ScheduleRunner
    for (db <- Seq("ret_cron_db", "cdc_cron_db"))
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val tt = LocalDateTime.parse("2026-01-01T00:00:00")
    val fired = new ScheduleRunner(Seq(
      RetrievalOps.phraseRefreshEntry("phrase-refresh", "0 4 * * *",
        "ret_cron_db", s => Tables.t(s, sf, "documents")),
      graft.ops.ChunkOps.chunkRebuildEntry("chunk-rebuild", "0 4 * * *",
        "cdc_cron_db", s => Tables.t(s, sf, "documents"))),
      startAt = tt).tick(spark, tt.plusHours(4))
    assert(fired.toSet == Set("phrase-refresh", "chunk-rebuild"))
    assert(spark.table(
      s"ret_cron_db.${RetrievalOps.PositionsTable}").count() > 0)
    assert(spark.table(
      s"cdc_cron_db.${graft.ops.ChunkOps.ChunkIndexTable}").count() > 0)
    for (db <- Seq("phrase_inc", "phrase_full", "ret_cron_db", "cdc_cron_db"))
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("hybrid RRF fusion: valid rank-derived scores, both legs present, deterministic") {
    val out = RetrievalOps.hybridSearch(spark, sf).collect()
    val nProbes = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 97 === 3).count()
    assert(out.length == nProbes * RetrievalOps.HybridTopK)
    // every fused score is a sum of one or two exact rank reciprocals
    val legVals = (1 to RetrievalOps.HybridTopK)
      .map(r => RetrievalOps.RrfScale / (RetrievalOps.RrfK + r)).toSet
    val valid = legVals ++
      (for (a <- legVals; b <- legVals) yield a + b)
    out.foreach(r => assert(valid.contains(r.getAs[Long]("rrf_fp")),
      s"rrf ${r.getAs[Long]("rrf_fp")} is not a rank-reciprocal sum"))
    // at this fixture every probe has an embedding: its own doc carries
    // the semantic self-rank and must surface in the fused top-k
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.exists(_.getAs[Long]("doc_id") == q),
        s"query $q lost its own document from the fused top-k")
    }
    // the legs are independent signals (random fixture embeddings), so a
    // given query's top-5s may be disjoint — but corpus-wide at least one
    // candidate must fuse both legs (the self-retrieval doc typically does)
    assert(out.exists(r => !legVals.contains(r.getAs[Long]("rrf_fp"))),
      "no candidate anywhere fused both legs")
    assert(out.toSeq.map(_.toSeq) ==
      RetrievalOps.hybridSearch(spark, sf).collect().toSeq.map(_.toSeq))
  }

  test("hard negatives: cluster-mates excluded, holes promoted, ranks dense") {
    val out = RetrievalOps.hardNegatives(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute the labels the miner used (same deterministic machinery)
    val comps = graft.ops.GraphOps.connectedComponents(
        graft.ops.TextOps.minhashCandidatePairs(spark, sf)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")),
        graft.Tables.t(spark, sf, "documents").select(col("doc_id").as("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (q, c) = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      assert(c != q, s"query $q retrieved itself")
      assert(comps(q) != comps(c), s"cluster-mate $c survived for query $q")
    }
    // ranks dense from 1, scores non-increasing per query
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val byRnk = g.sortBy(_.getAs[Int]("rnk"))
      assert(byRnk.map(_.getAs[Int]("rnk")).sameElements(1 to g.length))
      val sc = byRnk.map(_.getAs[Long]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
    // promotion, not holes: every query with 5+ scored non-cluster
    // candidates keeps a full top-5 even though self-retrieval (rank 1 in
    // plain BM25 for a doc querying its own terms) was excluded
    val plain = RetrievalOps.bm25TopKFor(
      RetrievalOps.queryTermsFor(graft.Tables.t(spark, sf, "documents"),
        100L, 7L), spark, "graft_bm25_hn").collect()
    val selfHit = plain.filter(r =>
      r.getAs[Long]("query_id") == r.getAs[Long]("doc_id"))
      .map(_.getAs[Long]("query_id")).toSet
    assert(selfHit.nonEmpty, "fixture sanity: self-retrieval must occur")
    val full = out.groupBy(_.getAs[Long]("query_id"))
      .filter(_._2.length == RetrievalOps.TopK).keySet
    assert(selfHit.exists(full.contains),
      "at least one self-hit query must refill to a full top-5")
  }

  test("serving plan: postings partition-pruned to term buckets, no corpus scan") {
    val db = "graft_bm25_spec_plan"
    RetrievalOps.buildBm25Index(
      Tables.t(spark, sf, "documents").filter(col("doc_id") < 100), db)
    val served = RetrievalOps.bm25TopKFor(
      Seq((1L, "the"), (1L, "merge")).toDF("query_id", "w"), spark, db)
    val plan = served.queryExecution.executedPlan.toString
    // the terms frame is in-memory, so ANY documents/parquet-corpus scan
    // would be training leaking into the serve path
    assert(!plan.contains("documents.parquet"), "serve path scanned the corpus")
    assert(plan.contains(RetrievalOps.PostingsTable))
    // partition pruning: the postings scan carries a bkt partition filter
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"),
      "postings scan is not partition-pruned to the query terms' buckets")
    assert(served.collect().nonEmpty)
  }
}
