package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multiclass domain/topic classifier — the routing signal a mixture
  * pipeline needs when documents arrive WITHOUT a trusted source label
  * (web-crawl reality: the label is what you infer, then temperature-mix
  * on). Same exact-integer Naive Bayes posture as the binary quality
  * classifier ([[TextOps.buildQualityClassifier]]), generalized to K
  * classes: training docs carry their `source` as the class label, and a
  * token's class rate is the add-one-smoothed
  *
  *   rate_fp(c, w) = (Scale · (cnt(c, w) + 1)) div (t_c + V)
  *
  * in [[DcScale]] fixed point (cnt ≤ t_c, so rate < Scale — sums stay far
  * inside Long). A document scores each class by its token-MEAN rate
  * (integer div; the class argmax is unchanged by the division since the
  * token count is class-independent, and the mean keeps magnitudes
  * comparable across document lengths — the [[TextOps.perplexityFilter]]
  * arithmetic-mean posture, documented there: exact-integer replayability
  * beats a float log's last-ulp rank flip). Uniform class priors are
  * assumed — the fixture's sources are balanced, and a prior term would be
  * one more broadcast column when needed. Prediction = max-score class,
  * ties broken lexicographically (total order, oracle-replayable).
  *
  * Scale shape: training is ONE token-volume shuffle keyed (c, w), map-side
  * combined; class totals roll up from the VOCAB×K-sized count table, never
  * the corpus. Scoring fans the token stream out ×K against a broadcast
  * K-row class frame (K = distinct sources, small by construction), joins
  * the vocab×K count table on (c, w) — AQE picks broadcast vs shuffle by
  * its actual size — and reduces per (doc_id, c); the argmax is a doc-keyed
  * window. Nothing all-pairs, nothing driver-side beyond the K-row class
  * list.
  */
object DomainOps {

  /** Names of the persisted classifier tables. */
  val DcCountsTable = "dc_counts"
  val DcTotalsTable = "dc_totals"
  val DcMetaTable = "dc_meta"
  val DcScale = 1000000000L

  private def fqn(db: String, tbl: String) = s"`$db`.`$tbl`"

  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("tokens", TextOps.tokensOf(col("text")))

  /** Train the K-class token-count model from (doc_id, text, source) rows
    * and persist counts / class totals / vocab size. Totals and meta derive
    * from the STORED counts table so the append path's additive rewrite
    * lands on identical definitions.
    */
  def buildDomainClassifier(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    require(!docs.isEmpty,
      "buildDomainClassifier: empty corpus — a model with zero classes " +
        "would silently predict nothing for every document; refusing " +
        "loudly instead")
    // a REBUILD over a delta-grown model must advance the generation:
    // the fresh base subsumes the streamed docs, so the old generation's
    // delta tables would double-count if they stayed current. The bump is
    // two catalog writes after the base lands (the documented
    // non-atomic-but-recoverable class); old-generation deltas are
    // dropped opportunistically.
    import graft.pipeline.DeltaModelIngest
    val prevGen = DeltaModelIngest.prepareRebuild(s, dcFamily(db))
    graft.store.Warehouse.saveModel(batchCounts(docs), db, DcCountsTable)
    DeltaModelIngest.finishRebuild(s, dcFamily(db), prevGen)
    val stored = s.table(fqn(db, DcCountsTable))
    graft.store.Warehouse.saveModel(
      stored.groupBy("c").agg(sum("cnt").as("t_c")), db, DcTotalsTable)
    graft.store.Warehouse.saveModel(
      stored.agg(count_distinct(col("w")).as("v")), db, DcMetaTable)
  }

  /** The classifier's delta-model descriptor (exactly-once streaming
    * growth — [[graft.pipeline.DeltaModelIngest]]).
    */
  def dcFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, DcCountsTable,
      Seq("c", "w"), Seq("cnt"))

  /** Pre-aggregated (c, w, cnt) counts of a labeled batch — what the
    * delta ingest folds in.
    */
  def batchCounts(docs: DataFrame): DataFrame =
    withTokens(docs)
      .select(col("source").as("c"), explode(col("tokens")).as("w"))
      .groupBy("c", "w").agg(count(lit(1)).as("cnt"))

  /** foreachBatch adapter: exactly-once count growth via the delta-table
    * fold (a redelivered batch overwrites its own delta — no crash
    * window can double a count, unlike [[appendToDomainClassifier]]'s
    * additive rewrite, which keeps its do-not-replay contract for the
    * batch path).
    */
  def dcDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      graft.pipeline.DeltaModelIngest.append(batch.sparkSession,
        dcFamily(db), srcTag, epochId, batchCounts(batch))

  /** Score a documents frame against the STORED model: no training
    * aggregation in the query path — classes come off the K-row totals
    * table (broadcast), counts off the vocab×K table, V off the 1-row
    * meta table (or their delta-merged equivalents, below).
    */
  private[graft] def scoreAgainst(docs: DataFrame, s: SparkSession,
                                  db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val rw = Window.partitionBy("doc_id")
      .orderBy(col("dc_score").desc, col("c").asc)
    // delta-grown models serve the MERGED count view with totals/vocab
    // derived from it (the stored 1-row tables are stale the moment a
    // delta lands); delta-free models keep the static stored-table plan
    import graft.pipeline.DeltaModelIngest
    val fam = dcFamily(db)
    val (counts, totals, meta) =
      if (DeltaModelIngest.hasDeltas(s, fam)) {
        // three consumers (the score join, totals, vocab) — pin the merged
        // frame once so no branch re-unions the base + delta scans (the
        // cdcChunkStats lesson)
        val eff = PlanCache.swap(s"dc-delta-eff-$db",
          DeltaModelIngest.effectiveCounts(s, fam))
        (eff, eff.groupBy("c").agg(sum("cnt").as("t_c")),
          eff.agg(count_distinct(col("w")).as("v")))
      } else (s.table(fqn(db, DcCountsTable)),
        s.table(fqn(db, DcTotalsTable)), s.table(fqn(db, DcMetaTable)))
    withTokens(docs)
      .select(col("doc_id"), col("source"), explode(col("tokens")).as("w"))
      .crossJoin(broadcast(totals))
      .join(counts, Seq("c", "w"), "left")
      .crossJoin(broadcast(meta))
      .withColumn("rate", expr(
        s"(${DcScale}L * (coalesce(cnt, 0L) + 1L)) div (t_c + v)"))
      .groupBy("doc_id", "source", "c")
      .agg(sum("rate").as("s_sum"), count(lit(1)).as("n"))
      .withColumn("dc_score", expr("s_sum div n"))
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("c").as("pred_source"), col("dc_score"),
        (col("c") === col("source")).cast("int").as("is_correct"))
      .orderBy("doc_id")
  }

  def domainClassifyFromModel(s: SparkSession, d: String,
                              db: String): DataFrame =
    scoreAgainst(t(s, d, "documents"), s, db)

  /** Fold a new labeled batch into the stored model: counts are ADDITIVE →
    * vocab×K-sized rewrite; totals and vocab re-derive from the merged
    * counts. The base corpus is never re-read. The caller must not replay
    * a batch — counts would double (the [[TextOps.appendToQualityClassifier]]
    * contract; drift re-anchors via [[dcRefreshEntry]]).
    */
  def appendToDomainClassifier(s: SparkSession, db: String,
                               docs: DataFrame): Unit = {
    val batch = batchCounts(docs)
    graft.store.Warehouse.rewriteVia(s, db, DcCountsTable)(stored =>
      stored.unionByName(batch).groupBy("c", "w")
        .agg(sum("cnt").as("cnt")))
    graft.store.Warehouse.rewriteVia(s, db, DcTotalsTable)(_ =>
      s.table(fqn(db, DcCountsTable)).groupBy("c")
        .agg(sum("cnt").as("t_c")))
    graft.store.Warehouse.rewriteVia(s, db, DcMetaTable)(_ =>
      s.table(fqn(db, DcCountsTable))
        .agg(count_distinct(col("w")).as("v")))
  }

  /** Scheduled full retrain — re-anchors all counts to the grown corpus
    * (mirrors [[TextOps.qcRefreshEntry]]).
    */
  def dcRefreshEntry(id: String, cronExpr: String, db: String,
                     docs: SparkSession => DataFrame)
      : graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildDomainClassifier(docs(s), db),
      name = "dc_model_refresh", target = s"$db.$DcCountsTable",
      tags = Map("pipeline" -> "domain-mix"))

  /** Registry gate: train on the labeled corpus, store, serve —
    * deterministic integer training means the oracle retrains the same
    * model declaratively and lands on identical scores and argmaxes.
    */
  def domainClassify(s: SparkSession, d: String): DataFrame = {
    buildDomainClassifier(t(s, d, "documents"), "graft_dc_q")
    domainClassifyFromModel(s, d, "graft_dc_q")
  }

  /** Stored-model language ID (gate `q_lang_id_nb`): the same K-class NB,
    * trained on the fixture's DECLARED `lang` as the class label — the
    * stored-model posture [[graft.ops.TextOps.langId]]'s per-query
    * stopword heuristic lacks (trained once, appendable via
    * [[appendToDomainClassifier]]/[[dcDeltaSink]], cron-refreshed via
    * [[dcRefreshEntry]] — the label column is the only difference). The
    * oracle retrains declaratively ([[graft.oracle.Ctes.dcCtesOver]]
    * with `lang`), so a green row proves training AND serving exactly.
    * Scale shape inherits the classifier's: one (c, w) token shuffle to
    * train; serving joins vocab×K tables, K = languages.
    */
  def langIdNbClassify(s: SparkSession, d: String): DataFrame = {
    val docs = langLabeled(s, d)
    buildDomainClassifier(docs, "graft_lang_nb")
    scoreAgainst(docs, s, "graft_lang_nb")
      .select(col("doc_id"), col("pred_source").as("pred_lang"),
        col("dc_score").as("nb_score"), col("is_correct"))
      .orderBy("doc_id")
  }

  /** Documents with the declared language as the NB class label. */
  private[graft] def langLabeled(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("text"), col("lang").as("source"))

  /** The end-use composition: temperature-scaled mixing keyed on the
    * PREDICTED domain instead of the stored label — what a crawl pipeline
    * actually does when sources arrive untrusted (infer the domain, then
    * rebalance on the inference). Same quota formula, sample permutation
    * and WindowGroupLimit shape as [[SamplingOps.temperatureMix]]; only
    * the stratum column changes, so misclassified documents move quota
    * mass between strata exactly as the classifier dictates — which is
    * the point, and what the oracle replays end-to-end (retrain →
    * argmax → mix).
    */
  def domainMixTemperature(s: SparkSession, d: String): DataFrame = {
    buildDomainClassifier(t(s, d, "documents"), "graft_dc_mix")
    val preds = scoreAgainst(t(s, d, "documents"), s, "graft_dc_mix")
      .select(col("doc_id"), col("pred_source").as("source"))
    SamplingOps.temperatureMixOver(preds)
      .select(col("source").as("pred_source"), col("doc_id"), col("quota"),
        col("mix_rank"))
      .orderBy("pred_source", "mix_rank")
  }
}
