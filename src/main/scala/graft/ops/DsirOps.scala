package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select pretraining documents whose HASHED-N-GRAM feature distribution
  * looks like a small trusted target set, by (1) fitting bag-of-features
  * models to the target and to the raw pool, (2) weighting every raw
  * document by how much more likely its features are under the target
  * model, and (3) sampling the corpus with probability proportional to
  * the weight (not a hard top-k — low-weight docs must stay reachable,
  * the paper's diversity argument).
  *
  * Exact-integer rendering (the engine's cross-engine contract):
  *  - features are hashed BIGRAMS: bucket = leading-16-bit md5 fold of
  *    "w1 w2" mod [[Buckets]] (the paper's hashed n-gram features; the
  *    same fold [[TfidfOps.dimOf]] uses);
  *  - the target model is the eval-convention slice (doc_id % 100 = 7 —
  *    the seed every decontamination/classifier family shares), the raw
  *    model is the rest;
  *  - a feature's importance ratio is the add-one-smoothed class-rate
  *    ratio in [[Scale]] fixed point,
  *      r(f) = Scale·(c_t(f)+1)·(T_r+B) div ((c_r(f)+1)·(T_t+B)),
  *    and a document's weight is the integer MEAN of r over its feature
  *    occurrences — the [[TextOps.perplexityFilter]] posture: a log-free
  *    monotone proxy for the paper's mean log-likelihood-ratio (the
  *    arithmetic mean of ratios ranks target-like vs raw-like documents
  *    in the same direction while staying replayable in exact integer
  *    arithmetic; a float log's last ulp could flip a selection
  *    boundary between engines);
  *  - the weighted draw is PRIORITY SAMPLING (Duffield, Lund & Thorup
  *    2007 — the [[SamplingOps.prioritySample]] idiom): u = 16-bit md5
  *    fold of doc_id + 1, priority = weight·65536 div u, top-[[SampleK]]
  *    win. Heavy docs enter with probability ∝ weight, yet any doc CAN
  *    win — exactly the paper's sampled-not-ranked selection, fully
  *    deterministic in both engines.
  *
  * Scale shape: ONE feature-volume shuffle builds the bucket count table
  * (bucket-keyed, reduce state bounded by [[Buckets]] — map-side
  * combined); scoring joins the corpus feature stream against the
  * B-sized broadcast model; the draw is `orderBy.limit(k)` — Spark
  * compiles it to TakeOrderedAndProject (per-partition heaps, never a
  * global sort). Target docs are excluded from the draw (they are the
  * reference, not candidates).
  */
object DsirOps {

  /** Hashed feature space size (reduce state bound, not a quality knob
    * at gate scale; the paper uses 10k at web scale).
    */
  val Buckets = 1024L

  /** Importance fixed-point scale. */
  val Scale = 1000000L

  /** Selected sample size. */
  val SampleK = 40

  private def hexVal(c: Column): Column =
    call_function("instr", lit("0123456789abcdef"), c) - 1

  private def fold16(c: Column): Column = {
    val h = md5(c.cast("binary"))
    (hexVal(substring(h, 1, 1)) * 4096
      + hexVal(substring(h, 2, 1)) * 256
      + hexVal(substring(h, 3, 1)) * 16
      + hexVal(substring(h, 4, 1))).cast("long")
  }

  /** (doc_id, is_target, f): one row per bigram occurrence, f the hashed
    * bucket.
    */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs.withColumn("tokens", TextOps.tokensOf(col("text")))
      .filter(size(col("tokens")) >= 2)
      .select(col("doc_id"),
        (col("doc_id") % 100 === 7).cast("long").as("is_target"),
        explode(expr(
          "transform(sequence(1, size(tokens) - 1), " +
            "i -> concat_ws(' ', slice(tokens, i, 2)))")).as("g"))
      .withColumn("f", fold16(col("g")) % Buckets)
      .drop("g")

  /** Gate `q_dsir_select`: the importance-weighted priority draw —
    * sample_rank, doc_id, feature count, importance weight, the drawn
    * uniform and the priority, replayed end-to-end by the oracle
    * (declarative retrain, the q_quality_classifier posture).
    */
  def dsirSelect(s: SparkSession, d: String): DataFrame = {
    // the feature explode (per-bigram md5 + hex fold) feeds TWO branches
    // — the bucket counts and the raw-side scoring join — with different
    // downstream shuffles, so nothing dedupes the subtree; pin it once
    // (r14: the plan re-ran the md5 explode twice, ~1 s of the gate)
    val fs = PlanCache.swap("dsir_features", features(t(s, d, "documents")))
    val counts = fs.groupBy("f").agg(
      sum("is_target").as("c_t"),
      sum(lit(1L) - col("is_target")).as("c_r"))
    val totals = counts.agg(sum("c_t").as("t_t"), sum("c_r").as("t_r"))
    selectAgainst(fs, counts, totals)
  }

  /** The ONE scoring+draw definition the in-query gate and the stored-
    * model serve both compose (they can never drift — the lmScore
    * contract).
    */
  private def selectAgainst(fs: DataFrame, counts: DataFrame,
                            totals: DataFrame): DataFrame = {
    val weighted = fs.filter(col("is_target") === 0)
      .join(counts, Seq("f"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("r", expr(
        s"($Scale * (coalesce(c_t, 0L) + 1) * (t_r + $Buckets)) " +
          s"div ((coalesce(c_r, 0L) + 1) * (t_t + $Buckets))"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("r").as("r_sum"))
      .withColumn("imp_fp", expr("r_sum div n_feats"))
    val drawn = weighted
      .withColumn("u", fold16(col("doc_id").cast("string")) + 1)
      .withColumn("priority_fp", expr("imp_fp * 65536L div u"))
      .select("doc_id", "n_feats", "imp_fp", "u", "priority_fp")
      .orderBy(col("priority_fp").desc, col("doc_id")).limit(SampleK)
    drawn.withColumn("sample_rank", row_number().over(
        Window.orderBy(col("priority_fp").desc, col("doc_id"))).cast("int"))
      .select("sample_rank", "doc_id", "n_feats", "imp_fp", "u",
        "priority_fp")
      .orderBy("sample_rank")
  }

  /** Names of the persisted DSIR model tables ([[buildDsirModel]]). */
  val DsirCountsTable = "dsir_bucket"
  val DsirTotalsTable = "dsir_totals"

  /** Delta-model descriptor + batch counts — exactly-once streaming
    * growth through [[graft.pipeline.DeltaModelIngest]] (the qcFamily
    * posture: bucket counts are additive, deltas land as (source,
    * epoch)-named overwrite-idempotent tables).
    */
  def dsirFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, DsirCountsTable,
      Seq("f"), Seq("c_t", "c_r"))

  def dsirBatchCounts(docs: DataFrame): DataFrame =
    features(docs).groupBy("f").agg(
      sum("is_target").as("c_t"),
      sum(lit(1L) - col("is_target")).as("c_r"))

  def dsirDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      graft.pipeline.DeltaModelIngest.append(batch.sparkSession,
        dsirFamily(db), srcTag, epochId, dsirBatchCounts(batch))

  /** Train-once: the B-sized bucket count table + 1-row totals land as
    * warehouse tables (the buildLmModel posture) — later sessions draw
    * against storage without re-counting the reference corpus.
    */
  def buildDsirModel(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    import graft.pipeline.DeltaModelIngest
    val prevGen = DeltaModelIngest.prepareRebuild(s, dsirFamily(db))
    graft.store.Warehouse.saveModel(dsirBatchCounts(docs), db,
      DsirCountsTable)
    DeltaModelIngest.finishRebuild(s, dsirFamily(db), prevGen)
    graft.store.Warehouse.saveModel(
      s.table(s"`$db`.`$DsirCountsTable`")
        .agg(sum("c_t").as("t_t"), sum("c_r").as("t_r")),
      db, DsirTotalsTable)
  }

  /** Score + draw against the STORED model — no training aggregation in
    * the query path: the corpus feature stream joins the B-sized stored
    * count table and the 1-row totals (delta-grown models serve the
    * merged counts with totals derived from them — the qualityScoresFor
    * branch). Note the weights stay anchored to the TRAINING pool until
    * a rebuild — the appendToLmModel caveat.
    */
  def dsirSelectFromModel(s: SparkSession, d: String,
                          db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    import graft.pipeline.DeltaModelIngest
    val (counts, totals) =
      if (DeltaModelIngest.hasDeltas(s, dsirFamily(db))) {
        val eff = PlanCache.swap(s"dsir-delta-eff-$db",
          DeltaModelIngest.effectiveCounts(s, dsirFamily(db)))
        (eff, eff.agg(sum("c_t").as("t_t"), sum("c_r").as("t_r")))
      } else (s.table(s"`$db`.`$DsirCountsTable`"),
        s.table(s"`$db`.`$DsirTotalsTable`"))
    selectAgainst(features(t(s, d, "documents")), counts, totals)
  }

  /** Scheduled model rebuild — re-anchors the class models (and folds
    * any accumulated deltas into a fresh generation) on the cron
    * cadence, the lmRefreshEntry posture.
    */
  def dsirRefreshEntry(id: String, cronExpr: String, db: String,
                       docs: SparkSession => DataFrame)
      : graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildDsirModel(docs(s), db),
      name = "dsir_model_refresh", target = s"$db.$DsirCountsTable",
      tags = Map("pipeline" -> "data-selection"))

  /** Fold a new document batch into the stored model: bucket counts are
    * ADDITIVE (the appendToQualityClassifier contract verbatim,
    * including its do-not-replay caveat); totals rebuild from the
    * B-sized table, never the corpus.
    */
  def appendToDsirModel(s: SparkSession, db: String,
                        docs: DataFrame): Unit = {
    val batch = features(docs).groupBy("f").agg(
      sum("is_target").as("c_t"),
      sum(lit(1L) - col("is_target")).as("c_r"))
    graft.store.Warehouse.rewriteVia(s, db, DsirCountsTable)(stored =>
      stored.unionByName(batch).groupBy("f")
        .agg(sum("c_t").as("c_t"), sum("c_r").as("c_r")))
    graft.store.Warehouse.rewriteVia(s, db, DsirTotalsTable)(_ =>
      s.table(s"`$db`.`$DsirCountsTable`")
        .agg(sum("c_t").as("t_t"), sum("c_r").as("t_r")))
  }
}
