package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Stored Naive-Bayes quality classifier: build/serve/append, the
  * classified cleaning pass, AUC/PRF evaluation, reliability and
  * isotonic calibration.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextQcPart extends TextCorePart {

  /** Names of the persisted quality-classifier tables
    * ([[buildQualityClassifier]]).
    */
  val QcTokenTable = "qc_token"
  val QcTotalsTable = "qc_totals"
  val QcThresholdTable = "qc_threshold"
  val QcScale = 1000000L

  /** Seed-referenced quality classifier (the GPT-3 appendix A posture:
    * score each document by how much its tokens look like a trusted
    * high-quality slice), as an exact-integer Naive Bayes the oracle can
    * retrain: the positive class is the eval-convention slice
    * (doc_id % 100 = 7 — the same seed [[decontaminateNgram]] treats as
    * the benchmark set), the negative class is the rest, and each token
    * scores the add-one-smoothed class-rate ratio in [[QcScale]]
    * fixed-point:
    *
    *   q(w) = Scale·(c_pos+1)·(t_neg+V) div ((c_neg+1)·(t_pos+V))
    *
    * (> Scale ⇔ w is positive evidence). A document's score is the
    * token-mean (integer div); the keep rule cross-multiplies against the
    * stored training-corpus mean — the [[perplexityFilter]] idiom, so no
    * float ever crosses an engine boundary.
    *
    * Scale shape: ONE token-volume shuffle keyed w for the class counts;
    * scoring joins the token stream against the vocab-sized count table
    * and a 1-row totals table; the threshold is (Σ, n). Mirrors the LM
    * family exactly.
    */
  /** The quality classifier's delta-model descriptor + batch counts
    * ([[graft.pipeline.DeltaModelIngest]] — exactly-once streaming
    * growth; the stored threshold stays frozen until the cron rebuild,
    * the [[appendToQualityClassifier]] contract).
    */
  def qcFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, QcTokenTable,
      Seq("w"), Seq("c_pos", "c_neg"))

  def qcBatchCounts(docs: DataFrame): DataFrame =
    withTokens(docs)
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long"))
      .select(col("pos"), explode(col("tokens")).as("w"))
      .groupBy("w")
      .agg(sum("pos").as("c_pos"), sum(lit(1L) - col("pos")).as("c_neg"))

  def qcDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      graft.pipeline.DeltaModelIngest.append(batch.sparkSession,
        qcFamily(db), srcTag, epochId, qcBatchCounts(batch))

  def buildQualityClassifier(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    import graft.pipeline.DeltaModelIngest
    val prevGen = DeltaModelIngest.prepareRebuild(s, qcFamily(db))
    val docsT = withTokens(docs)
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long"))
    val counts = docsT
      .select(col("pos"), explode(col("tokens")).as("w"))
      .groupBy("w")
      .agg(sum("pos").as("c_pos"), sum(lit(1L) - col("pos")).as("c_neg"))
    graft.store.Warehouse.saveModel(counts, db, QcTokenTable)
    DeltaModelIngest.finishRebuild(s, qcFamily(db), prevGen)
    val stored = s.table(s"`$db`.`$QcTokenTable`")
    graft.store.Warehouse.saveModel(
      stored.agg(sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
        count(lit(1)).as("v")),
      db, QcTotalsTable)
    val scores = qcScore(docsT,
      s.table(s"`$db`.`$QcTokenTable`"), s.table(s"`$db`.`$QcTotalsTable`"))
    graft.store.Warehouse.saveModel(
      scores.agg(sum("q_score").as("tot"), count(lit(1)).as("n")),
      db, QcThresholdTable)
  }

  private def qcScore(docsT: DataFrame, tokTable: DataFrame,
                      totals: DataFrame): DataFrame =
    docsT.select(col("doc_id"), explode(col("tokens")).as("w"))
      .join(tokTable, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("q", expr(
        s"($QcScale * (coalesce(c_pos, 0L) + 1) * (t_neg + v)) " +
          "div ((coalesce(c_neg, 0L) + 1) * (t_pos + v))"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("q").as("q_sum"))
      .withColumn("q_score", expr("q_sum div n_tokens"))
      .select("doc_id", "n_tokens", "q_score")

  /** Score documents against a STORED classifier ([[buildQualityClassifier]])
    * — no training aggregation in the query path: counts come off the
    * vocab-sized table, totals and threshold off their 1-row tables.
    * Unseen tokens score the neutral smoothing ratio, never drop.
    */
  def qualityClassifierFromModel(s: SparkSession, d: String,
                                 db: String): DataFrame =
    qualityScoresFor(t(s, d, "documents"), db)

  private[graft] def qualityScoresFor(docs: DataFrame, db: String): DataFrame = {
    val s = docs.sparkSession
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val thr = s.table(s"`$db`.`$QcThresholdTable`")
    // delta-grown models serve the merged counts with totals derived
    // from them; delta-free models keep the static stored tables
    import graft.pipeline.DeltaModelIngest
    val (qcnt, qtot) =
      if (DeltaModelIngest.hasDeltas(s, qcFamily(db))) {
        val eff = PlanCache.swap(s"qc-delta-eff-$db",
          DeltaModelIngest.effectiveCounts(s, qcFamily(db)))
        (eff, eff.agg(sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
          count(lit(1)).as("v")))
      } else (s.table(s"`$db`.`$QcTokenTable`"),
        s.table(s"`$db`.`$QcTotalsTable`"))
    qcScore(withTokens(docs), qcnt, qtot)
      .crossJoin(broadcast(thr))
      .withColumn("keep",
        (col("q_score") * col("n") >= col("tot")).cast("int"))
      .select("doc_id", "n_tokens", "q_score", "keep")
      .orderBy("doc_id")
  }

  /** Fold a new document batch into a stored classifier: class-rate
    * counts are ADDITIVE, so the merge is batch-counts ∪ stored-counts →
    * sum — the [[appendToLmModel]] contract verbatim, including its
    * caveats: the caller must not replay a batch (counts double), and
    * the STORED THRESHOLD stays as trained (new counts shift every
    * score, so the corpus mean cannot advance incrementally — drift is
    * re-anchored by [[qcRefreshEntry]]). Cost: the batch's tokens plus a
    * vocab-sized rewrite; the base corpus is never re-read.
    */
  def appendToQualityClassifier(s: SparkSession, db: String,
                                docs: DataFrame): Unit = {
    val docsT = withTokens(docs)
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long"))
    val batch = docsT.select(col("pos"), explode(col("tokens")).as("w"))
      .groupBy("w")
      .agg(sum("pos").as("c_pos"), sum(lit(1L) - col("pos")).as("c_neg"))
    graft.store.Warehouse.rewriteVia(s, db, QcTokenTable)(stored =>
      stored.unionByName(batch).groupBy("w")
        .agg(sum("c_pos").as("c_pos"), sum("c_neg").as("c_neg")))
    graft.store.Warehouse.rewriteVia(s, db, QcTotalsTable)(_ =>
      s.table(s"`$db`.`$QcTokenTable`")
        .agg(sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
          count(lit(1)).as("v")))
  }

  /** Scheduled classifier rebuild — re-anchors counts AND the keep
    * threshold to the grown corpus (mirrors [[lmRefreshEntry]]).
    */
  def qcRefreshEntry(id: String, cronExpr: String, db: String,
                     docs: SparkSession => DataFrame)
      : graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildQualityClassifier(docs(s), db),
      name = "qc_model_refresh", target = s"$db.$QcTokenTable",
      tags = Map("pipeline" -> "quality-filter"))

  /** Registry gate: train, store, serve — deterministic training means
    * the oracle can RETRAIN the same classifier declaratively and land on
    * identical fixed-point scores.
    */
  def qualityClassifier(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_q")
    qualityClassifierFromModel(s, d, "graft_qc_q")
  }

  /** [[corpusClean]] with the trained classifier composed in as the
    * optional final gate (the GPT-3 pipeline order: heuristics first,
    * classifier last) — the NB sibling of [[corpusCleanPerplexity]].
    */
  def corpusCleanClassified(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_clean")
    corpusClean(s, d)
      .join(qualityClassifierFromModel(s, d, "graft_qc_clean")
        .filter(col("keep") === 1).select("doc_id"), Seq("doc_id"), "left_semi")
      .orderBy("doc_id")
  }

  /** Exact ROC-AUC of the trained classifier's scores against the seed
    * labels, via the Mann-Whitney rank statistic with midrank tie
    * handling — the model-evaluation primitive a filtering pipeline
    * needs before trusting a classifier gate:
    *
    *   AUC = (Σ_{pos} midrank − n₊(n₊+1)/2) / (n₊ · n₋)
    *
    * kept EXACT by doubling: midrank2 = 2·cnt_lt + n_at_score + 1 is an
    * integer (twice the tied average rank), U2 = Σ₂r − n₊(n₊+1) is 2U,
    * and auc_ppm = U2·10⁶ div (2·n₊·n₋) divides non-negative DECIMAL(38)
    * operands — both engines replay cell-exact.
    *
    * Scale shape: ranks come off the SCORE HISTOGRAM (one q_score
    * aggregation — the [[TimeSeriesOps.madFromHistogram]] posture), so
    * the running-count window rides the score-distinct frame, never the
    * corpus rows; the corpus is touched once by the scoring join.
    * Gate `q_classifier_auc`.
    */
  def classifierAuc(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_auc")
    aucOver(qualityClassifierFromModel(s, d, "graft_qc_auc")
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long")))
  }

  /** The rank math over a `(q_score, pos)` frame — separable so specs
    * pin perfect/inverted/tied orderings exactly.
    */
  private[graft] def aucOver(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy("q_score")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("q_score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("cnt_lt", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("midrank2", lit(2L) * col("cnt_lt") + col("n") + 1)
    ranked.agg(sum("np").as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np") * col("midrank2")).as("r2_pos"))
      .select(col("n_pos"), col("n_neg"),
        expr("r2_pos - n_pos * (n_pos + 1)").as("u2"),
        expr("CAST((CAST(r2_pos - n_pos * (n_pos + 1) AS DECIMAL(38,0)) " +
          s"* $QcScale) div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) " +
          "AS BIGINT)").as("auc_ppm"))
  }

  /** Confusion matrix + precision/recall/F1 of the classifier's keep
    * gate against the seed labels, exact ppm — F1 in its single-division
    * form 2·tp·10⁶ div (2·tp + fp + fn), so no nested truncation. One
    * corpus-keyed scoring pass + ONE aggregate. Gate `q_classifier_prf`.
    */
  def classifierPrf(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_prf")
    prfOver(qualityClassifierFromModel(s, d, "graft_qc_prf")
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long")))
  }

  /** The confusion math over a `(pos, keep)` frame. */
  private[graft] def prfOver(scored: DataFrame): DataFrame =
    scored
      .agg(sum(expr("pos * keep")).as("tp"),
        sum(expr("(1 - pos) * keep")).as("fp"),
        sum(expr("pos * (1 - keep)")).as("fn"),
        sum(expr("(1 - pos) * (1 - keep)")).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr(s"CAST(CASE WHEN tp + fp = 0 THEN 0 " +
          s"ELSE tp * $QcScale div (tp + fp) END AS BIGINT)")
          .as("precision_ppm"),
        expr(s"CAST(CASE WHEN tp + fn = 0 THEN 0 " +
          s"ELSE tp * $QcScale div (tp + fn) END AS BIGINT)")
          .as("recall_ppm"),
        expr(s"CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 " +
          s"ELSE 2 * tp * $QcScale div (2 * tp + fp + fn) END AS BIGINT)")
          .as("f1_ppm"))

  /** Calibration bins for [[classifierAuc]]'s scores: documents ranked
    * by (q_score, doc_id) into 10 equal-count bins, per bin the
    * positive rate vs the mean score — the reliability diagram that
    * says whether a score of 0.8 MEANS 80% (AUC only says the ordering
    * is right). Exact: bin = (rank−1)·10 div n; rates and mean scores
    * are integer divisions.
    *
    * Scale shape: the global rank is one range exchange over scored
    * rows (the export posture — this is an offline eval, not a serving
    * path); everything after is a 10-row aggregate.
    * Gate `q_calibration_bins`.
    */
  def calibrationBins(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_cal")
    val scored = qualityClassifierFromModel(s, d, "graft_qc_cal")
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long"))
    val n = scored.count()
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("q_score"), col("doc_id"))))
      .withColumn("bin", expr(s"(rnk - 1) * 10 div ${n}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum("q_score").as("score_sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_ppm"),
        expr("score_sum div n").as("mean_score"))
      .orderBy("bin")
  }

  /** Isotonic calibration of the quality-classifier score (pool-adjacent
    * violators via the MINIMAX characterization — Ayer et al. 1955,
    * Robertson-Wright-Dykstra 1988 eq. 1.9: the PAV fit at bin i equals
    *
    *   iso(i) = max_{a ≤ i} min_{b ≥ i} rate(a..b)
    *
    * over segment positive-rates), the monotone regression every
    * production calibrator runs after [[calibrationBins]]'s reliability
    * diagram shows a non-monotone bucket: the fitted curve is the
    * least-squares NONDECREASING rate, deployable as a score→probability
    * table. Sequential PAVA doesn't distribute; the minimax form is a
    * bounded-frame join — segments are pairs over the 10-row bin frame,
    * so every frame is ≤ B² rows however large the corpus.
    *
    * Exactness: segment rates are ordered by the scaled-fraction key
    * `spos·10¹⁸ div scnt` in DECIMAL(38) — distinct rationals p₁/c₁ ≠
    * p₂/c₂ with c ≤ 10⁹ rows differ by ≥ 10¹⁸/c² ≥ 1 in the key, so the
    * key order IS the rational order for any eval sample under a
    * billion rows (an eval bins a sample, not the corpus); ties pick
    * lexicographic-(key, b, spos, scnt) min / max — a total order both
    * engines replay, and equal tuples emit equal ppm regardless. Output
    * ppm is the chosen segment's exact `spos·10⁶ div scnt`.
    *
    * Scale shape: the classifier score + one range exchange for the
    * global rank (the calibrationBins posture — offline eval), then
    * everything is 10-row arithmetic. Gate `q_isotonic_calibration`.
    */
  def isotonicCalibration(s: SparkSession, d: String): DataFrame = {
    buildQualityClassifier(t(s, d, "documents"), "graft_qc_iso")
    val scored = qualityClassifierFromModel(s, d, "graft_qc_iso")
      .withColumn("pos", (col("doc_id") % 100 === 7).cast("long"))
    val n = scored.count()
    val bins = scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("q_score"), col("doc_id"))))
      .withColumn("bin", expr(s"(rnk - 1) * 10 div ${n}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    // broadcast() on every theta-join side: the frames are bin-bounded
    // (≤ B rows) but sit behind a fresh cache whose size statistics are
    // unknown at PLAN time, so the planner's fallback for a non-equi
    // join was CartesianProduct — the one shape the plan policy forbids
    // outright (caught by the round-13 PlanPolicy scan; the eye-scan had
    // missed it past the PLANS.md section truncation). The hint pins
    // BroadcastNestedLoopJoin with the bounded side as build.
    val pinned = PlanCache.swap("iso_bins", bins)
    val segs = pinned.select(col("bin").as("a"))
      .join(broadcast(pinned.select(col("bin").as("b"))),
        col("a") <= col("b"))
      .join(broadcast(pinned.select(col("bin"), col("n"), col("n_pos"))),
        col("bin").between(col("a"), col("b")))
      .groupBy("a", "b")
      .agg(sum("n").as("scnt"), sum("n_pos").as("spos"))
      .withColumn("rate_key", expr(
        "CAST(spos AS DECIMAL(38,0)) * 1000000000000000000 div scnt"))
    val inner = segs
      .join(broadcast(pinned.select(col("bin").as("i"))),
        col("a") <= col("i") && col("i") <= col("b"))
      .groupBy("i", "a")
      .agg(min(struct(col("rate_key"), col("b"), col("spos"),
        col("scnt"))).as("mn"))
    val outer = inner.groupBy("i").agg(max(col("mn")).as("mx"))
    pinned.join(outer, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("raw_rate_ppm"),
        expr("CAST(mx.spos * 1000000 div mx.scnt AS BIGINT)")
          .as("iso_rate_ppm"))
      .orderBy("bin")
  }
}
