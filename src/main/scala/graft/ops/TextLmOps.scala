package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Bigram language models: add-one perplexity, interpolated Kneser-Ney
  * (incl. the count-threshold-pruned production variant), collocations,
  * salient terms, and the stored-LM build/serve/append lifecycle.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextLmPart extends TextCorePart {

  /** Salient terms per source — TF-IDF at source granularity, in INTEGER
    * arithmetic so both engines rank identically (a float idf's last bit
    * could flip a rank-boundary tie): score = tf_in_source × n_sources
    * div n_sources_containing_term. log-free idf is monotone in the
    * standard one, so "rare across sources, frequent here" ordering is
    * preserved; what the corpus-signature use case needs.
    *
    * Scale shape: explode → two-level agg — (source, token) counts carry
    * the only token-volume shuffle (map-side combined); the per-token
    * document frequency is a second agg over the distinct (source, token)
    * pairs, joined back WITHOUT a broadcast hint: vocabulary cardinality
    * is unbounded at corpus scale (urls/typos), so AQE picks broadcast
    * when df is small and a token-keyed shuffle join when it is not —
    * tokenCounts already hash-partitions by (source, token), and the
    * top-k filter is a WindowGroupLimit.
    */
  def salientTermsPerSource(s: SparkSession, d: String,
                            nSourcesHint: Option[Long] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("score").desc, col("token").asc)
    val tokenCounts = withTokens(t(s, d, "documents"))
      .select(col("source"), explode(col("tokens")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
    // the source count is a scalar in the score expression, so it must
    // exist before the plan does; plan-only callers (PlanAudit) pass the
    // hint to stay lazy
    val nSources = nSourcesHint.getOrElse(
      t(s, d, "documents").select("source").distinct().count())
    val docFreq = tokenCounts.groupBy("token")
      .agg(count(lit(1)).as("df"))
    tokenCounts.join(docFreq, "token")
      .withColumn("score", expr(s"tf * ${nSources}L div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("source", "rnk", "token", "tf", "df", "score")
      .orderBy("source", "rnk")
  }

  /** CCNet-style n-gram LM quality filter (Wenzek et al. 2019 §3.3 —
    * score documents with a language model trained on the target domain,
    * keep the fluent head of the distribution) in the engine's
    * exact-integer idiom: a BIGRAM LM trains in-engine over the corpus
    * itself (two aggregations — the vocab-sized count tables join each
    * other on `prev` before the one corpus-sized probe join on the fine
    * (prev, w) key), and each document scores as the fixed-point mean
    * INVERSE transition probability under add-one smoothing:
    *
    *   t_score = (SCALE · (c1(prev) + V)) div (c2(prev, w) + 1)
    *   ppx     = (Σ_t t_score) div n_transitions
    *
    * — a log-free monotone proxy for perplexity (true ppl is the
    * geometric mean of inverse probabilities; the arithmetic mean ranks
    * fluent-vs-rare-sequence text the same direction while staying
    * replayable in exact integer arithmetic — the q_salient_terms
    * contract: a float log's last ulp could flip a keep/drop boundary
    * between engines). `keep` marks documents at or below the CORPUS
    * MEAN score, integer cross-multiplied (ppx·n ≤ Σppx) so the
    * threshold is scale-free and no float ratio exists anywhere.
    *
    * Scale shape: transitions come from zip_with over the token array —
    * never a positional self-join (the tokenizer+zip runs once per
    * consumer: the c2 aggregation and the probe join, both inside
    * columnar codegen); c1 rolls up from the VOCAB-SIZED c2 table, not
    * the corpus; the only corpus-sized shuffle keys on (prev, w) —
    * fine-grained, so stop-word skew spreads across w (AQE skew-join
    * covers the residual); per-doc agg keys on doc_id; the keep rule
    * broadcasts one total row.
    */
  def perplexityFilter(s: SparkSession, d: String,
                       vocabHint: Option[Long] = None): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    // V = corpus vocabulary (all tokens, all docs) — a driver scalar in
    // the score expression, so it must exist before the plan does; the
    // hint keeps plan-only callers (PlanAudit) lazy, like salientTerms
    val vocab = vocabHint.getOrElse(docsT
      .select(explode(col("tokens")).as("w"))
      .agg(countDistinct("w")).head.getLong(0))
    val pw = lmTransitions(docsT)
    val c2 = pw.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    // c1(prev) = Σ_w c2(prev, w): roll up the VOCAB-SIZED bigram table
    // instead of re-aggregating the corpus-sized transition set — and the
    // probe join below shuffles pw on the same (prev, w) key as the c2
    // aggregation, so the exchange is computed once and reused
    val c1 = c2.groupBy("prev").agg(sum("c2").as("c1"))
    val doc = lmScore(pw, c2, c1, vocab)
    val totals = doc.agg(sum("ppx_score").as("tot"), count(lit(1)).as("n"))
    doc.crossJoin(broadcast(totals))
      .withColumn("keep",
        (col("ppx_score") * col("n") <= col("tot")).cast("int"))
      .select("doc_id", "n_trans", "ppx_score", "keep")
      .orderBy("doc_id")
  }

  /** (doc_id, prev, w) transition stream — zip_with over the token array,
    * never a positional self-join. The shared front half of LM training
    * and LM scoring.
    */
  private def lmTransitions(docsT: DataFrame): DataFrame =
    docsT.filter(size(col("tokens")) >= 2)
      .withColumn("p", expr(
        "zip_with(slice(tokens, 1, size(tokens)-1), " +
          "slice(tokens, 2, size(tokens)-1), " +
          "(a, b) -> struct(a AS prev, b AS w))"))
      .select(col("doc_id"), explode(col("p")).as("t"))
      .select(col("doc_id"), col("t.prev").as("prev"), col("t.w").as("w"))

  private val LmScale = 1000L

  /** Per-document fixed-point mean inverse transition probability against
    * a given count model — the ONE scoring definition the in-session
    * filter and the stored-model serve both compose (they can never
    * drift). Left joins + coalesce-to-0: a transition the model has never
    * seen scores as pure add-one smoothing mass ((Scale·(c1+V)) div 1
    * with c1 = 0 for an unseen context) instead of silently dropping out
    * of the mean — on the training corpus itself every join hits, so the
    * values are identical to the former inner-join form (oracle-gated).
    */
  private def lmScore(pw: DataFrame, c2: DataFrame, c1: DataFrame,
                      vocab: Long): DataFrame =
    pw.join(c2, Seq("prev", "w"), "left")
      .join(c1, Seq("prev"), "left")
      .withColumn("t_score",
        expr(s"($LmScale * (coalesce(c1, 0L) + ${vocab}L)) " +
          "div (coalesce(c2, 0L) + 1)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum("t_score").as("score_sum"))
      .withColumn("ppx_score", expr("score_sum div n_trans"))

  /** Kneser-Ney fixed-point scale. */
  val KnScale = 1000000L

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 — the smoothing real LM-based quality filters like
    * KenLM/CCNet actually use, upgrading [[perplexityFilter]]'s add-one
    * smoothing): absolute-discount the observed bigram, back off to the
    * CONTINUATION probability (how many distinct contexts a word follows
    * — "Francisco" is frequent but predictable, so its continuation mass
    * is tiny), interpolated:
    *
    *   p_cont(w)   = N1m(w) / NB          (distinct-predecessor share)
    *   λ(prev)     = D·N1p(prev) / c1(prev)
    *   p(w|prev)   = max(c2−D, 0)/c1 + λ(prev)·p_cont(w),   D = 3/4
    *
    * Exact-integer rendering in [[KnScale]] fixed point (the established
    * staged-division contract — each stage truncates identically in both
    * engines; D = 3/4 keeps the discount integral: c2−D = (4·c2−3)/4):
    *
    *   p_cont_fp = (S·N1m) div NB
    *   term1_fp  = (S·(4·c2 − 3)) div (4·c1)
    *   lam_fp    = (3·S·N1p) div (4·c1)
    *   p_fp      = term1_fp + (lam_fp · p_cont_fp) div S
    *
    * A document scores the integer MEAN p_fp over its transitions
    * (predicted-probability mass — higher = more fluent), and `keep`
    * cross-multiplies against the corpus mean. Since λ ≤ D and
    * N1p ≤ c1, every stage stays far inside Long.
    *
    * Scale shape: c2 is ONE token-volume (prev, w) shuffle; c1/N1p roll
    * up from the vocab-sized c2 (one pass — sum + count), N1m/NB
    * likewise; the per-(prev, w) probability is computed ONCE on the
    * vocab-sized enriched table, and the corpus stream probes it on the
    * same (prev, w) key the c2 aggregation used (exchange reuse — the
    * [[perplexityFilter]] posture). Scoring corpus = training corpus, so
    * every probe hits (inner joins are exact here).
    */
  def kneserNeyScore(s: SparkSession, d: String): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    val pw = lmTransitions(docsT)
    val c2 = pw.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("prev")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1p"))
    val cont = c2.groupBy("w").agg(count(lit(1)).as("n1m"))
    val nb = c2.agg(count(lit(1)).as("nb"))
    val probs = c2.join(c1, Seq("prev")).join(cont, Seq("w"))
      .crossJoin(broadcast(nb))
      .withColumn("p_fp", expr(
        s"(($KnScale * (4*c2 - 3)) div (4*c1)) " +
          s"+ (((3 * $KnScale * n1p) div (4*c1)) " +
          s"* (($KnScale * n1m) div nb)) div $KnScale"))
      .select("prev", "w", "p_fp")
    val doc = pw.join(probs, Seq("prev", "w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum("p_fp").as("p_sum"))
      .withColumn("kn_fp", expr("p_sum div n_trans"))
    knKeepAgainstMean(doc)
  }

  /** The ONE keep rule all three KN gates share (in-session, pruned,
    * stored-model serve — a drift between them would be a second
    * scoring definition): a document keeps iff its mean p_fp is at or
    * above the corpus mean, cross-multiplied so no division happens.
    */
  private def knKeepAgainstMean(doc: DataFrame): DataFrame = {
    val totals = doc.agg(sum("kn_fp").as("tot"), count(lit(1)).as("n"))
    doc.crossJoin(broadcast(totals))
      .withColumn("keep",
        (col("kn_fp") * col("n") >= col("tot")).cast("int"))
      .select("doc_id", "n_trans", "kn_fp", "keep")
      .orderBy("doc_id")
  }

  /** Pruning threshold for [[kneserNeyScorePruned]]: bigram TYPES seen
    * fewer than this many times are dropped from the model tables
    * (hapax pruning — the standard KN practice; SRILM/KenLM default to
    * pruning singleton higher-order n-grams, Chen & Goodman 1999 §5.3).
    */
  val KnPruneMinCount = 2L

  /** [[kneserNeyScore]] with COUNT-THRESHOLD PRUNING of the bigram
    * model (hapax bigram types dropped before the derived statistics
    * are computed): the production-scale variant — at corpus scale the
    * bigram-type table is dominated by singletons (Zipf), so pruning
    * at [[KnPruneMinCount]] shrinks every vocab-sized enrichment table
    * and the probe join's build side by the hapax share while leaving
    * the token-volume (prev, w) count aggregation (the one unavoidable
    * corpus shuffle) untouched. A transition whose bigram was pruned
    * scores through the stored-model backoff law ([[knScoreAgainst]]):
    * λ(prev)·p_cont(w) when the context survives, p_cont(w) alone when
    * the context itself was fully pruned — the SAME rule the serve
    * path applies to unseen pairs, so pruning introduces no second
    * scoring definition. All derived stats (c1, N1p, N1m, NB) roll up
    * from the PRUNED c2 — the model is self-consistent, exactly what a
    * pruned KenLM table serves. Gate `q_kneser_ney_pruned` (exact: the
    * oracle applies the identical cut); the unpruned [[kneserNeyScore]]
    * stays the small-corpus gate.
    */
  def kneserNeyScorePruned(s: SparkSession, d: String): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    val pw = lmTransitions(docsT)
    val c2 = pw.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= KnPruneMinCount)
    knKeepAgainstMean(knScoreAgainst(pw, c2))
  }

  /** Kneser-Ney scoring against the STORED bigram table — the ONE count
    * table [[buildLmModel]] persists serves BOTH smoothing laws: add-one
    * ([[perplexityFilterFromModel]]) and KN (here). Every derived
    * statistic (c1, N1p, N1m, NB) rolls up from the VOCAB-SIZED stored
    * c2 at serve time — vocabulary-bounded work, never a training
    * re-aggregation over the reference corpus; the corpus being scored
    * pays one (prev, w) probe join. A transition the stored model never
    * saw backs off to pure continuation mass (c2 = 0 ⇒ the discounted
    * term vanishes and λ·p_cont is computed under the UNSEEN-context
    * rule: contexts absent from the model score the uniform continuation
    * p_cont alone) — left joins + coalesce, the lmScore posture.
    */
  def kneserNeyFromModel(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    val c2 = s.table(s"`$db`.`$LmCountsTable`")
    val docsT = withTokens(t(s, d, "documents"))
    knKeepAgainstMean(knScoreAgainst(lmTransitions(docsT), c2))
  }

  /** Shared KN scoring core: enrich a c2 count table with its derived
    * stats, probe the transition stream. Unseen (prev, w) pairs score
    * λ(prev)·p_cont(w); fully unseen contexts score p_cont(w) alone.
    */
  private def knScoreAgainst(pw: DataFrame, c2: DataFrame): DataFrame = {
    val c1 = c2.groupBy("prev")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1p"))
    val cont = c2.groupBy("w").agg(count(lit(1)).as("n1m"))
    val nb = c2.agg(count(lit(1)).as("nb"))
    pw.join(c2, Seq("prev", "w"), "left")
      .join(c1, Seq("prev"), "left")
      .join(cont, Seq("w"), "left")
      .crossJoin(broadcast(nb))
      // nb = 0 guard: an EMPTY model table (every bigram type pruned, or
      // a fresh stored model) would make `div nb` throw under ANSI (and
      // go NULL — diverging from the oracle — under non-ANSI). Zero
      // continuation mass is the honest score; the oracle carries the
      // identical CASE.
      .withColumn("p_cont", expr(
        s"CASE WHEN nb = 0 THEN 0L " +
          s"ELSE ($KnScale * coalesce(n1m, 0L)) div nb END"))
      .withColumn("p_fp", expr(
        s"""CASE
           |  WHEN c1 IS NULL THEN p_cont
           |  ELSE coalesce(($KnScale * (4*c2 - 3)) div (4*c1), 0L)
           |     + (((3 * $KnScale * n1p) div (4*c1)) * p_cont) div $KnScale
           |END""".stripMargin.replace("\n", " ")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum("p_fp").as("p_sum"))
      .withColumn("kn_fp", expr("p_sum div n_trans"))
  }

  /** Collocation gate: minimum bigram count and emitted top-k. */
  val CollocMinCount = 5L
  val CollocTopK = 20
  private val CollocScale = 1000000L

  /** Collocation extraction (Church & Hanks 1990 — pointwise mutual
    * information finds word pairs that co-occur far more than chance:
    * multiword expressions, named entities, domain phrases): rank bigram
    * TYPES by the association LIFT
    *
    *   lift = P(w1 w2) / (P(w1)·P(w2)) = c2·T / (c(w1)·c(w2))
    *
    * in [[CollocScale]] fixed point — PMI is log(lift), and lift is its
    * monotone log-free proxy (the engine-wide contract: a float log's
    * last ulp could flip a ranking boundary between engines). Pairs
    * below [[CollocMinCount]] are dropped first (the standard guard: a
    * hapax pair has lift ≈ T — spurious by construction).
    *
    * The product c2·T·Scale can pass 2^63 at corpus scale, so the
    * arithmetic runs through DECIMAL(38,0) end-to-end (the tfidfKnn
    * precedent) — exact in both engines, truncating division last.
    *
    * Scale shape: ONE (prev, w) token-volume shuffle for bigram types +
    * one w-keyed unigram count (vocab-sized output); the lift join is
    * vocab-sized × vocab-sized on single keys; the top-k compiles to
    * TakeOrderedAndProject (per-partition heaps); the rank window runs
    * over the k collected rows only.
    */
  def collocations(s: SparkSession, d: String): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    val pw = lmTransitions(docsT)
    val c2 = pw.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= CollocMinCount)
    val uni = docsT.select(explode(col("tokens")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cw"))
    val tot = uni.agg(sum("cw").as("t_tot"))
    val lifted = c2
      .join(uni.select(col("tok").as("prev"), col("cw").as("cw1")), Seq("prev"))
      .join(uni.select(col("tok").as("w"), col("cw").as("cw2")), Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_fp", expr(
        s"""CAST(CAST($CollocScale AS DECIMAL(38,0)) * CAST(c2 AS DECIMAL(38,0))
           | * CAST(t_tot AS DECIMAL(38,0))
           | div (CAST(cw1 AS DECIMAL(38,0)) * CAST(cw2 AS DECIMAL(38,0)))
           | AS BIGINT)""".stripMargin.replace("\n", " ")))
    val top = lifted
      .select("prev", "w", "c2", "lift_fp")
      .orderBy(col("lift_fp").desc, col("prev"), col("w"))
      .limit(CollocTopK)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("lift_fp").desc, col("prev"), col("w"))).cast("int"))
      .select(col("rnk"), col("prev").as("w1"), col("w").as("w2"),
        col("c2"), col("lift_fp"))
      .orderBy("rnk")
  }

  /** Names of the persisted LM tables ([[buildLmModel]]). */
  val LmCountsTable = "lm_bigram"
  val LmVocabTable = "lm_vocab"
  val LmThresholdTable = "lm_threshold"

  /** Train-once for the perplexity filter — the ANN serving posture
    * applied to quality filtering: the bigram count table (vocab-sized —
    * the LM IS its counts), the vocabulary, and the training corpus's
    * score distribution (Σ, n — the keep threshold) land as warehouse
    * tables; any later session scores documents from storage without
    * re-aggregating the training corpus ([[perplexityFilterFromModel]]).
    */
  /** Delta-model descriptors for exactly-once streaming growth
    * ([[graft.pipeline.DeltaModelIngest]]): the LM carries TWO families —
    * the bigram counts and the vocabulary SET (empty sumCols =
    * union-distinct merge) — because the smoothing constant V must grow
    * with the batches for the merged view to equal a union retrain.
    */
  def lmCountsFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, LmCountsTable,
      Seq("prev", "w"), Seq("c2"))
  def lmVocabFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, LmVocabTable,
      Seq("w"), Seq.empty)

  def lmBatchCounts(docs: DataFrame): DataFrame =
    lmTransitions(withTokens(docs))
      .groupBy("prev", "w").agg(count(lit(1)).as("c2"))
  def lmBatchVocab(docs: DataFrame): DataFrame =
    withTokens(docs).select(explode(col("tokens")).as("w")).distinct()

  /** foreachBatch adapter: exactly-once LM growth — counts AND vocab
    * fold as (source, epoch)-named overwrite deltas; a partial crash
    * redelivers both (each overwrite lands identical bytes). The stored
    * threshold stays frozen until the cron rebuild, as documented on
    * [[appendToLmModel]].
    */
  def lmDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) => {
      val s = batch.sparkSession
      graft.pipeline.DeltaModelIngest.append(s, lmCountsFamily(db), srcTag,
        epochId, lmBatchCounts(batch))
      graft.pipeline.DeltaModelIngest.append(s, lmVocabFamily(db), srcTag,
        epochId, lmBatchVocab(batch))
    }

  def buildLmModel(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    import graft.pipeline.DeltaModelIngest
    val prevGenC = DeltaModelIngest.prepareRebuild(s, lmCountsFamily(db))
    val prevGenV = DeltaModelIngest.prepareRebuild(s, lmVocabFamily(db))
    val docsT = withTokens(docs)
    val vocabDf = docsT.select(explode(col("tokens")).as("w")).distinct()
    graft.store.Warehouse.saveModel(vocabDf, db, LmVocabTable)
    val pw = lmTransitions(docsT)
    val c2 = pw.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    graft.store.Warehouse.saveModel(c2, db, LmCountsTable)
    DeltaModelIngest.finishRebuild(s, lmCountsFamily(db), prevGenC)
    DeltaModelIngest.finishRebuild(s, lmVocabFamily(db), prevGenV)
    // the stored threshold = the TRAINING corpus's mean (as Σ and n, so
    // the serve-side keep rule stays an integer cross-multiplication)
    val stored = s.table(s"`$db`.`$LmCountsTable`")
    val c1 = stored.groupBy("prev").agg(sum("c2").as("c1"))
    val vocab = s.table(s"`$db`.`$LmVocabTable`").count()
    graft.store.Warehouse.saveModel(
      lmScore(pw, stored, c1, vocab)
        .agg(sum("ppx_score").as("tot"), count(lit(1)).as("n")),
      db, LmThresholdTable)
  }

  /** Score documents against a STORED LM ([[buildLmModel]]) — no training
    * aggregation over any corpus in the query path: counts come off the
    * vocab-sized table (c1 rolls up from it, never from a transition
    * stream), V is the vocab table's row count (a bounded metadata job),
    * and the keep rule compares to the STORED training-corpus mean — the
    * production shape for filtering a NEW batch with yesterday's LM.
    * Unseen transitions score as smoothing mass, never drop (see
    * [[lmScore]]); n_trans is therefore always tokens−1.
    */
  def perplexityFilterFromModel(s: SparkSession, d: String,
                                db: String): DataFrame =
    perplexityScoreFromModel(t(s, d, "documents"), db)

  private[graft] def perplexityScoreFromModel(docs: DataFrame,
                                              db: String): DataFrame = {
    val s = docs.sparkSession
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val pw = lmTransitions(withTokens(docs))
    // delta-grown models serve the merged count/vocab views
    // (DeltaModelIngest); delta-free models keep the static tables
    import graft.pipeline.DeltaModelIngest
    val c2 =
      if (DeltaModelIngest.hasDeltas(s, lmCountsFamily(db)))
        DeltaModelIngest.effectiveCounts(s, lmCountsFamily(db))
      else s.table(s"`$db`.`$LmCountsTable`")
    val c1 = c2.groupBy("prev").agg(sum("c2").as("c1"))
    val vocab =
      (if (DeltaModelIngest.hasDeltas(s, lmVocabFamily(db)))
        DeltaModelIngest.effectiveCounts(s, lmVocabFamily(db))
      else s.table(s"`$db`.`$LmVocabTable`")).count()
    val thr = s.table(s"`$db`.`$LmThresholdTable`")
    lmScore(pw, c2, c1, vocab)
      .crossJoin(broadcast(thr))
      .withColumn("keep",
        (col("ppx_score") * col("n") <= col("tot")).cast("int"))
      .select("doc_id", "n_trans", "ppx_score", "keep")
      .orderBy("doc_id")
  }

  /** Fold a new document batch into a stored LM: bigram counts are
    * ADDITIVE, so the merge is batch-counts ∪ stored-counts → sum — cost
    * is the batch's transitions plus a vocab-sized rewrite
    * ([[graft.store.Warehouse.rewriteVia]] temp-swap), never a re-read of
    * the base corpus; the vocab table grows by the batch's new tokens.
    * The STORED THRESHOLD is deliberately left as trained: new counts
    * shift every document's score, so the training-corpus mean cannot be
    * advanced incrementally — drift is bounded by the scheduled rebuild
    * ([[lmRefreshEntry]]), the frozen-parameter contract every index
    * family carries. Batch-level API: the caller must not replay a batch
    * (counts would double — there is no id-range idempotence for counts).
    * Crash window: a death between the counts and vocab rewrites leaves
    * the vocab one batch behind (V slightly small in the smoothing
    * constant) — and since the batch must NOT be replayed, the remedy
    * for any mid-append crash is the scheduled rebuild, which re-derives
    * both tables from the corpus.
    */
  def appendToLmModel(s: SparkSession, db: String, docs: DataFrame): Unit = {
    val docsT = withTokens(docs)
    val batchC2 = lmTransitions(docsT)
      .groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    graft.store.Warehouse.rewriteVia(s, db, LmCountsTable)(stored =>
      stored.unionByName(batchC2)
        .groupBy("prev", "w").agg(sum("c2").as("c2")))
    val batchVocab = docsT.select(explode(col("tokens")).as("w")).distinct()
    graft.store.Warehouse.rewriteVia(s, db, LmVocabTable)(stored =>
      stored.unionByName(batchVocab).distinct())
  }

  /** Scheduled LM rebuild — re-anchors counts AND the keep threshold to
    * the grown corpus on the cron cadence (mirrors the ANN refresh
    * entries).
    */
  def lmRefreshEntry(id: String, cronExpr: String, db: String,
                     docs: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildLmModel(docs(s), db),
      name = "lm_model_refresh", target = s"$db.$LmCountsTable",
      tags = Map("pipeline" -> "quality-filter"))

  /** [[corpusClean]] with the perplexity gate composed in — the OPTIONAL
    * extra stage a CCNet-style pipeline adds after exact-dedup + heuristic
    * quality: only documents the corpus-trained bigram LM flags as fluent
    * ([[perplexityFilter]] keep = 1) survive. The LM trains on the RAW
    * corpus (the target-domain-corpus posture of Wenzek et al. 2019);
    * both halves are individually oracle-gated, and this composition is
    * gated end-to-end as q_corpus_clean_ppx.
    */
  def corpusCleanPerplexity(s: SparkSession, d: String,
                            vocabHint: Option[Long] = None): DataFrame =
    corpusClean(s, d)
      .join(perplexityFilter(s, d, vocabHint).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
      .orderBy("doc_id")
}
