package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Deterministic corpus sampling / mixing / packing — the dataset-assembly
  * stage of a training-data pipeline (select a reproducible subset per
  * stratum, mix sources by weight, pack documents into fixed token-budget
  * training sequences).
  *
  * Determinism contract: sampling order is md5(doc_id) — a fixed, engine-
  * independent permutation both Spark and the DuckDB oracle compute
  * identically, unlike rand(seed) whose stream is engine-specific.
  */
object SamplingOps {

  private def sampleKey = md5(col("doc_id").cast("string").cast("binary"))

  /** Non-negative numeric source suffix or a LOUD, operator-named error —
    * shared by both mixes so their failure contracts can't diverge.
    */
  private def checkedSuffix(op: String) = {
    val suffix = expr("try_cast(substring(source, 4) AS INT)")
    when(suffix.isNull || suffix < 0, raise_error(concat(
      lit(s"$op: source name has no non-negative numeric suffix: "),
      col("source"))))
      .otherwise(suffix)
  }

  /** Per-language deterministic sample of k documents: rank by the md5
    * permutation within each stratum, keep the first k. Scale shape: the
    * rank-≤-k filter compiles to WindowGroupLimit — map-side per-group
    * top-k before the single hash exchange on `lang`, never a global sort.
    */
  def stratifiedSample(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("sk"), col("doc_id"))
    t(s, d, "documents")
      .withColumn("sk", sampleKey)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select("lang", "doc_id", "sample_rank")
      .orderBy("lang", "sample_rank")
  }

  /** Weighted corpus mixing: each source contributes a quota of documents
    * proportional to its weight (here derived from the source name so the
    * oracle can reproduce it; production passes a weights table). The
    * constant rank bound (max quota) keeps the WindowGroupLimit pushdown;
    * the per-source quota filters on top.
    */
  val MixUnit = 5
  def weightedMix(s: SparkSession, d: String): DataFrame = {
    val maxQuota = 3 * MixUnit
    val w = Window.partitionBy("source").orderBy(col("sk"), col("doc_id"))
    // full numeric suffix (no length cap — a capped substring would
    // silently truncate long suffixes), and a non-numeric OR negative
    // suffix fails LOUDLY instead of null-ing/zeroing its quota and
    // silently dropping the whole source from the mix (the oracle's
    // substr+CAST errors too). try_cast, not cast: ANSI cast would throw
    // its own error before the guard runs — the guard exists to name the
    // OPERATOR and the source. Negative matters: -4 % 3 = -1 would make
    // quota 0 (a silent drop) with no cast error at all.
    val checked = checkedSuffix("weightedMix")
    t(s, d, "documents")
      .withColumn("quota", (lit(1) + checked % 3) * MixUnit)
      .withColumn("sk", sampleKey)
      .withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= maxQuota && col("mix_rank") <= col("quota"))
      .select("source", "doc_id", "mix_rank")
      .orderBy("source", "mix_rank")
  }

  /** Token-budget sequence packing: concatenate the corpus in doc_id order
    * and split every `budget` tokens — each document belongs to the
    * sequence where it STARTS (seq_id = tokens-before-this-doc div budget),
    * the standard concat-and-chunk assignment of LLM pre-training.
    *
    * The naive formulation is a running sum over a GLOBAL order — an
    * `Exchange SinglePartition` that serializes the whole corpus through
    * one task. This is the distributed two-phase prefix sum instead:
    *   1. EQUI-DEPTH buckets contiguous in doc_id order
    *      ([[equiDepthBucketed]] — range buckets from min/max would
    *      degenerate under a skewed id distribution);
    *   2. per-bucket token totals (tiny: nBuckets rows to the driver,
    *      index metadata like the IVF centroids);
    *   3. running sum WITHIN each bucket in parallel + the broadcast
    *      cumulative offset of all prior buckets.
    * Each bucket's window runs on its own partition; nothing corpus-sized
    * ever converges on one task.
    */
  def packSequences(s: SparkSession, d: String, budget: Int = 512,
                    nBuckets: Int = 32): DataFrame =
    packTokens(t(s, d, "documents")
      .select(col("doc_id"), expr("greatest(n_chars div 4, 1)").as("tokens")),
      budget, nBuckets)

  /** [[packSequences]] with budgets measured in LEARNED BPE tokens
    * instead of the chars/4 proxy (the round-11 re-basing: every token
    * budget the packer fills is now a real tokenizer count). Trains/
    * stores the model like the q_bpe_tokenize gate, then feeds the
    * served per-doc piece counts (floored at 1, the proxy's convention)
    * into the same two-phase prefix-sum packing — scale shape unchanged.
    */
  def packSequencesBpe(s: SparkSession, d: String, budget: Int = 512,
                       nBuckets: Int = 32): DataFrame = {
    BpeOps.buildBpeModel(t(s, d, "documents"), "graft_bpe_pack")
    packTokens(
      BpeOps.bpeTokenizeFromModel(s, d, "graft_bpe_pack")
        .select(col("doc_id"),
          greatest(col("n_bpe_tokens"), lit(1L)).as("tokens")),
      budget, nBuckets)
  }

  /** Contiguous-in-id equi-depth bucketing: boundaries come from a
    * mergeable approx-quantile sketch (one pass, no global sort), so every
    * bucket holds ~n/nBuckets rows REGARDLESS of how the ids are
    * distributed. Range buckets over (max-min)/nBuckets would serialize
    * the whole corpus into one window partition the moment the id space is
    * dense in one region (e.g. one far outlier id inflating the span
    * 1000×). Boundaries are internal: seq_id assignment is bucket-count-
    * and-boundary-invariant (property-tested), so the sketch's
    * approximation error can never affect output — only balance.
    */
  private[graft] def equiDepthBucketed(docs: DataFrame, nBuckets: Int,
                                       keyCol: String = "doc_id"): DataFrame = {
    if (nBuckets <= 1) return docs.withColumn("bucket", lit(0))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = docs.stat.approxQuantile(keyCol, probs, 0.001)
    // bucket = number of boundaries strictly below this key — monotone in
    // the key, so buckets stay contiguous ranges (the prefix-sum
    // invariant); equal keys always share a bucket
    val bucket = bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(keyCol) > lit(b), 1).otherwise(0)
    }
    docs.withColumn("bucket", bucket)
  }

  /** [[packSequences]] over any (doc_id, tokens) frame. */
  private[graft] def packTokens(docs: DataFrame, budget: Int,
                                nBuckets: Int): DataFrame = {
    val s = docs.sparkSession
    if (docs.agg(min("doc_id")).head().isNullAt(0))
      return docs.withColumn("seq_id", lit(0L)).select("doc_id", "tokens", "seq_id")
    val bucketed = equiDepthBucketed(docs, nBuckets)
    // phase 2: per-bucket totals → cumulative offsets (≤ nBuckets rows)
    val totals = bucketed.groupBy("bucket").agg(sum("tokens").as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetDf = s.createDataFrame(offsets.toSeq)
      .toDF("bucket", "bucket_offset")
    // phase 3: parallel within-bucket running sums + broadcast offsets
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    bucketed.join(broadcast(offsetDf), Seq("bucket"))
      .withColumn("cum", col("bucket_offset") + sum("tokens").over(w))
      .withColumn("seq_id", expr(s"(cum - tokens) div $budget"))
      .select("doc_id", "tokens", "seq_id")
      .orderBy("doc_id")
  }

  /** Temperature-scaled source mixing: per-source quota ∝ weight^(1/T)
    * (the standard multi-corpus re-balancing that upweights small sources;
    * T→∞ is uniform, T=1 is proportional). T is fixed at 2 — i.e. sqrt —
    * DELIBERATELY: IEEE-754 sqrt is correctly rounded in every engine, so
    * `floor(sqrt(w) * MixUnit)` is the same integer in Spark and the
    * oracle, unlike pow/ln whose last-bit rounding is libm-specific. Same
    * md5 permutation and constant-rank-bound WindowGroupLimit shape as
    * [[weightedMix]].
    */
  def temperatureMix(s: SparkSession, d: String): DataFrame =
    temperatureMixOver(t(s, d, "documents"))

  /** [[temperatureMix]] over any (doc_id, source) frame — the
    * domain-routed composition passes PREDICTED sources
    * ([[DomainOps.domainMixTemperature]]); stored sources are just the
    * `documents` special case.
    */
  private[graft] def temperatureMixOver(docs: DataFrame): DataFrame = {
    val nWeights = 9
    val maxQuota = math.floor(math.sqrt(nWeights.toDouble) * MixUnit).toInt
    val w = Window.partitionBy("source").orderBy(col("sk"), col("doc_id"))
    // same shared guard as weightedMix: a negative suffix would otherwise
    // reach sqrt(negative) = NaN and die as a generic ANSI cast error
    val weight = (lit(1) + checkedSuffix("temperatureMix") % nWeights)
      .cast("double")
    docs
      .withColumn("quota", floor(sqrt(weight) * MixUnit).cast("int"))
      .withColumn("sk", sampleKey)
      .withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= maxQuota && col("mix_rank") <= col("quota"))
      .select("source", "doc_id", "quota", "mix_rank")
      .orderBy("source", "mix_rank")
  }

  /** Deterministic export shuffle: the write-time global permutation of a
    * training corpus (training reads files sequentially, so the shuffle
    * must happen at export). Every document gets an engine-independent
    * pseudorandom shard (two hex chars of the md5 permutation key folded
    * to an int — portable to the oracle, which has no xxhash64) and a
    * within-shard rank by the full key. Scale shape: ONE hash exchange on
    * `shard` + per-shard sort — never a global sort or single-partition
    * window; the production write is `.repartition(col("shard"))
    * .sortWithinPartitions("sk").write.partitionBy("shard")` — see
    * [[exportShuffledWrite]].
    */
  /** Hash buckets the deterministic split grid divides documents into, and
    * the train/val boundaries on that grid (per-mille): bucket < 980 →
    * train, < 990 → val, else test.
    */
  val SplitBuckets = 1000
  val TrainPerMille = 980
  val ValPerMille = 990

  /** Deterministic train/val/test split assignment — the reproducible
    * holdout carve every training-corpus build needs before packing.
    * Bucket = the leading 16 bits of md5(lang|source|doc_id) mod
    * [[SplitBuckets]]: salting the key with the stratum makes assignments
    * independent ACROSS strata (a doc_id never lands in the same bucket
    * row-for-row in two strata), so each (lang, source) cell receives the
    * target proportions in expectation with zero coordination.
    *
    * Scale shape: per-row hash arithmetic, NO shuffle at all — the
    * embarrassingly parallel posture. The tempting "exact-count" variant
    * (row_number per stratum, first 98% → train) is the anti-pattern at
    * corpus scale: it funnels each stratum through one window-sort task,
    * and a stratum is corpus-sized. The 16-bit fold is uniform on the
    * 1000-bucket grid to within 2⁻¹⁶ bias (65536 % 1000 ≠ 0 —
    * deterministic, documented, negligible).
    */
  /** Leading 16 bits of an md5 hex key on the [[SplitBuckets]] grid — the
    * single bucket derivation shared by the flat split and the
    * cluster-keyed leakage-safe split ([[WebTextOps.leakageSafeSplit]]),
    * so the two assignments can never silently use different arithmetic.
    */
  private[graft] def bucketOfKey(sk: Column): Column =
    ((hexVal(substring(sk, 1, 1)) * 4096
      + hexVal(substring(sk, 2, 1)) * 256
      + hexVal(substring(sk, 3, 1)) * 16
      + hexVal(substring(sk, 4, 1)))
      % SplitBuckets).cast("int")

  def splitAssign(s: SparkSession, d: String): DataFrame = {
    // concat (not concat_ws): a null stratum column nulls the key — the
    // same propagation the oracle's `||` has — and the null bucket routes
    // to the CASE fallback identically in both engines
    val sk = md5(concat(col("lang"), lit("|"), col("source"), lit("|"),
      col("doc_id").cast("string")).cast("binary"))
    t(s, d, "documents")
      .withColumn("sk", sk)
      .withColumn("bucket", bucketOfKey(col("sk")))
      .withColumn("split",
        when(col("bucket") < TrainPerMille, "train")
          .when(col("bucket") < ValPerMille, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "bucket", "split")
      .orderBy("doc_id")
  }

  val ExportShards = 8

  /** The shard of a permutation key (two leading hex chars folded with an
    * odd multiplier — with a power-of-two shard count, a·16 + b would
    * reduce to b % shards and waste the first character's entropy).
    */
  private def shardOfSk(sk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (((hexVal(substring(sk, 1, 1)) * 13) + hexVal(substring(sk, 2, 1)))
      % ExportShards).cast("int")

  private def hexVal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // call_function: the functions.instr overload takes only a String
    // literal for the needle; SQL instr accepts any expression
    call_function("instr", lit("0123456789abcdef"), c) - 1

  /** Shard of a doc_id directly — the pre-filter incremental rewrites use
    * to restrict a frame to affected shards with the SAME law the window
    * applies (computed from the same md5 key).
    */
  private[graft] def shardOfDocId: org.apache.spark.sql.Column =
    shardOfSk(sampleKey)
  /** Shard + rank assignment WITHOUT a total output order — the write
    * path consumes this directly (a trailing global orderBy would range-
    * sort the entire corpus only for the repartition to destroy it).
    * Shard folds BOTH leading hex chars with an odd multiplier: with a
    * power-of-two shard count, (a·16 + b) % shards would reduce to
    * b % shards and waste the first character's entropy.
    */
  private def exportAssignments(s: SparkSession, d: String,
                                payload: Seq[String] = Nil): DataFrame =
    shardAssignments(t(s, d, "documents"), payload)

  /** [[exportAssignments]] over any frame carrying doc_id (+ payload
    * columns) — the corpus pipeline shards its packed output through the
    * same permutation law.
    */
  /** `packTokensCol`/`packBudget`: per-SHARD sequence packing fused into
    * the same window — seq_id = (tokens before this doc in shard read
    * order) div budget. A shard is the unit a training run reads
    * sequentially, so sequences must not span shards; packing inside the
    * shard window also makes a shard's packing a function of ITS rows
    * alone — append-only corpus growth re-packs only the shards that
    * received documents (the incremental-pipeline contract). Same
    * exchange, one extra running sum.
    */
  private[graft] def shardAssignments(docs: DataFrame,
                                      payload: Seq[String] = Nil,
                                      packTokensCol: Option[String] = None,
                                      packBudget: Int = 512): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("sk"), col("doc_id"))
    val assigned = docs
      .withColumn("sk", sampleKey)
      .withColumn("shard", shardOfSk(col("sk")))
      .withColumn("shard_rank", row_number().over(w))
    val packed = packTokensCol match {
      case Some(tc) => assigned
        .withColumn("__cum_tok", sum(col(tc)).over(w))
        // div, not /: SQL `/` on longs is double division and a budget
        // boundary could round across engines
        .withColumn("seq_id", expr(s"(__cum_tok - $tc) div $packBudget"))
        .drop("__cum_tok")
      case None => assigned
    }
    // payload columns ride THROUGH the window — joining them back later
    // would re-shuffle on doc_id and destroy the shard partitioning
    packed.select((Seq("shard", "shard_rank", "doc_id") ++
      packTokensCol.map(_ => "seq_id").toSeq ++ payload).map(col): _*)
  }

  /** Oracle-checked form: totally ordered for the deterministic compare. */
  def exportShuffle(s: SparkSession, d: String): DataFrame =
    exportAssignments(s, d).orderBy("shard", "shard_rank")

  /** The file-landing form: one directory per shard, rows inside each
    * file in permutation order. The window's hash exchange on `shard`
    * already co-locates each shard's rows sorted by rank, so the write
    * adds NO further exchange — only the local sortWithinPartitions
    * (a no-op on already-window-sorted data, kept as an explicit
    * contract), never the global sort of the oracle form.
    */
  def exportShuffledWrite(s: SparkSession, d: String, outDir: String): Unit =
    exportAssignments(s, d)
      .sortWithinPartitions(col("shard"), col("shard_rank"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** JSONL flavor of the export — the interchange format most training
    * stacks consume. Same plan (window's shard exchange only, local sort,
    * one dir per shard in permutation order); text rides along so the
    * output is self-contained training data, not just an assignment map.
    */
  def exportShuffledJsonl(s: SparkSession, d: String, outDir: String): Unit =
    exportAssignments(s, d, payload = Seq("text"))
      .sortWithinPartitions(col("shard"), col("shard_rank"))
      .write.mode("overwrite").partitionBy("shard").json(outDir)

  /** Token-budget corpus selection: keep the highest-quality documents
    * whose cumulative token count fits a fixed budget — the "fill a 1T-
    * token training budget from a 10T-token corpus, best first" pass.
    * A document is kept iff the running token total THROUGH it (in
    * quality order) is ≤ budget — the selection is a prefix of the
    * quality ranking by construction. See [[qualityPrefixSelect]] for the
    * quality key and the distributed running-sum machinery.
    */
  def tokenBudgetSelect(s: SparkSession, d: String, budget: Long = 20000L,
                        nBuckets: Int = 32): DataFrame =
    qualityPrefixSelect(t(s, d, "documents"), budget, nBuckets,
      groupCols = Nil)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy("doc_id")

  /** Per-source token-budget fill: [[tokenBudgetSelect]]'s quality-prefix
    * rule applied WITHIN each source under a per-source budget — the
    * combined mixing + budget pass ("fill the run's budget at the declared
    * source ratios, best documents first within each source"; production
    * derives per-source budgets from a weights table, the fixture uses one
    * constant so the oracle can replay it).
    */
  def budgetMix(s: SparkSession, d: String, perSourceBudget: Long = 1000L,
                nBuckets: Int = 8): DataFrame =
    budgetMixFor(t(s, d, "documents"), perSourceBudget, nBuckets)
      .orderBy("doc_id")

  /** [[budgetMix]] over any documents frame (needs doc_id, source, text,
    * n_chars) — sort-free: the pipeline consumes it into further stages,
    * where the fixture query's total order would be a wasted range
    * exchange.
    */
  private[graft] def budgetMixFor(docs: DataFrame, perSourceBudget: Long,
                                  nBuckets: Int): DataFrame =
    qualityPrefixSelect(docs, perSourceBudget, nBuckets,
      groupCols = Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"))

  /** Shared core of [[tokenBudgetSelect]] (groupCols = Nil) and
    * [[budgetMix]] (groupCols = Seq("source")) — one implementation so a
    * fix to the quality key or the prefix sum can never silently miss one
    * variant. Quality key = stopword micro-ratio (INTEGER: stop_cnt·1e6
    * div n_tokens — div, not /: float division's last bit could reorder a
    * rank boundary between engines; the shared
    * [[graft.ops.TextOps.StopWords]] list keeps the signal aligned with
    * the quality gate), descending, doc_id tie-break, running token sum
    * per group, rows with running total ≤ budget survive.
    *
    * Scale shape: the [[packTokens]] two-phase prefix sum, equi-depth-
    * bucketed on the NEGATED quality key — monotone, so buckets are
    * contiguous in quality order WITHIN EVERY GROUP (bucket depends only
    * on the key, equal keys share a bucket, so the doc_id tie-break stays
    * inside one window). Per-(group, bucket) totals are ≤ groups×nBuckets
    * driver rows → broadcast offsets → parallel windows keyed
    * (group, bucket): one hash exchange, never a global (or per-group
    * global) sort.
    */
  private def qualityPrefixSelect(docs0: DataFrame, budget: Long,
                                  nBuckets: Int,
                                  groupCols: Seq[String]): DataFrame = {
    val s = docs0.sparkSession
    val ws = split(trim(col("text")), "\\s+")
    val stopCnt = size(filter(ws,
      tk => tk.isin(graft.ops.TextOps.StopWords.map(x => x: Any): _*)))
    val docs = docs0
      .select(col("doc_id") +: groupCols.map(col) :+
        expr("greatest(n_chars div 4, 1)").as("tokens") :+
        stopCnt.cast("long").as("stop_cnt") :+
        size(ws).cast("long").as("n_ws"): _*)
      .withColumn("qm", expr("stop_cnt * 1000000 div n_ws"))
      .withColumn("q_neg", -col("qm"))
      .drop("stop_cnt", "n_ws")
    val bucketed = equiDepthBucketed(docs, nBuckets, keyCol = "q_neg")
    val keyCols = groupCols :+ "bucket"
    val totals = bucketed.groupBy(keyCols.map(col): _*)
      .agg(sum("tokens").as("tot")).collect()
    val offsetRows = totals
      .groupBy(r => groupCols.indices.map(r.get).toSeq).toSeq
      .flatMap { case (gvals, rows) =>
        val sorted = rows.sortBy(_.getAs[Int]("bucket"))
        sorted.zip(sorted.map(_.getAs[Long]("tot")).scanLeft(0L)(_ + _).init)
          // Seq[Any], NOT Seq(...): the inferred Seq[Long] would widen the
          // Int bucket to Long and break the IntegerType schema slot
          .map { case (r, off) => org.apache.spark.sql.Row.fromSeq(
            gvals ++ Seq[Any](r.getAs[Int]("bucket"), off)) }
      }
    val offSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(c => bucketed.schema(c)) ++ Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket_offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val offsetDf = s.createDataFrame(offsetRows.asJava, offSchema)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("q_neg"), col("doc_id"))
    bucketed.join(broadcast(offsetDf), keyCols)
      .withColumn("cum", col("bucket_offset") + sum("tokens").over(w))
      .filter(col("cum") <= budget)
      .withColumn("n_tokens", col("tokens"))
      .withColumn("cum_tokens", col("cum"))
  }

  /** Weighted sample size for [[prioritySample]]. */
  val PriorityK = 50

  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield, Lund & Thorup 2007): each doc draws priority w/u with u
    * uniform on its unit range, top-k win — heavy docs enter with
    * probability ∝ weight, yet any doc CAN win (the property plain
    * quota mixes lack). Integer rendering: u = 16-bit md5 fold of doc_id
    * + 1 (∈ [1, 65536] — the established cross-engine permutation),
    * weight = whitespace token count, score = w·65536 div u (truncating;
    * residual ties broken by doc_id, deterministic in both engines).
    *
    * Scale shape: per-row expressions + `orderBy.limit(k)` — Spark
    * compiles the global top-k to TakeOrderedAndProject (per-partition
    * heaps, never a full sort); the trailing rank window runs over the
    * k collected rows only (constant-bounded).
    */
  def prioritySample(s: SparkSession, d: String): DataFrame = {
    val u16 = (hexVal(substring(col("sk"), 1, 1)) * 4096
      + hexVal(substring(col("sk"), 2, 1)) * 256
      + hexVal(substring(col("sk"), 3, 1)) * 16
      + hexVal(substring(col("sk"), 4, 1)) + 1).cast("long")
    val scored = t(s, d, "documents")
      .withColumn("w", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("sk", sampleKey)
      .withColumn("u", u16)
      .withColumn("score_fp", expr("w * 65536L div u"))
      .select("doc_id", "w", "u", "score_fp")
    val top = scored.orderBy(col("score_fp").desc, col("doc_id")).limit(PriorityK)
    top.withColumn("sample_rank", row_number().over(
        Window.orderBy(col("score_fp").desc, col("doc_id"))).cast("int"))
      .select("sample_rank", "doc_id", "w", "u", "score_fp")
      .orderBy("sample_rank")
  }

  /** Total seat budget for [[proportionalSplit]]. */
  val ApportionN = 100L

  /** Exact proportional eval-set allocation by the LARGEST-REMAINDER
    * method (Hamilton apportionment): each language stratum gets
    * floor(N·n_i/n_tot) seats, and the N − Σfloor leftover seats go to
    * the largest remainders (ties by lang ascending) — the allocation
    * sums to EXACTLY N with no float rounding drift, the property
    * per-stratum fixed-k ([[stratifiedSample]]) and independent-hash
    * splits ([[splitAssign]]'s family) cannot give. Seats are then
    * filled by the engine-wide md5 permutation.
    *
    * Scale shape: stratum counts are one tiny agg; the remainder rank
    * windows over STRATA (language-bounded, not corpus-bounded); the
    * draw reuses the weightedMix trick — a CONSTANT rank bound (N) keeps
    * the WindowGroupLimit pushdown, the per-stratum `alloc` cut applies
    * on top via a broadcast join. A stratum thinner than its seat count
    * under-fills visibly (output rows < N), never silently re-allocates.
    */
  def proportionalSplit(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val strata = docs.groupBy("lang").agg(count(lit(1)).as("n_i"))
    val tot = strata.agg(sum("n_i").as("n_tot"))
    val base = strata.crossJoin(broadcast(tot))
      .withColumn("floor_q", expr(s"$ApportionN * n_i div n_tot"))
      .withColumn("rem", expr(s"($ApportionN * n_i) % n_tot"))
    val leftOver = base.agg((lit(ApportionN) - sum("floor_q")).as("extra"))
    val wr = Window.orderBy(col("rem").desc, col("lang").asc)
    val alloc = base.crossJoin(broadcast(leftOver))
      .withColumn("rrank", row_number().over(wr))
      .withColumn("alloc",
        col("floor_q") + when(col("rrank") <= col("extra"), 1L).otherwise(0L))
      .select("lang", "n_i", "alloc")
    val w = Window.partitionBy("lang").orderBy(col("sk"), col("doc_id"))
    docs.withColumn("sk", sampleKey)
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= ApportionN)
      .join(broadcast(alloc), Seq("lang"))
      .filter(col("pick_rank") <= col("alloc"))
      .select("lang", "n_i", "alloc", "doc_id", "pick_rank")
      .orderBy("lang", "pick_rank")
  }
}
