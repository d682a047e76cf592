package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Exact / MinHash-LSH / SimHash deduplication, n-gram Jaccard, document
  * fingerprinting, and the survivor/cluster compositions.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextDedupPart extends TextCorePart {

  /** Batch-local exact-dedup groups over any (doc_id, text) frame:
    * (text_hash, keep-lowest doc_id, duplicate count) — hash-groupBy, one
    * shuffle on the 256-bit digest, scales linearly. Shared by the batch
    * operator below and the streaming ingest bridge
    * ([[graft.streaming.StreamingOps.sinkDedupedLog]]) so both paths run
    * the SAME dedup expressions.
    */
  def dedupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(lower(trim(col("text"))), 256).as("text_hash"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_cnt"))

  /** Exact dedup on normalized text hash, keep-lowest-id. */
  def dedupExactText(s: SparkSession, d: String): DataFrame =
    dedupGroups(t(s, d, "documents"))
      .select("doc_id", "dup_cnt")
      .orderBy("doc_id")

  /** MinHash+LSH near-dup candidates: 3-word shingles → 16 minhash
    * signatures → 4 bands of 4 → self-join on (band, band_hash). Never
    * all-pairs: candidate generation is a hash-bucketed equi-join, exactly
    * the shape that survives 100 TB (band key partitions the shuffle).
    * No SQL oracle (hash-family specific); property-tested: exact
    * duplicates always collide in every band.
    */
  def dedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashCandidatePairs(s, d).orderBy("doc_a", "doc_b")

  /** Sort-free pair core: [[dedupMinhash]] adds the total order only for
    * the deterministic oracle compare; composition consumers
    * ([[dedupSurvivors]]'s component edges) must not pay a global range
    * sort the downstream hash joins ignore.
    */
  private[graft] def minhashCandidatePairs(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSignatures(withTokens(t(s, d, "documents")))
    // banded feeds three branches (hot-set agg + both self-join sides):
    // the oracle-input checkpoint materializes the signature pipeline
    // (explode + 16-way hash agg) ONCE to parquet — serving the same
    // compute-once role the former PlanCache persist did, while making
    // the band keys the SPLIT-GATE input: the keys are hash-family-
    // specific (rows-only), but the hot-bucket cap + band self-join +
    // canonical distinct downstream are deterministic and hash-gated
    // against the oracle's recomputation over these same rows.
    val banded = graft.OracleInputs.checkpoint(bandsOfSignatures(sigs),
      d, "minhash_banded")
    // Hot-bucket guard (same rationale as VectorOps.nearDupPairs): a band
    // hash shared by >cap docs (boilerplate, empty text) would expand
    // quadratically in the self-join; such content is exact-dedup's job.
    val hot = banded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("n")).filter(col("n") > MaxBucketSize)
      .select("band_idx", "band_hash")
    val pruned = banded.join(broadcast(hot), Seq("band_idx", "band_hash"), "left_anti")
    val a = pruned.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4
  val MaxBucketSize = 1024

  /** (doc_id, band_idx, band_hash) LSH band keys from a signature frame —
    * the ONE band construction, shared by the batch self-join above and
    * the persisted incremental index ([[IncrementalDedup]]) so an index
    * built today stays joinable against a batch banded tomorrow.
    */
  private[graft] def bandsOfSignatures(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        xxhash64((0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}")): _*)): _*))
        .as(Seq("band_idx", "band_hash")))

  /** Band keys straight from a (doc_id, text) frame. */
  private[graft] def bandsOfDocs(docs: DataFrame): DataFrame =
    bandsOfSignatures(minhashSignatures(
      docs.withColumn("tokens", tokensOf(col("text")))))

  /** doc_id + sig_0..sig_15 minhash signature columns from a `tokens` array.
    *
    * Shape: explode shingle positions → hash each shingle string ONCE →
    * groupBy(doc) with 16 `min(xxhash64(h, j))` aggregates. The k hash
    * functions are cheap long-rehashes of one base hash (same independence
    * properties, k× less string hashing), and the whole pipeline is
    * codegen'd row processing + hash aggregation — no interpreted
    * higher-order lambdas. Map-side partial aggregation means the shuffle
    * carries only docs×k partial minima, not the exploded shingles — the
    * property that keeps this linear at 100 TB.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val exploded = docs
      .filter(size(col("tokens")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("tokens")) - 3)).as("pos"),
        col("tokens"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", slice(col("tokens"), col("pos") + 1, lit(3))))
          .as("h"))
    exploded.groupBy("doc_id")
      .agg(
        min(xxhash64(col("h"), lit(0))).as("sig_0"),
        (1 until NumHashes).map(j =>
          min(xxhash64(col("h"), lit(j))).as(s"sig_$j")): _*)
  }

  /** 64-bit SimHash per doc via the native codegen expression
    * graft.functions.SimHash64 — one flat token loop per row. The previous
    * higher-order-fold formulation allocated two 64-element arrays per
    * token AND was recomputed wholesale by every downstream expression
    * that referenced the column after project collapse (banding it 8 ways
    * cost 8 full re-folds, ~228 s at sf0.1). FULLY oracle-gated: the
    * per-token hash is the upper 64 bits of MD5 (bit-identical in DuckDB),
    * so the oracle recomputes the entire sketch from raw text —
    * hex-nibble bit extraction, ±1 votes, signed bit-63 packing.
    */
  def simhash(s: SparkSession, d: String): DataFrame =
    simhashFrame(s, d).orderBy("doc_id")

  /** Unsorted (doc_id, simhash) frame — the pairing path consumes this so
    * the registered query's global ORDER BY isn't paid (and persisted) by
    * a plan that immediately re-shuffles on band keys anyway.
    */
  private def simhashFrame(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    withTokens(t(s, d, "documents"))
      .withColumn("simhash", expr("simhash64(tokens)"))
      .select("doc_id", "simhash")
  }

  /** SimHash near-dup pairs: the 64-bit simhash split into 8 byte-bands;
    * two docs within hamming distance ≤ 8·(bands-matching…) share at least
    * one full band by pigeonhole when distance < 8, so candidates come
    * from a band-keyed equi-join (same shape + hot-bucket guard as the
    * minhash path), confirmed by exact hamming distance on the full hash.
    * Exact-dup collision property-tested; oracle-gated via the split gate
    * (and the hash VALUES themselves are md5-derived — q_simhash checks
    * them end-to-end from raw text).
    */
  val SimhashBands = 8
  val SimhashMaxHamming = 7

  /** Registered query: PROBE-style (doc_id < 10 against the corpus, like
    * q_ngram_jaccard) — the synthetic fixture's shared vocabulary makes
    * most docs mutually similar, so an all-pairs report over it is
    * inherently quadratic in OUTPUT (444 pairs at 500 docs, ~50× that at
    * 5000); the probe shape keeps the band-join mechanics under a bounded
    * result. The all-pairs operator remains [[simhashPairs]] with its
    * hot-bucket cap for corpora where near-dup clusters are rare (the real
    * ones, after exact dedup).
    *
    * SPLIT ORACLE GATE: the (doc_id, simhash) frame is materialized
    * ([[graft.OracleInputs]]) and the oracle recomputes the ENTIRE
    * pairing from it — byte banding, the hot-bucket cap, the probe join,
    * the hamming confirm, all deterministic integer arithmetic. The hash
    * VALUES themselves are no longer trust-me: q_simhash's own oracle
    * recomputes them from raw text (md5 halves), so the two gates
    * together cover the whole path.
    */
  def simhashNearDup(s: SparkSession, d: String): DataFrame =
    simhashPairs(
      graft.OracleInputs.checkpoint(simhashFrame(s, d), d, "simhash_frame"),
      probe = Some(col("doc_id") < 10))

  /** Core over any (doc_id, simhash) frame. With `probe`, pairs are
    * (probe doc, any other corpus doc); without, all unordered pairs.
    */
  def simhashPairs(hashes: DataFrame,
                   maxHamming: Int = SimhashMaxHamming,
                   probe: Option[Column] = None): DataFrame = {
    val h = PlanCache.swap("simhash-hashes",
      hashes.select(col("doc_id"), col("simhash")))
    val banded = h.select(col("doc_id"),
      posexplode(array((0 until SimhashBands).map(b =>
        shiftrightunsigned(col("simhash"), b * 8).bitwiseAND(lit(0xFFL))): _*))
        .as(Seq("band_idx", "band_key")))
    val hot = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("n")).filter(col("n") > MaxBucketSize)
      .select("band_idx", "band_key")
    val pruned = banded.join(broadcast(hot), Seq("band_idx", "band_key"), "left_anti")
    val left = probe.fold(pruned)(p => broadcast(pruned.filter(p)))
    val cands = left.alias("a")
      .join(pruned.alias("b"), Seq("band_idx", "band_key"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .filter(if (probe.isDefined) col("doc_a") =!= col("doc_b")
              else col("doc_a") < col("doc_b"))
      .distinct()
    cands
      .join(h.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(h.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram (token-set) Jaccard similarity: small probe set broadcast
    * against the corpus, bucketed by lang — the block-join shape; top-3 by
    * exact int/int ratio.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = withTokens(t(s, d, "documents"))
      .withColumn("token_set", array_distinct(col("tokens")))
    val probes = docs.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("lang"), col("token_set").as("probe_set"))
    val corpus = docs.select(col("doc_id").as("other_id"), col("lang"),
      col("token_set").as("other_set"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("jacc").desc, col("other_id").asc)
    corpus.join(broadcast(probes), Seq("lang"))
      .filter(col("probe_id") =!= col("other_id"))
      .withColumn("jacc",
        size(array_intersect(col("probe_set"), col("other_set"))).cast("double")
          / size(array_union(col("probe_set"), col("other_set"))).cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("probe_id", "rnk", "other_id", "jacc")
      .orderBy("probe_id", "rnk")
  }

  /** Unicode NFC normalization over the corpus via the native codegen
    * `nfc_normalize` expression (graft.functions.NfcNormalize): composed
    * and decomposed renderings of the same text must dedup/fingerprint
    * identically. The fixture is ASCII, so every 5th document is enriched
    * with a decomposed suffix (" cafe" + combining acute U+0301) in BOTH
    * engines; NFC composes it to "café", shortening the string by one
    * character — the length delta plus an md5 of the normalized text
    * verifies the full normalized content against DuckDB's nfc_normalize.
    */
  def unicodeNfc(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("enriched",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" cafe\u0301"))).otherwise(col("text")))
      .withColumn("norm", expr("nfc_normalize(enriched)"))
      .select(col("doc_id"),
        length(col("enriched")).as("n_raw"),
        length(col("norm")).as("n_nfc"),
        md5(col("norm").cast("binary")).as("nfc_md5"))
      .orderBy("doc_id")
  }

  /** Polynomial rolling-hash fingerprint (base-31 mod 1e9+7) via the native
    * codegen expression graft.functions.RollingHash — a tight Java byte
    * loop inside whole-stage codegen instead of one interpreted lambda per
    * character (the HOF formulation it replaced).
    */
  def docFingerprint(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("fingerprint", expr("rolling_hash(text)"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }

  /** Recall of the MinHash-LSH candidate generator against the EXACT
    * Jaccard join at the same threshold over the same 3-token shingle
    * sets — the dedup-tuning measurement ([[graft.ops.VectorOps.annRecall]]'s
    * sibling for the text family): with 16 hashes in 4-row bands, a
    * J = 0.6 pair matches a band with p = 0.6⁴ ≈ 0.13, so expected
    * recall ≈ 1 − (1 − 0.13)⁴ ≈ 0.43 — the gate MEASURES the operating
    * point instead of asserting a number, and a banding change shows up
    * as a recall shift the tuning loop can read.
    *
    * Split gate: the engine materializes its (hash-family-specific)
    * candidate pairs; the oracle recomputes the exact truth side and
    * the intersection arithmetic. Gate `q_minhash_recall`.
    */
  def minhashRecall(s: SparkSession, d: String): DataFrame = {
    // both sides feed TWO consumers (their own count + the intersection)
    // — persist once or every branch re-runs the expensive pair DAGs
    // (the theta branch-reuse lesson: un-persisted, the 25× probe
    // measured ~3× the sum of the parts)
    val truth = PlanCache.swap(s"minhash-recall-truth-$d",
      SetJoinOps.jaccardPairs(SetJoinOps.docShingles(t(s, d, "documents")))
        .select("doc_a", "doc_b"))
    val cand = PlanCache.swap(s"minhash-recall-cand-$d",
      graft.OracleInputs.checkpoint(
        minhashCandidatePairs(s, d).select("doc_a", "doc_b").distinct(),
        d, "minhash_recall_cand"))
    // single pass over truth: LEFT join with a hit indicator counts the
    // truth set and the intersection together
    val flagged = truth.join(cand.withColumn("hit", lit(1L)),
      Seq("doc_a", "doc_b"), "left")
    flagged.agg(count(lit(1)).as("n_truth"),
        coalesce(sum("hit"), lit(0L)).as("n_hit"))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
      .select(col("n_truth"), col("n_candidates"), col("n_hit"),
        expr("CASE WHEN n_truth = 0 THEN 0L " +
          "ELSE n_hit * 1000000 div n_truth END").as("recall_ppm"))
  }

  /** One-call near-dup corpus dedup — the composition the pieces exist
    * for: [[dedupMinhash]] candidate pairs → transitive closure via
    * [[GraphOps.connectedComponents]] → keep each cluster's lowest doc_id.
    * Returns (doc_id, canonical_id, survives): every document mapped to
    * its duplicate-cluster canon. Rows-only (minhash family is
    * engine-specific); the exact-dup collapse guarantee and the
    * survivors-per-cluster invariant are property-tested.
    *
    * Scale shape inherits its parts: banded pair generation (hash-
    * bucketed, hot-bucket capped, consumed SORT-FREE — the oracle form's
    * total order would be a wasted range exchange here) and
    * O(log diameter) component rounds with per-round checkpoints —
    * nothing all-pairs, nothing single-partition.
    *
    * SPLIT ORACLE GATE: the pair set is materialized through
    * [[graft.OracleInputs.checkpoint]] (pairs stay rows-only — minhash is
    * engine-specific) and the components → cluster-min-canon derivation is
    * hash-gated against DuckDB's recursive-CTE closure over those SAME
    * rows.
    */
  def dedupSurvivors(s: SparkSession, d: String): DataFrame =
    GraphOps.survivorsOf(
      graft.OracleInputs.checkpoint(
        minhashCandidatePairs(s, d)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")),
        d, "text_pairs"),
      t(s, d, "documents").select(col("doc_id").as("id")),
      idName = "doc_id")

  /** Quality-aware dedup survivors: same minhash pairs → transitive
    * closure as [[dedupSurvivors]], but each cluster KEEPS ITS BEST
    * document (most tokens, doc_id tie-break) instead of its lowest id —
    * what a real corpus dedup pass actually wants (dropping the longer,
    * higher-quality copy because its id is larger throws away data). The
    * cluster partition structure is identical to dedupSurvivors by
    * construction (property-tested); only the representative choice
    * differs. Split gate: pairs are materialized (hash-family, rows-only)
    * and the closure + argmax-representative derivation is replayed by
    * the oracle over the same rows.
    *
    * Scale shape: CC is the O(log diameter) checkpointed rounds; the
    * quality join shuffles on id; the representative pick is one window
    * per cluster key. Nothing all-pairs, nothing driver-side.
    */
  def dedupBestOfCluster(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.OracleInputs.checkpoint(
      minhashCandidatePairs(s, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")),
      d, "text_pairs_best")
    val docs = t(s, d, "documents")
    val comps = GraphOps.connectedComponents(pairs,
      docs.select(col("doc_id").as("id")))
    val quality = withTokens(docs)
      .select(col("doc_id"), size(col("tokens")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("n_tokens").desc, col("id").asc)
    val reps = comps.join(quality, comps("id") === quality("doc_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("cluster_id"), col("id").as("canonical_id"))
    comps.join(reps, "cluster_id")
      .select(col("id").as("doc_id"), col("canonical_id"),
        (col("id") === col("canonical_id")).cast("int").as("survives"))
      .orderBy("doc_id")
  }
}
