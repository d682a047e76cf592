package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Training-data text operators over `documents` (SURVEY.md §2.5 north-star
  * table + the LLM-pipeline rubric): stats, quality scoring, language-ID,
  * exact dedup, MinHash/SimHash near-dup, n-gram Jaccard, fingerprinting,
  * binary metadata.
  *
  * Scale posture: everything is per-row expressions or hash-bucketed joins —
  * no all-pairs comparison anywhere. MinHash candidates come from a
  * band-keyed self-join (LSH), Jaccard probes broadcast a small probe set.
  * Ratios are computed as int/int double division (deterministic, no
  * rounding), never `round()` over noisy floats.
  */
object TextOps {

  /** THE tokenizer — the single definition every token consumer shares (a
    * second inline copy could silently diverge), with two modes behind one
    * expression:
    *  - default: the oracle-contract whitespace splitter (bit-identical to
    *    DuckDB's `string_split_regex(trim(text), '\s+')`);
    *  - `unicodeAware = true`: UAX#29 word boundaries via the native
    *    codegen `unicode_tokens` (graft.functions.UnicodeTokens) — the
    *    mode for corpora where space-splitting goes blind (CJK: the
    *    reference's own mart literals are Korean). On space-delimited
    *    letter/digit text the two modes agree exactly (parity law in
    *    OpsPropertySpec), so unicode mode is a refinement, not a fork.
    * Callers of unicode mode must have registered GraftFunctions on the
    * session.
    */
  private[graft] def tokensOf(c: Column, unicodeAware: Boolean = false): Column =
    if (unicodeAware) call_function("unicode_tokens", c)
    else split(trim(c), "\\s+")

  private def tokensExpr: Column = tokensOf(col("text"))

  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tokens", tokensExpr)

  /** Per-doc token/char counts. */
  def textStats(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents")).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(col("tokens")).as("n_tokens"),
      length(regexp_replace(col("text"), " ", "")).as("n_nonspace"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio + mean token length (int/int double
    * division — deterministic).
    */
  /** Canonical English stopword set — shared by quality scoring and the
    * cleaning pass so their ratios can never silently diverge (and by the
    * matching oracle SQL literals).
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "to", "and")

  private def stopCount(tokens: Column): Column =
    size(filter(tokens, tk => tk.isin(StopWords.map(x => x: Any): _*)))

  def qualityScore(s: SparkSession, d: String): DataFrame = {
    withTokens(t(s, d, "documents"))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("stop_cnt", stopCount(col("tokens")))
      .select(
        col("doc_id"), col("n_tokens"), col("stop_cnt"),
        (col("stop_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("stop_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast("double")
          / col("n_tokens").cast("double")).as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** Stopword-vote language-ID heuristic: per-language marker counts with an
    * argmax guess. (The fixture's text is a shared synthetic vocabulary, so
    * most docs resolve to the dominant list — the operator's structure is
    * what scales to a real lexicon.)
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    def score(name: String, words: Seq[String]): (String, DataFrame => DataFrame) =
      name -> ((df: DataFrame) => df.withColumn(name,
        size(filter(col("tokens"), tk => tk.isin(words.map(x => x: Any): _*)))))
    val scores = Seq(
      score("en_score", Seq("the", "a", "of", "and")),
      score("de_score", Seq("der", "die", "und", "das")),
      score("es_score", Seq("el", "la", "los", "que")),
      score("fr_score", Seq("le", "la", "les", "et")))
    val scored = scores.foldLeft(withTokens(t(s, d, "documents"))) {
      case (df, (_, f)) => f(df)
    }
    scored.select(
      col("doc_id"), col("lang"),
      col("en_score"), col("de_score"), col("es_score"), col("fr_score"),
      when(col("en_score") > greatest(col("de_score"), col("es_score"), col("fr_score")), "en")
        .when(col("de_score") > greatest(col("en_score"), col("es_score"), col("fr_score")), "de")
        .when(col("es_score") > greatest(col("en_score"), col("de_score"), col("fr_score")), "es")
        .when(col("fr_score") > greatest(col("en_score"), col("de_score"), col("es_score")), "fr")
        .otherwise("und").as("lang_guess"))
      .orderBy("doc_id")
  }

  /** Script-histogram language ID over the CJK-enriched corpus — the
    * first-pass signal [[langId]]'s stopword vote cannot produce: CJK text
    * has no spaces and no stopword list, but its Unicode script ranges
    * identify it in one per-row regex pass (the standard pre-filter shape
    * of production lang-ID). Counts are BMP codepoints per script (Han /
    * Hangul incl. jamo / kana / Latin letters), guess is the strict
    * argmax with ties → 'und'. Per-row expressions only — zero shuffle,
    * linear at any corpus size; oracle replays the counts with the same
    * character-class strips.
    */
  def langIdScript(s: SparkSession, d: String): DataFrame =
    langIdScriptFor(t(s, d, "documents").withColumn("enriched", cjkEnriched))

  /** [[langIdScript]] over any frame carrying (doc_id, enriched). */
  private[graft] def langIdScriptFor(docs: DataFrame): DataFrame = {
    // strip NON-members, count what remains: every range is single-unit
    // BMP, so Spark's UTF-16 length == DuckDB's codepoint length
    def cnt(ranges: String) =
      length(regexp_replace(col("enriched"), s"[^$ranges]", ""))
    val scored = docs
      .select(col("doc_id"),
        cnt("一-鿿").as("han_chars"),
        cnt("가-힯ᄀ-ᇿ㄰-㆏").as("hangul_chars"),
        cnt("぀-ヿ").as("kana_chars"),
        cnt("A-Za-z").as("latin_chars"))
    scored.select(
      col("doc_id"), col("han_chars"), col("hangul_chars"),
      col("kana_chars"), col("latin_chars"),
      when(col("han_chars") > greatest(col("hangul_chars"), col("kana_chars"), col("latin_chars")), "han")
        .when(col("hangul_chars") > greatest(col("han_chars"), col("kana_chars"), col("latin_chars")), "hangul")
        .when(col("kana_chars") > greatest(col("han_chars"), col("hangul_chars"), col("latin_chars")), "kana")
        .when(col("latin_chars") > greatest(col("han_chars"), col("hangul_chars"), col("kana_chars")), "latin")
        .otherwise("und").as("script_guess"))
      .orderBy("doc_id")
  }

  /** Tokens per crafted sentence for [[readability]]. */
  private[graft] val SentenceTokens = 12

  /** Readability statistics (LIX — Björnsson 1968, the arithmetic-only
    * readability index: words/sentence + 100·longwords/words — chosen
    * over Flesch precisely because it needs NO syllable model, so the
    * engine and the oracle land on identical integers). The fixture is a
    * flat token stream, so sentences come from a DETERMINISTIC crafted
    * view — every [[SentenceTokens]]-th inter-token space becomes a
    * period (one global regex, the [[graft.ops.WebTextOps.craftedLines]]
    * posture: the crafting is the fixture, the splitter + index math is
    * the product). Long words are tokens of ≥ 7 chars (the LIX
    * convention), counted on the ORIGINAL tokens. All ratios exact ppm.
    *
    * Scale shape: per-row expressions only — zero shuffle before the
    * output sort, linear at any corpus size. Gate `q_readability`.
    */
  def readability(s: SparkSession, d: String): DataFrame = {
    val crafted = concat(regexp_replace(trim(col("text")),
      s"(\\S+( \\S+){${SentenceTokens - 1}}) ", "$1. "), lit("."))
    withTokens(t(s, d, "documents"))
      .withColumn("n_words", size(col("tokens")).cast("long"))
      .withColumn("n_long", size(filter(col("tokens"),
        tk => length(tk) >= 7)).cast("long"))
      .withColumn("sent", crafted)
      .withColumn("n_sentences",
        (length(col("sent")) -
          length(regexp_replace(col("sent"), "\\.", ""))).cast("long"))
      .select(col("doc_id"), col("n_words"), col("n_long"),
        col("n_sentences"),
        expr("CAST(CASE WHEN n_sentences = 0 THEN 0 ELSE " +
          "n_words * 1000000 div n_sentences END AS BIGINT)")
          .as("wps_ppm"),
        expr("CAST(CASE WHEN n_words = 0 THEN 0 ELSE " +
          "n_long * 1000000 div n_words END AS BIGINT)").as("long_ppm"),
        expr("CAST(CASE WHEN n_sentences = 0 OR n_words = 0 THEN 0 ELSE " +
          "n_words * 1000000 div n_sentences + " +
          "n_long * 100000000 div n_words END AS BIGINT)").as("lix_ppm"))
      .orderBy("doc_id")
  }

  /** KWIC concordance term and context radius. */
  val KwicTerm = "spark"
  val KwicRadius = 2

  /** Keyword-in-context concordance — the corpus-inspection primitive
    * (every lexicographer's and data-quality reviewer's first query):
    * each occurrence of [[KwicTerm]] with its ±[[KwicRadius]]-token
    * context window, 1-based position. Slices clamp at the document
    * edges (an occurrence at position 1 has an empty left context —
    * emitted as '', not dropped).
    *
    * Scale shape: per-row posexplode + slice expressions, one match-row
    * output — no shuffle before the sort; the match volume is the
    * term's corpus frequency, never the token volume.
    * Gate `q_kwic`.
    */
  def kwicConcordance(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("doc_id"), col("tokens"),
        posexplode(col("tokens")).as(Seq("p0", "w")))
      .where(col("w") === KwicTerm)
      .withColumn("p", col("p0") + 1)
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        concat_ws(" ", slice(col("tokens"),
          greatest(col("p") - KwicRadius, lit(1)),
          col("p") - greatest(col("p") - KwicRadius, lit(1))))
          .as("left_ctx"),
        concat_ws(" ", slice(col("tokens"), col("p") + 1, lit(KwicRadius)))
          .as("right_ctx"))
      .orderBy("doc_id", "pos")

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

  /** Benchmark-contamination check: flag every document containing any
    * probe substring (eval-set leakage detection before training). Probes
    * here are fixture-derived 40-char snippets (production: the benchmark
    * suite's canonical strings). Scale shape: the probe set is tiny and
    * BROADCAST; the corpus side is one codegen `instr` scan per probe —
    * volume is nProbes × corpus with no shuffle of the corpus, the same
    * probe-style bound as knn/ngram. Self-hits guarantee nonempty output.
    */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val probes = docs
      .filter(col("doc_id") % 100 === 7 && length(col("text")) >= 60)
      .select(substring(col("text"), 10, 40).as("probe"))
    docs.join(broadcast(probes), instr(col("text"), col("probe")) > 0)
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
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

  /** BPE-ish token counting: word pieces + standalone punctuation via one
    * codegen'd regexp_count pass (the tokenizer-budget estimator of a
    * training-data pipeline).
    */
  def tokenCountBpe(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      regexp_count(col("text"), lit("\\w+|[^\\w\\s]")).as("n_bpeish"),
      regexp_count(col("text"), lit("[a-z]+")).as("n_word"),
      regexp_count(col("text"), lit("[^\\w\\s]")).as("n_punct"))
      .orderBy("doc_id")

  /** PII-style scrubbing (the corpus-redaction pass of a training-data
    * pipeline): count and mask email addresses and URLs with per-row
    * codegen'd regexp expressions — linear, shuffle-free. URLs are masked
    * BEFORE emails (an email pattern must never fire inside an
    * already-masked URL's remnants). The synthetic fixture has no PII, so
    * the query deterministically plants some on every 7th doc — identical
    * enrichment in the oracle SQL — making the redaction path actually
    * fire under the hash gate. Patterns stay within the regex subset Java
    * and RE2 interpret identically (no backrefs, no lookaround).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  def redactPii(s: SparkSession, d: String): DataFrame = {
    val enriched = t(s, d, "documents").withColumn("text2",
      when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" contact admin@example.com or https://example.com/data?id="),
          col("doc_id")))
        .otherwise(col("text")))
    enriched.select(
      col("doc_id"),
      regexp_count(col("text2"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text2"), lit(UrlRe)).as("n_urls"),
      regexp_replace(regexp_replace(col("text2"), UrlRe, "<URL>"),
        EmailRe, "<EMAIL>").as("redacted"))
      .orderBy("doc_id")
  }

  /** Salt for [[pseudonymizePii]] tokens. An engine constant like the
    * '[계획용] ' literal: the oracle replays it, a deployment rotates it.
    */
  val PseudoSalt = "graft-pseudo-v1:"

  /** Keyed deterministic pseudonymization — the privacy pass that beats
    * [[redactPii]]'s blanket `<EMAIL>` mask when downstream work needs
    * JOIN-ABILITY: every email is replaced by a stable surrogate
    * `<EMAIL_xxxxxxxxxx>` (first 10 hex chars of md5(salt‖lower(email))),
    * so the same address maps to the same token across every document and
    * table (linkage survives) while the raw value leaves the corpus.
    * GDPR calls exactly this pseudonymization: reversible only via the
    * salt, which lives outside the data.
    *
    * Mechanics: distinct matches per row, sorted LENGTH-DESC (then
    * lexicographic) via a 3-digit `999-len` prefix key, then one
    * `aggregate` fold of plain `replace`s — per-row expressions only,
    * zero shuffle. Length-desc makes the fold nesting-safe: when one
    * address is a substring of another (`ops1@x.com` ⊂ `xops1@x.com`),
    * the longer rewrites first, and a surrogate contains no `@`, so no
    * replacement can corrupt a pending match or create a fresh one. The
    * key transform is identical in the oracle, so the fold order — and
    * therefore every byte of output — matches cross-engine even for
    * degenerate inputs (a >999-char "address" merely loses the
    * length-desc reading, not the determinism).
    */
  private[graft] def pseudonymizeFor(docs: DataFrame): DataFrame = {
    def tokOf(m: Column): Column = concat(lit("<EMAIL_"),
      substring(md5(concat(lit(PseudoSalt), lower(m)).cast("binary")), 1, 10),
      lit(">"))
    docs
      .withColumn("ms", transform(
        array_sort(transform(
          array_distinct(regexp_extract_all(col("text2"), lit(EmailRe), lit(0))),
          m => concat(lpad((lit(999) - length(m)).cast("string"), 3, "0"), m))),
        k => substring(k, 4, Int.MaxValue)))
      .select(
        col("doc_id"),
        size(col("ms")).cast("bigint").as("n_pii"),
        regexp_count(col("text2"), lit(EmailRe)).as("n_matches"),
        aggregate(col("ms"), col("text2"),
          (acc, m) => replace(acc, m, tokOf(m))).as("pseudo_text"),
        array_join(transform(col("ms"), tokOf _), " ").as("tokens_cat"))
  }

  /** Registry gate: the fixture has no PII, so every 7th doc plants two
    * RECURRING addresses (`user<id%23>@…`, `ops<id%5>@…` — 23 and 5 force
    * cross-document repeats, exercising the stability that distinguishes
    * pseudonymization from masking). Identical enrichment in the oracle.
    */
  def pseudonymizePii(s: SparkSession, d: String): DataFrame =
    pseudonymizeFor(t(s, d, "documents").withColumn("text2",
      when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" contact user"), (col("doc_id") % 23).cast("string"),
          lit("@example.com or ops"), (col("doc_id") % 5).cast("string"),
          lit("@corp.org for access")))
        .otherwise(col("text"))))
      .orderBy("doc_id")

  /** Fixed-window document chunking with stride — the training-data prep
    * op that turns documents into model-sized pieces. Chunk starts are a
    * per-row `sequence` (0, stride, 2·stride, …) exploded into one row per
    * chunk; the chunk itself is a `slice` of the token array. Per-row
    * codegen'd expressions only — no shuffle until the final order.
    */
  val ChunkTokens = 32
  val ChunkStride = 24
  def docChunks(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("doc_id"), col("tokens"),
        posexplode(sequence(lit(0), size(col("tokens")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        slice(col("tokens"), col("start") + 1, lit(ChunkTokens)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")

  /** Composed corpus-cleaning pass (the C4-style filter chain): keep docs
    * that are (a) the keep-lowest-id survivor of exact dedup, (b) long
    * enough, (c) inside a stopword-ratio band (too low = not prose, too
    * high = boilerplate). One scan computes the per-row stats; the dedup
    * survivors arrive via a semi-join on the normalized-text hash group
    * minimum — filters and join both scale linearly.
    */
  /** The STATELESS per-row quality stats + gate — one definition shared
    * by the batch cleaning pass and the streaming ingest filter, so the
    * two paths can never silently drift (same rationale as StopWords).
    * Stats land under reserved `__gate_*` names so an arbitrary ingest
    * schema (which may legitimately carry `tokens`/`n_tokens` columns)
    * is never silently overwritten.
    */
  private[graft] def qualityGateStats(docs: DataFrame): DataFrame = {
    require(!docs.columns.exists(_.startsWith("__gate_")),
      "__gate_* column names are reserved by the quality gate")
    docs
      .withColumn("__gate_tokens", tokensExpr)
      .withColumn("__gate_n_tokens", size(col("__gate_tokens")))
      .withColumn("__gate_stop_ratio",
        stopCount(col("__gate_tokens")).cast("double")
          / col("__gate_n_tokens").cast("double"))
  }

  private[graft] def qualityGate: Column =
    col("__gate_n_tokens") >= 20 &&
      col("__gate_stop_ratio") >= 0.05 && col("__gate_stop_ratio") <= 0.6

  private[graft] val GateCols = Seq("__gate_tokens", "__gate_n_tokens",
    "__gate_stop_ratio")

  def corpusClean(s: SparkSession, d: String): DataFrame = {
    val survivors = t(s, d, "documents")
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    qualityGateStats(t(s, d, "documents"))
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(qualityGate)
      .select(col("doc_id"), col("lang"),
        col("__gate_n_tokens").as("n_tokens"),
        col("__gate_stop_ratio").as("stop_ratio"))
      .orderBy("doc_id")
  }

  /** [[corpusClean]]'s survivor set over any documents frame, with the
    * document PAYLOAD carried forward (the corpus-assembly pipeline's
    * first stage hands text/source/n_chars to every later stage — the
    * fixture query keeps its stats-only projection). Same two rules, one
    * definition of each: exact-dup keep-lowest on sha256(lower(trim)),
    * then the shared [[qualityGate]].
    */
  private[graft] def corpusCleanSurvivors(docs: DataFrame): DataFrame = {
    val survivors = docs
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    cleanGated(docs, survivors)
  }

  /** Delta-clean for an APPEND-ONLY batch against a persisted hash set
    * (every batch id exceeds every known id — the caller's contract):
    * a batch doc survives exact dedup iff its hash is absent from
    * `knownHashes` (a prior doc would be the keep-lowest winner) AND it is
    * the min id for its hash within the batch; then the same quality gate.
    * Equals [[corpusCleanSurvivors]] over the union, restricted to batch
    * ids (the base side's verdicts can't change — new ids are larger).
    */
  private[graft] def corpusCleanSurvivorsAgainst(batch: DataFrame,
                                                 knownHashes: DataFrame): DataFrame = {
    val survivors = batch
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .join(knownHashes.select("h"), Seq("h"), "left_anti")
      .select("doc_id")
    cleanGated(batch, survivors)
  }

  private def cleanGated(docs: DataFrame, survivors: DataFrame): DataFrame =
    qualityGateStats(docs)
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(qualityGate)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("__gate_n_tokens").as("n_tokens"))

  /** Corpus vocabulary: top-5 terms per language by frequency — explode →
    * two-level aggregation (map-side combined) → per-group top-k window.
    * The shuffle is keyed by (lang, token); no collect, no global sort.
    */
  def topTermsPerLang(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("token").asc)
    withTokens(t(s, d, "documents"))
      .select(col("lang"), explode(col("tokens")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("lang", "rnk", "token", "cnt")
      .orderBy("lang", "rnk")
  }

  /** Per-document mean corpus-frequency signal — the integer core of a
    * CCNet-style rarity filter: documents whose tokens are mostly
    * corpus-rare (low `freq_sum / n_tokens`) are gibberish/boilerplate
    * candidates; mostly corpus-common means natural running text. Emitted
    * as the exact integer pair (numerator `freq_sum` = Σ over token
    * occurrences of that token's corpus count, denominator `n_tokens`)
    * per the int/int determinism contract — the consumer picks the ratio.
    *
    * Scale shape: explode → per-(doc, token) count with map-side combine
    * (the only token-volume shuffle), corpus frequencies as a second agg
    * over the same frame, joined back WITHOUT a broadcast hint — corpus
    * vocabulary is unbounded (urls/typos), so AQE chooses broadcast vs
    * token-keyed shuffle join at runtime. Final agg is doc-keyed. Nothing
    * driver-side, nothing all-pairs.
    */
  def meanTokenFreq(s: SparkSession, d: String): DataFrame = {
    val tf = withTokens(t(s, d, "documents"))
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("token").agg(sum("tf").as("cf"))
    tf.join(cf, "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("cf")).as("freq_sum"))
      .orderBy("doc_id")
  }

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
    val doc = knScoreAgainst(pw, c2)
    val totals = doc.agg(sum("kn_fp").as("tot"), count(lit(1)).as("n"))
    doc.crossJoin(broadcast(totals))
      .withColumn("keep",
        (col("kn_fp") * col("n") >= col("tot")).cast("int"))
      .select("doc_id", "n_trans", "kn_fp", "keep")
      .orderBy("doc_id")
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
    val doc = knScoreAgainst(lmTransitions(docsT), c2)
    val totals = doc.agg(sum("kn_fp").as("tot"), count(lit(1)).as("n"))
    doc.crossJoin(broadcast(totals))
      .withColumn("keep",
        (col("kn_fp") * col("n") >= col("tot")).cast("int"))
      .select("doc_id", "n_trans", "kn_fp", "keep")
      .orderBy("doc_id")
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
      .withColumn("p_cont", expr(s"($KnScale * coalesce(n1m, 0L)) div nb"))
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

  /** THREE-rater agreement matrix — the fixture's declared language,
    * [[langId]]'s stopword vote, and the stored-NB prediction
    * ([[graft.ops.DomainOps.langIdNbClassify]]'s model) — the
    * labeling-QA cross-tab: per (declared, vote, nb) cell the count and
    * its share of the declared language's documents in exact ppm. The
    * full-agreement diagonal's share IS the per-language consensus
    * accuracy; a cell where the two raters agree AGAINST the declared
    * label is the label-error signal a cleanup queue drains. One
    * doc-keyed join + a K³-cell aggregate (K = languages).
    * Gate `q_langid_agreement`.
    */
  def langIdAgreement(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.DomainOps.langLabeled(s, d)
    graft.ops.DomainOps.buildDomainClassifier(docs, "graft_lang_agree")
    val nb = graft.ops.DomainOps.scoreAgainst(docs, s, "graft_lang_agree")
      .select(col("doc_id"), col("pred_source").as("nb_guess"))
    val cells = langId(s, d).select("doc_id", "lang", "lang_guess")
      .join(nb, "doc_id")
      .groupBy("lang", "lang_guess", "nb_guess").agg(count(lit(1)).as("n"))
    val tot = cells.groupBy("lang").agg(sum("n").as("n_lang"))
    cells.join(tot, "lang")
      .select(col("lang"), col("lang_guess"), col("nb_guess"), col("n"),
        expr("n * 1000000 div n_lang").as("share_ppm"))
      .orderBy("lang", "lang_guess", "nb_guess")
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

  /** Per-document drop provenance for the [[corpusClean]] gates — WHY a
    * document fell, not just that it fell (the audit a data owner asks
    * for first): first-failing-gate precedence duplicate → too_short →
    * low_stopwords → high_stopwords, 'kept' otherwise. Same gate
    * definitions as [[corpusClean]] (one definition each — the reasons
    * CANNOT drift from the filter because they read the same columns).
    *
    * Scale shape: the dedup survivors hash-groupBy + one per-row gate
    * evaluation — corpusClean's own cost plus nothing.
    * Gate `q_drop_reasons`.
    */
  def dropReasons(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val survivors = docs
      .groupBy(sha2(lower(trim(col("text"))), 256).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1).as("is_survivor"))
    qualityGateStats(docs)
      .join(survivors, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_survivor").isNull, "duplicate")
          .when(col("__gate_n_tokens") < 20, "too_short")
          .when(col("__gate_stop_ratio") < 0.05, "low_stopwords")
          .when(col("__gate_stop_ratio") > 0.6, "high_stopwords")
          .otherwise("kept").as("reason"))
      .withColumn("kept", (col("reason") === "kept").cast("int"))
      .select("doc_id", "kept", "reason")
      .orderBy("doc_id")
  }

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
    val pinned = PlanCache.swap("iso_bins", bins)
    val segs = pinned.select(col("bin").as("a"))
      .join(pinned.select(col("bin").as("b")), col("a") <= col("b"))
      .join(pinned.select(col("bin"), col("n"), col("n_pos")),
        col("bin").between(col("a"), col("b")))
      .groupBy("a", "b")
      .agg(sum("n").as("scnt"), sum("n_pos").as("spos"))
      .withColumn("rate_key", expr(
        "CAST(spos AS DECIMAL(38,0)) * 1000000000000000000 div scnt"))
    val inner = segs
      .join(pinned.select(col("bin").as("i")),
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

  /** Vocabulary-health stats per source: token occurrences, distinct
    * types, hapax legomena (frequency-1 types), type-token ratio and
    * hapax share in exact ppm — the corpus diagnostics that catch a
    * broken tokenizer (TTR collapses) or boilerplate floods (hapax
    * share collapses) before they poison training.
    *
    * Scale shape: ONE (source, token) count aggregation (map-side
    * combined — the corpus's only shuffle), then a source-keyed rollup
    * of the vocab-sized frame. Gate `q_vocab_stats`.
    */
  /** Per-language SOURCE CONCENTRATION — Herfindahl-Hirschman index and
    * its Simpson-diversity complement (1 − HHI), the data-mixing
    * diagnostic that says whether one provenance dominates a language
    * slice (the risk signal before [[graft.ops.SamplingOps]]'
    * re-balancing: HHI → 1 means a monoculture no temperature mix can
    * fix). Exact: HHI_ppm = Σ cnt²·10⁶ div n² — integer sums first,
    * ONE floor at the end, so both engines land on the same integer; the
    * n² product holds in DECIMAL(38) to 10¹⁸ docs per slice.
    *
    * Scale shape: one (lang, source) count aggregation (map-side
    * combined) — the only fact-volume pass; the rollup runs over the
    * provenance-bounded cell frame. Gate `q_source_concentration`.
    */
  def sourceConcentration(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
      .groupBy("lang")
      .agg(sum("cnt").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).as("s2"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        expr("CAST(s2 * 1000000 div (CAST(n_docs AS DECIMAL(38,0)) " +
          "* n_docs) AS BIGINT)").as("hhi_ppm"),
        expr("CAST(1000000 - s2 * 1000000 div " +
          "(CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
          .as("simpson_ppm"))
      .orderBy("lang")

  /** Distinct-3-gram NOVELTY of the odd-doc slice against the even-doc
    * reference — the self-BLEU-flavored memorization/novelty screen a
    * generation pipeline runs between a candidate corpus and its
    * training reference (novelty → 0 means the candidate re-treads the
    * reference's surface forms): |grams(cand) \ grams(ref)| over
    * |grams(cand)|, on the dedup family's 3-token shingles.
    *
    * Scale shape: gram explode + per-slice DISTINCT (one hash shuffle
    * on the gram), one gram-keyed anti join — the decontamination
    * shape, linear, never all-pairs. Gate `q_ngram_novelty`.
    */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = graft.ops.SetJoinOps.docShingles(t(s, d, "documents"))
    // both slices feed two consumers each — persist or the gram
    // distinct recomputes per branch (the theta branch-reuse lesson)
    val ref = PlanCache.swap("novelty_ref",
      grams.where(col("doc_id") % 2 === 0).select("sh").distinct())
    val cand = PlanCache.swap("novelty_cand",
      grams.where(col("doc_id") % 2 === 1).select("sh").distinct())
    val novel = cand.join(ref, Seq("sh"), "left_anti")
      .agg(count(lit(1)).as("n_novel"))
    val nr = ref.agg(count(lit(1)).as("n_grams_ref"))
    val nc = cand.agg(count(lit(1)).as("n_grams_cand"))
    novel.crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .select(col("n_grams_ref"), col("n_grams_cand"), col("n_novel"),
        expr("CAST(CASE WHEN n_grams_cand = 0 THEN 0 ELSE " +
          "n_novel * 1000000 div n_grams_cand END AS BIGINT)")
          .as("novelty_ppm"))
  }

  /** SKIP-GRAM co-occurrence pairs (window ±2, the word2vec context
    * shape) — the training-pair export for embedding models and the
    * collocation surface wider than [[collocations]]' adjacent bigrams:
    * per ordered (center, context) pair within 2 positions, the corpus
    * count; top-100 by (count desc, pair) — a total order, so the
    * LIMIT cut is deterministic.
    *
    * Scale shape: pair generation is a PER-ROW zip_with expression
    * (offsets +1/+2 against the token array — no posexplode self-join,
    * zero shuffle before the count agg); one (w, c) count aggregation
    * (map-side combined), then the fixed top-k. Symmetric counts come
    * from unioning the swapped frame, not a second pass over text.
    * Gate `q_skipgram_pairs`.
    */
  def skipgramPairs(s: SparkSession, d: String): DataFrame = {
    def off(k: Int) =
      s"""CASE WHEN size(tokens) > $k THEN
         |  zip_with(slice(tokens, 1, size(tokens) - $k),
         |           slice(tokens, 1 + $k, size(tokens) - $k),
         |           (a, b) -> named_struct('w', a, 'c', b))
         |ELSE array() END""".stripMargin
    val fwd = withTokens(t(s, d, "documents"))
      .select(explode(expr(s"concat(${off(1)}, ${off(2)})")).as("p"))
      .select(col("p.w").as("w"), col("p.c").as("c"))
    fwd.unionAll(fwd.select(col("c").as("w"), col("w").as("c")))
      .groupBy("w", "c").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"), col("c"))
      .limit(100)
  }

  /** ZIPF DECAY PROFILE per source — token-frequency mass per rank
    * DOUBLING bucket (bucket b holds type ranks [2^b, 2^{b+1})): under
    * an ideal Zipf 1/r law every doubling bucket carries equal token
    * mass, so `decay_ppm` (next bucket's mass over this one's, exact
    * ppm) sits near 10⁶ — a collapsed tail (boilerplate floods) or a
    * missing head (tokenizer shattering) bends it far off. The bucket
    * index is exact integer arithmetic (binary-digit count of the
    * rank), never a floating log.
    *
    * Scale shape: one (source, token) count aggregation — the corpus's
    * only shuffle; the rank window and the bucket rollup run on the
    * VOCABULARY-sized frame, and the lead window on the ~log₂|V| bucket
    * frame. Gate `q_zipf_profile`.
    */
  def zipfProfile(s: SparkSession, d: String): DataFrame = {
    val freq = withTokens(t(s, d, "documents"))
      .select(col("source"), explode(col("tokens")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val ranked = freq.withColumn("rnk", row_number().over(
      Window.partitionBy("source").orderBy(col("c").desc, col("tok"))))
    val buckets = ranked
      .withColumn("bucket", (length(conv(col("rnk"), 10, 2)) - 1).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_types"), sum("c").as("bucket_tokens"))
    val w2 = Window.partitionBy("source").orderBy("bucket")
    buckets.withColumn("nxt", lead("bucket_tokens", 1).over(w2))
      .select(col("source"), col("bucket"), col("n_types"),
        col("bucket_tokens"),
        coalesce(
          expr("CAST(nxt AS DECIMAL(38,0)) * 1000000 div bucket_tokens"),
          lit(-1L)).as("decay_ppm"))
      .orderBy("source", "bucket")
  }

  /** QUANTILE ALIGNMENT table of document length across sources — the
    * exact per-source percentile grid (p = 0..100, value at within-
    * source rank ceil(p·n_s/100), rank-1 at p = 0) next to the global
    * grid and their difference: the lookup table quantile NORMALIZATION
    * applies (map a value through its source percentile onto the global
    * quantile function — the batch-effect corrector) and the drift
    * diagnostic that catches one source's length distribution walking
    * away from the corpus.
    *
    * Scale shape: histograms only — one (source, n_chars) count agg
    * (map-side combined), prefix windows over HISTOGRAM frames, and the
    * percentile lookup as an AS-OF union+window per source (cells + 101
    * rows per partition; the q_asof_last_click posture) — never a
    * per-document rank, never a histogram×grid nested-loop join.
    * Gate `q_quantile_align`.
    */
  def quantileAlign(s: SparkSession, d: String): DataFrame =
    quantileAlignFromHist(histOfDocs(t(s, d, "documents")))

  /** The (source, n_chars, c) length histogram — [[quantileAlign]]'s
    * whole state, and ADDITIVE, which is what makes the stored/
    * incremental variant exactly-once for free.
    */
  private[graft] def histOfDocs(docs: DataFrame): DataFrame =
    docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))

  /** [[quantileAlign]] over an explicit histogram (split out so the
    * stored delta-grown histogram serves the same computation).
    */
  private[graft] def quantileAlignFromHist(histRaw: DataFrame): DataFrame = {
    // zero cells arise only from a forget fold that exactly cancelled a
    // cell; they carry no mass but would tie two cells on the same
    // cumulative rank key, making the as-of pick order-dependent
    val histIn = histRaw.where(col("c") > 0)
    def pctValues(hist0: DataFrame): DataFrame = {
      val hist = hist0
        .withColumn("hi", sum("c").over(Window.partitionBy("source")
          .orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("lo", col("hi") - col("c") + 1)
      val grid = hist0.groupBy("source").agg(sum("c").as("n_s"))
        .select(col("source"), col("n_s"),
          explode(expr("sequence(0, 100)")).as("pct"))
        .select(col("source"), col("pct"),
          expr("greatest(1L, (pct * n_s + 99) div 100)").as("k"))
      val cells = hist.select(col("source"), col("lo").as("k"),
        lit(0).as("isg"), col("n_chars").as("v"),
        lit(null).cast("int").as("pct"))
      val probes = grid.select(col("source"), col("k"), lit(1).as("isg"),
        lit(null).cast("long").as("v"), col("pct").cast("int").as("pct"))
      cells.unionByName(probes)
        .withColumn("value", last("v", ignoreNulls = true).over(
          Window.partitionBy("source").orderBy(col("k"), col("isg"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .where(col("isg") === 1)
        .select(col("source"), col("pct"), col("value"))
    }
    val src = pctValues(histIn)
    val glob = pctValues(histIn.groupBy("n_chars").agg(sum("c").as("c"))
        .withColumn("source", lit("__all__")))
      .select(col("pct"), col("value").as("global_value"))
    src.join(broadcast(glob), Seq("pct"))
      .select(col("source"), col("pct"), col("value").as("src_value"),
        col("global_value"),
        (col("value") - col("global_value")).as("shift"))
      .orderBy("source", "pct")
  }

  /** Stored table of the quantile-alignment histogram family. */
  val QaHistTable = "qa_hist"

  /** Delta-model descriptor: the length histogram is a pure additive
    * count model, so [[graft.pipeline.DeltaModelIngest]]'s exactly-once
    * machinery applies verbatim.
    */
  def qaFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, QaHistTable,
      Seq("source", "n_chars"), Seq("c"))

  /** Full rebuild of the stored histogram (the cron re-anchor). */
  def buildQaModel(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    import graft.pipeline.DeltaModelIngest
    val prev = DeltaModelIngest.prepareRebuild(s, qaFamily(db))
    graft.store.Warehouse.saveModel(histOfDocs(docs), db, QaHistTable)
    DeltaModelIngest.finishRebuild(s, qaFamily(db), prev)
  }

  /** foreachBatch adapter: exactly-once histogram growth — one
    * (source, epoch)-named overwrite delta per batch.
    */
  def qaDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) => graft.pipeline.DeltaModelIngest.append(
      batch.sparkSession, qaFamily(db), srcTag, epochId,
      histOfDocs(batch))

  /** Serve the alignment from the STORED (possibly delta-grown)
    * histogram — no corpus aggregation in the query path.
    */
  def quantileAlignFromStore(s: SparkSession, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    import graft.pipeline.DeltaModelIngest
    val hist =
      if (DeltaModelIngest.hasDeltas(s, qaFamily(db)))
        PlanCache.swap(s"qa-delta-eff-$db",
          DeltaModelIngest.effectiveCounts(s, qaFamily(db)))
      else s.table(s"`$db`.`$QaHistTable`")
    // forget folds may cancel cells to zero (filtered downstream) but
    // must NEVER drive one negative — that means a deletion of rows
    // never ingested, and serving from it would silently misalign
    val mn = hist.agg(min("c")).head()
    require(mn.isNullAt(0) || mn.getLong(0) >= 0L,
      "quantileAlignFromStore: negative histogram cell — a forget fold " +
        "deleted rows the store never ingested; rebuild from the corpus")
    quantileAlignFromHist(hist)
  }

  /** RIGHT-TO-BE-FORGOTTEN fold — the deletion dual of
    * [[quantileAlignIncrement]]: the histogram family is ADDITIVE, so a
    * departing slice folds in as a NEGATIVE delta through the same
    * exactly-once machinery (redelivered deletion batches land
    * identical bytes — no double-forget), and the served alignment
    * equals a from-scratch build WITHOUT the deleted documents (the
    * oracle). Exactly-zero cells are filtered at serve; a cell driven
    * NEGATIVE refuses loudly ([[quantileAlignFromStore]]) — deleting
    * never-ingested rows is corruption, not maintenance. The
    * data-governance posture every stored count model at 100 TB needs:
    * retrain-scale cost for a delete would make compliance a full
    * rebuild; the additive fold makes it one delta.
    * Gate `q_quantile_align_forget`.
    */
  def quantileAlignForget(s: SparkSession, d: String): DataFrame = {
    val db = "graft_qa_fgt_q"
    buildQaModel(t(s, d, "documents"), db)
    val departing = histOfDocs(
        graft.ops.IncrementalClusters.batchDocsRange(s, d))
      .select(col("source"), col("n_chars"), (-col("c")).as("c"))
    graft.pipeline.DeltaModelIngest.append(s, qaFamily(db), "forget", 0L,
      departing)
    quantileAlignFromStore(s, db)
  }

  /** Maintenance-invariant gate: build the stored histogram on the
    * front ⅔ of the corpus, fold the back ⅓ as an exactly-once delta,
    * serve — the oracle is the FRESH full-corpus alignment, so a green
    * row proves streamed state ≡ a from-scratch build (the
    * q_link_graph_incremental posture, histogram family).
    * Gate `q_quantile_align_incremental`.
    */
  def quantileAlignIncrement(s: SparkSession, d: String): DataFrame = {
    val db = "graft_qa_inc_q"
    buildQaModel(IncrementalClusters.corpusDocsRange(s, d), db)
    graft.pipeline.DeltaModelIngest.append(s, qaFamily(db), "gate", 0L,
      histOfDocs(IncrementalClusters.batchDocsRange(s, d)))
    quantileAlignFromStore(s, db)
  }

  /** SOURCE SIMILARITY matrix — pairwise 3-gram Jaccard between the
    * sources' DISTINCT shingle sets (the corpus-mixing diagnostic one
    * level above document dedup: two provenances with high gram overlap
    * are near-redundant slices, and a mixing plan that weights both is
    * double-counting a distribution). Exact: intersection via one
    * gram-keyed self-pairing, |A∪B| = |A|+|B|−|A∩B|.
    *
    * Scale shape: gram explode + per-source DISTINCT (one hash shuffle
    * on the gram — the decontamination class); the pair fan-out per
    * gram is C(k,2) with k ≤ |sources| (provenance-bounded, never
    * corpus-bounded); per-source set sizes are one agg.
    * Gate `q_source_similarity`.
    */
  def sourceSimilarity(s: SparkSession, d: String): DataFrame = {
    val grams = graft.ops.SetJoinOps.docShingles(t(s, d, "documents"))
      .join(t(s, d, "documents").select("doc_id", "source"), "doc_id")
      .select(col("source"), col("sh")).distinct()
      .persist()
    try {
      val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = grams.select(col("source").as("sa"), col("sh"))
        .join(grams.select(col("source").as("sb"), col("sh")), "sh")
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
        .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          col("n_inter"),
          expr("n_inter * 1000000L div (na + nb - n_inter)")
            .as("jaccard_ppm"))
        .orderBy("sa", "sb")
      out.localCheckpoint(eager = true)
    } finally grams.unpersist()
  }



  /** VOCABULARY COVERAGE CURVE — the share of token OCCURRENCES covered
    * by the top-N most frequent types for N ∈ {100, 1000, 10000}: the
    * vocab-sizing table (how big must a tokenizer's vocabulary be
    * before the OOV tail stops mattering) next to [[zipfProfile]]'s
    * decay shape. Exact ppm; rank ties broken by token so the cutoff
    * is a total order both engines replay.
    *
    * Scale shape: one token count aggregation (the corpus's only
    * shuffle); each cutoff is a TakeOrderedAndProject top-N over the
    * vocabulary frame (per-partition heaps — the heavy-ngrams posture;
    * a global rank WINDOW here would be an Exchange SinglePartition
    * over the whole vocabulary, and measured 6.2× at the 25× probe
    * before this rewrite), then a ≤N-row sum. Gate `q_vocab_coverage`.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val freq = PlanCache.swap(s"vocab-coverage-freq-$d",
      withTokens(t(s, d, "documents"))
        .select(explode(col("tokens")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    val tot = freq.agg(sum("c").as("total"), count(lit(1)).as("n_types"))
    Seq(100, 1000, 10000).map { n =>
      freq.orderBy(col("c").desc, col("w")).limit(n)
        .agg(coalesce(sum("c"), lit(0L)).as("covered"))
        .crossJoin(broadcast(tot))
        .select(lit(n.toLong).as("top_n"), col("n_types"), col("total"),
          col("covered"),
          expr("CAST(covered AS DECIMAL(38,0)) * 1000000 div total")
            .as("coverage_ppm"))
    }.reduce(_ unionByName _).orderBy("top_n")
  }

  /** OUT-OF-VOCABULARY RATE of the batch slice against the training
    * slice's vocabulary — the retrain-the-tokenizer signal (an OOV
    * climb means the incoming distribution is outrunning the stored
    * vocab; [[ngramNovelty]] asks the DISTINCT-surface question, this
    * the occurrence-weighted one): front ⅔ of the corpus trains the
    * vocabulary, back ⅓ is the batch; per batch source, the OOV token
    * occurrences and exact ppm.
    *
    * Scale shape: one distinct over the training tokens (vocab-sized
    * output), one (source, token) count aggregation on the batch, one
    * token-keyed anti-flagging join — the decontamination class.
    * Gate `q_oov_rate`.
    */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val vocab = withTokens(
        graft.ops.IncrementalClusters.corpusDocsRange(s, d))
      .select(explode(col("tokens")).as("w")).distinct()
    val batch = withTokens(
        graft.ops.IncrementalClusters.batchDocsRange(s, d))
      .select(col("source"), explode(col("tokens")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    batch.join(vocab.withColumn("known", lit(1)), Seq("w"), "left")
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("known").isNull, col("c")).otherwise(0L))
          .as("n_oov"),
        sum(when(col("known").isNull, 1L).otherwise(0L))
          .as("n_oov_types"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        col("n_oov_types"),
        expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
      .orderBy("source")
  }

  def vocabStats(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("source"), explode(col("tokens")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("source")

  /** Masking period for [[maskSpans]] (≈ 15% of positions, the BERT
    * recipe's rate, rendered deterministic).
    */
  val MaskEvery = 7L

  /** Deterministic MLM-style token masking — the training-data export
    * for a masked-language objective: token at 1-based position p of
    * document d is replaced by `[MASK]` when (d·31 + p) mod
    * [[MaskEvery]] = 0 (a per-document phase shift, so masks don't
    * align in a column across documents the way a bare `p mod 7` would).
    * Emits the masked text plus the mask count; zero-token documents
    * pass through with empty output.
    *
    * Scale shape: per-row transform inside one projection — no shuffle
    * before the output sort. Gate `q_mask_spans`.
    */
  def maskSpans(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        // size-0 guard: Spark's sequence(1, 0) is a DESCENDING [1, 0],
        // not empty — an empty doc must short-circuit
        expr(s"""CASE WHEN size(tokens) = 0 THEN ''
          | ELSE array_join(zip_with(tokens,
          | sequence(1, size(tokens)),
          | (tk, p) -> CASE WHEN (doc_id * 31 + p) % $MaskEvery = 0
          |            THEN '[MASK]' ELSE tk END), ' ') END"""
          .stripMargin.replace("\n", " ")).as("masked_text"),
        expr(s"""CASE WHEN size(tokens) = 0 THEN 0L
          | ELSE aggregate(sequence(1, size(tokens)), 0L,
          | (acc, p) -> acc + CASE WHEN (doc_id * 31 + p) % $MaskEvery = 0
          |             THEN 1L ELSE 0L END) END"""
          .stripMargin.replace("\n", " ")).as("n_masked"))
      .orderBy("doc_id")

  /** Span-coverage dedup signal (Lee et al. 2021, the substring-level
    * complement of the repeated-spans miner): for each document, how many
    * of its tokens sit inside at least one n-gram that ALSO appears in
    * another document. Repeated-spans mines the corpus-wide spans; this
    * scores each document's exposure to them and keeps documents under
    * 20% coverage — integer cross-multiplied (covered×5 < n_tokens), so
    * the whole signal is exact-integer and the oracle replays it.
    *
    * Scale shape: grams explode n× the token stream; the duplicated-gram
    * set reduces through a per-doc DISTINCT before the gram-keyed count
    * (hot grams contribute one row per doc, not per occurrence); the
    * coverage union is an explode + doc-keyed distinct — everything
    * linear, no self-joins, no position×span quadratics.
    */
  def spanCoverage(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    val nt = docsT.select(col("doc_id"),
      size(col("tokens")).cast("long").as("n_tokens"))
    val st = docsT.filter(size(col("tokens")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(tokens) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(tokens, i, $n)) AS g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.pos").as("pos"), col("sg.g").as("g"))
    val dup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val cov = st.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val covc = cov.groupBy("doc_id")
      .agg(count(lit(1)).as("covered_tokens"))
    nt.join(covc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)) * 5 < col("n_tokens"))
          .cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Marker token spliced in where a repeated extent was cut out by
    * [[substringDedup]] (U+241F SYMBOL FOR UNIT SEPARATOR): keeps the two
    * fragment edges from forming NEW n-gram adjacencies across the cut, so
    * the no-surviving-repeat guarantee is exact, and makes the fragment
    * boundaries recoverable downstream.
    */
  val SpanCutMarker = "␟"

  /** Exact substring-extent dedup — the OUTPUT-CORPUS operator of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"): [[repeatedSpans]]/[[spanCoverage]] only SCORE repeated
    * grams; this operator EXCISES every maximal corpus-repeated extent
    * and rewrites the text. Construction:
    *
    *  1. seed: every n-gram start whose gram appears in >= 2 documents
    *     (the [[spanCoverage]] duplicated-gram set — per-doc DISTINCT
    *     before the count, so hot grams cost one row per doc);
    *  2. extension: seeds n-1 apart or closer overlap, so the union of
    *     their [pos, pos+n-1] token intervals merges chained duplicated
    *     grams into MAXIMAL extents — computed relationally: a covered
    *     flag per token position, run starts via a doc-keyed `lag`;
    *  3. cut: covered runs are replaced by a single [[SpanCutMarker]]
    *     token, survivors re-joined with single spaces.
    *
    * Exactness (the property OpsPropertySpec asserts): a surviving n-gram
    * of real tokens is n consecutive uncovered source positions; were it
    * corpus-duplicated, its own start seed would have covered them —
    * contradiction. Grams spanning a cut contain the marker and cannot
    * equal any source gram. So NO n-token corpus-repeated span survives
    * anywhere in the output corpus.
    *
    * Scale shape: one gram-keyed token-volume shuffle (the dup count —
    * same as [[spanCoverage]]), then everything rides ONE doc_id
    * partitioning: the position frame shuffles on doc_id for the lag
    * window and the final group reuses that exchange (window partition
    * key = groupBy key). No self-joins, no position×span quadratics, no
    * driver collection.
    */
  def substringDedupFor(docs: DataFrame, n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(docs)
    val st = gramStarts(docsT, n)
    val dup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    substringExcise(docsT, st, dup, n)
  }

  /** (doc_id, pos, g): every n-gram start of every document (1-based). */
  private def gramStarts(docsT: DataFrame, n: Int): DataFrame =
    docsT.filter(size(col("tokens")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(tokens) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(tokens, i, $n)) AS g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.pos").as("pos"), col("sg.g").as("g"))

  /** The excision tail shared by the batch and incremental forms: cover
    * every position under a duplicated gram start, merge runs via the
    * doc-keyed lag window, cut and re-join.
    */
  private def substringExcise(docsT: DataFrame, st: DataFrame,
                              dup: DataFrame, n: Int): DataFrame = {
    val pos = docsT.select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val cov = st.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val marked = pos
      .join(cov.withColumn("covered", lit(true)), Seq("doc_id", "p"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(false)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    marked
      .withColumn("new_span", (col("covered") &&
        !coalesce(lag(col("covered"), 1).over(w), lit(false))).cast("int"))
      .withColumn("out_tok",
        when(col("new_span") === 1, lit(SpanCutMarker))
          .when(!col("covered"), col("tok")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("covered").cast("long")).as("n_removed"),
        sum(col("new_span").cast("long")).as("n_spans"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN out_tok IS NOT NULL THEN struct(p, out_tok) END))," +
            " x -> x.out_tok)")).as("text_clean"))
      .orderBy("doc_id")
  }

  def substringDedup(s: SparkSession, d: String): DataFrame =
    substringDedupFor(t(s, d, "documents"))

  /** The Lee et al. 2021 pipeline ORDER as one query: exact-dedup +
    * heuristic quality first ([[corpusClean]]), THEN excise corpus-
    * repeated extents from the kept documents — the duplicated-gram set
    * is computed over the CLEANED corpus (excising against pre-clean
    * grams would cut spans whose other occurrence was already dropped).
    */
  def corpusCleanSpans(s: SparkSession, d: String): DataFrame = {
    val kept = corpusClean(s, d).select("doc_id")
    substringDedupFor(
      t(s, d, "documents").join(kept, Seq("doc_id"), "left_semi"))
  }

  /** Name of the persisted duplicated-gram state ([[buildGramIndex]]). */
  val GramIndexDb = "graft_gram_index"
  val GramIndexTable = "gram_index"

  /** Persist the corpus's per-doc-DISTINCT gram profile, bucketed by the
    * probe key so batch probes read it in place (the band-index posture —
    * one gram-keyed shuffle paid at build, never per batch). The probe
    * only needs existence, so appends stay append-only (no count merge).
    *
    * `hashGrams`: store `xxhash64(g)` instead of the gram STRING — fixed
    * 8 bytes per gram at a 2⁻⁶⁴-per-pair false-duplicate budget (a
    * collision excises one innocent span — the same accepted-FP class as
    * the bloom blocklist, and absorbed by the scheduled rebuild).
    * MEASURED shrink on the fixture: 1.23× (PerfProbe `gramindex`) — the
    * fixture's ~100-word vocabulary lets parquet dictionary-compress the
    * strings; on natural text the distinct-gram dictionary explodes and
    * the raw ~30-byte strings converge to their entropy, where the fixed
    * 8-byte key wins harder. The in-memory probe/join side always pays
    * string width, so the hashed key also caps the probe shuffle row
    * width regardless of on-disk compression. The STRING mode stays the
    * default and the gate path: exact, and the oracle replays strings.
    * Both modes are spec-proved verdict-identical on the fixture.
    */
  def buildGramIndex(corpus: DataFrame, db: String = GramIndexDb,
                     table: String = GramIndexTable,
                     n: Int = SpanNgram,
                     hashGrams: Boolean = false): Unit = {
    val grams = gramProfile(corpus, n, hashGrams)
    val buckets = IncrementalDedup.adaptiveIndexBuckets(grams.count())
    graft.store.Warehouse.saveBucketed(grams, db, table,
      Seq(gramKeyCol(hashGrams)), buckets)
  }

  private def gramKeyCol(hashGrams: Boolean): String =
    if (hashGrams) "gh" else "g"

  private def gramProfile(docs: DataFrame, n: Int,
                          hashGrams: Boolean): DataFrame = {
    val base = gramStarts(withTokens(docs), n)
      .select("doc_id", "g").distinct()
    (if (hashGrams) base.select(col("doc_id"), xxhash64(col("g")).as("gh"))
     else base)
      .groupBy(gramKeyCol(hashGrams))
      .agg(count(lit(1)).as("nd"))
  }

  /** Fold a processed batch's grams into the index (bucket spec
    * preserved — the [[IncrementalDedup.appendBands]] contract, including
    * its at-least-once caveat: replays grow the index without changing
    * any verdict, existence being the only probe semantic). The stored
    * key column (g vs gh) tells the mode — appends can never mix them.
    */
  def appendToGramIndex(batch: DataFrame, db: String = GramIndexDb,
                        table: String = GramIndexTable,
                        n: Int = SpanNgram): Unit = {
    val s = batch.sparkSession
    val hashed = !s.table(s"`$db`.`$table`").columns.contains("g")
    val grams = gramProfile(batch, n, hashed)
    val key = gramKeyCol(hashed)
    grams.write.mode("append").format("parquet")
      .bucketBy(IncrementalDedup.currentIndexBuckets(s, db, table), key)
      .sortBy(key)
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Sharded gram index — the hash-slice law the band index and every
    * ANN family carry, for corpora past the single index's bucket cap
    * (~3×10¹⁰ grams at the shared [[IncrementalDedup.adaptiveIndexBuckets]]
    * ceiling): shard s holds the grams with `pmod(xxhash64(key), S) = s`,
    * each with its own adaptive bucket spec. Existence probes query ALL
    * shards and union the hits — EXACT (a gram lives in exactly one
    * shard), unlike sharded IVF where per-shard training costs recall.
    */
  def buildShardedGramIndex(corpus: DataFrame, nShards: Int,
                            db: String = GramIndexDb,
                            table: String = GramIndexTable,
                            n: Int = SpanNgram,
                            hashGrams: Boolean = false): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    val grams = gramProfile(corpus, n, hashGrams)
    val key = gramKeyCol(hashGrams)
    (0 until nShards).foreach { sh =>
      val slice = grams.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
      val buckets = IncrementalDedup.adaptiveIndexBuckets(slice.count())
      graft.store.Warehouse.saveBucketed(slice, db, s"${table}_$sh",
        Seq(key), buckets)
    }
  }

  /** Excise a batch against a SHARDED gram index: probe every shard (the
    * batch's distinct grams are routed by the same pmod(xxhash64) law, so
    * each shard join is slice-sized), union the existence hits. At S=1
    * the result is bit-equal to [[substringDedupAgainst]] over the single
    * index — the sharded-family standard, spec-asserted.
    */
  def substringDedupAgainstSharded(batch: DataFrame, s: SparkSession,
                                   nShards: Int,
                                   db: String = GramIndexDb,
                                   table: String = GramIndexTable,
                                   n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(batch)
    val st = gramStarts(docsT, n)
    val batchDup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val hashed = !s.table(s"`$db`.`${table}_0`").columns.contains("g")
    val key = gramKeyCol(hashed)
    val probeKeys =
      (if (hashed) st.select(col("g"), xxhash64(col("g")).as("gh"))
       else st.select(col("g"))).distinct()
    val hits = (0 until nShards).map { sh =>
      probeKeys.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
        .join(s.table(s"`$db`.`${table}_$sh`").select(key), Seq(key),
          "left_semi")
        .select("g")
    }.reduce(_.union(_))
    substringExcise(docsT, st, batchDup.union(hits).distinct(), n)
  }

  /** Fold a batch's grams into a sharded index: each gram routes to its
    * hash slice (membership can never drift — the same pmod law the
    * builder used), appends preserving per-shard bucket specs.
    */
  def appendToShardedGramIndex(batch: DataFrame, s: SparkSession,
                               nShards: Int,
                               db: String = GramIndexDb,
                               table: String = GramIndexTable,
                               n: Int = SpanNgram): Unit = {
    val hashed = !s.table(s"`$db`.`${table}_0`").columns.contains("g")
    val grams = gramProfile(batch, n, hashed).localCheckpoint()
    val key = gramKeyCol(hashed)
    (0 until nShards).foreach { sh =>
      val slice = grams.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
      slice.write.mode("append").format("parquet")
        .bucketBy(IncrementalDedup.currentIndexBuckets(s, db, s"${table}_$sh"),
          key)
        .sortBy(key)
        .saveAsTable(s"`$db`.`${table}_$sh`")
    }
  }

  /** Excise a BATCH against the persisted corpus gram profile: a batch
    * gram is duplicated when the corpus already holds it (the batch doc
    * is the second occurrence) or >= 2 batch docs share it — exactly the
    * union corpus's duplicated-gram rule restricted to batch rows, so
    * the output is BIT-EQUAL to a fresh [[substringDedupFor]] over the
    * union filtered to the batch (the gate's invariant). Already-emitted
    * corpus output is append-only (a batch can make a corpus gram
    * retroactively duplicated — the scheduled rebuild re-anchors, the
    * standing incremental contract).
    *
    * Scale shape: the corpus is never re-grammed — the probe semi-joins
    * the batch's distinct grams against the bucketed index (batch-side
    * shuffle only); everything else is batch-sized.
    */
  private[graft] def substringDedupAgainst(batch: DataFrame,
                                           gramIndex: DataFrame,
                                           n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(batch)
    val st = gramStarts(docsT, n)
    val batchDup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    // probe key follows the index mode: gram string (exact, the gate
    // path) or xxhash64 (the 100 TB state-compaction mode)
    val corpusHit =
      if (gramIndex.columns.contains("g"))
        st.select("g").distinct()
          .join(gramIndex.select("g"), Seq("g"), "left_semi")
      else
        st.select(col("g"), xxhash64(col("g")).as("gh")).distinct()
          .join(gramIndex.select("gh"), Seq("gh"), "left_semi")
          .select("g")
    substringExcise(docsT, st, batchDup.union(corpusHit).distinct(), n)
  }

  /** Registry gate (append-only id split, the [[graft.ops.IncrementalClusters]]
    * fixture convention): build the gram index on the ingested corpus,
    * excise the batch against it. The oracle replays the FRESH union
    * operator filtered to batch rows — a green row proves the
    * incremental path's bit-equality invariant.
    */
  def substringDedupIncrement(s: SparkSession, d: String): DataFrame = {
    val corpus = IncrementalClusters.corpusDocsRange(s, d)
    val batch = IncrementalClusters.batchDocsRange(s, d)
    buildGramIndex(corpus)
    substringDedupAgainst(batch,
      s.table(s"`$GramIndexDb`.`$GramIndexTable`"))
  }

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

  /** Multimodal plumbing: opaque binary payload + typed metadata extraction
    * (byte length + content digest). The decode step for real image/audio
    * bytes is the stubbed path in graft.ops.MultimodalOps; this query proves
    * the binary-column schema + expression plumbing end-to-end.
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("content_hash"))
      .orderBy("doc_id")

  /** Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    * "repetitious text" filters, integer-count form): token/bigram
    * distinct ratios plus the most frequent token's occurrence count. All
    * outputs are integer counts — no float ratio can drift between
    * engines; the downstream filter rule is the integer cross-multiplied
    * comparison `2 * duplicate_bigram_slots > n_bigrams`.
    *
    * Scale shape: strictly per-row expressions — documents never shuffle,
    * no explode, no groupBy. The most-frequent-token count folds over the
    * SORTED token array tracking the longest equal-run, so the whole
    * signal set is one projection over the scan at any corpus size.
    */
  def repetitionStatsFor(docs: DataFrame): DataFrame =
    withTokens(docs)
      .withColumn("bigrams", expr(
        """CASE WHEN size(tokens) < 2 THEN slice(tokens, 1, 0)
          |     ELSE transform(sequence(0, size(tokens) - 2),
          |                    i -> concat(tokens[i], ' ', tokens[i + 1]))
          |END""".stripMargin))
      .withColumn("top_token_count", expr(
        """aggregate(array_sort(tokens),
          |          named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          |          (acc, x) -> named_struct(
          |              'prev', x,
          |              'run',  IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),
          |              'best', GREATEST(acc.best,
          |                        IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))),
          |          acc -> acc.best)""".stripMargin))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        size(array_distinct(col("tokens"))).as("n_distinct_tokens"),
        size(col("bigrams")).as("n_bigrams"),
        size(array_distinct(col("bigrams"))).as("n_distinct_bigrams"),
        col("top_token_count"),
        ((size(col("bigrams")) - size(array_distinct(col("bigrams")))) * 2
          > size(col("bigrams"))).cast("int").as("repetitive"))

  def repetitionStats(s: SparkSession, d: String): DataFrame =
    repetitionStatsFor(t(s, d, "documents")).orderBy("doc_id")

  /** Benchmark decontamination by token n-gram overlap (the GPT-3 appendix
    * C recipe: drop any training document sharing an n-gram with the eval
    * set; n scaled to the fixture's short documents). Substring
    * containment ([[contamination]]) catches verbatim inclusions; n-gram
    * overlap also catches re-wrapped or partially copied text.
    *
    * Scale shape: the eval side collapses to a DISTINCT broadcast n-gram
    * set; the corpus explodes to one row per distinct n-gram and hash-joins
    * the broadcast set — no corpus-side shuffle before the final map-side-
    * combined count on doc_id. Corpus volume is linear in token count;
    * nothing is all-pairs. Gram generation is the native codegen
    * `word_ngrams` (graft.functions.WordNgrams) — the HOF chain it
    * replaced paid one interpreted lambda per window (~5 s of the sf0.1
    * sweep; the same per-element-lambda lesson as simhash64/vec_dot).
    */
  def decontaminateNgram(s: SparkSession, d: String, n: Int = 3): DataFrame =
    decontaminateNgramFor(t(s, d, "documents"), n)

  private[graft] def decontaminateNgramFor(raw: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(raw.sparkSession)
    val docs = raw.withColumn("grams",
      call_function("word_ngrams", col("text"), lit(n)))
    val evalGrams = docs.filter(col("doc_id") % 100 === 7)
      .select(explode(col("grams")).as("g")).distinct()
    docs.filter(col("doc_id") % 100 =!= 7)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
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

  /** Unicode-aware token counting over a CJK-enriched corpus — the
    * [[tokensOf]] unicode mode under the oracle gate. Every 3rd document
    * gains a deterministic mixed-script suffix: two space-delimited Hangul
    * words, then '세계' fused directly to a doc_id-sized Han ideograph run
    * fused to an ASCII 'tail' — ONE whitespace token that UAX#29 word
    * boundaries split at each script transition. The whitespace count goes
    * blind on exactly that token (+2 vs +4); the oracle reconstructs the
    * expected token list arithmetically from the same enrichment (the
    * fixture text is pure lowercase/space, where the modes agree — checked
    * by the parity law) and hashes the full joined token stream, so the
    * gate covers token CONTENT, not just counts.
    */
  /** The deterministic mixed-script enrichment shared by every CJK-gated
    * query (a second inline copy could silently drift from the oracles'
    * arithmetic reconstruction): every 3rd doc gains two space-delimited
    * Hangul words, the second fused directly to a doc_id-sized Han
    * ideograph run fused to an ASCII tail — ONE whitespace token, four
    * UAX#29 word tokens.
    *
    * FIXTURE PRECONDITION (asserted by the "cjk fixture shape" spec): the
    * oracles reconstruct the UNICODE token list from a whitespace split of
    * the base text, which is exact only while base text is non-empty
    * lowercase `[a-z0-9 ]` — on such text the two modes agree token for
    * token (the parity law). The unicode-token legs are additionally
    * normalized on the oracle side (empty strings filtered from the split,
    * matching unicode_tokens' no-empty-token contract) so an empty or
    * whitespace-only doc cannot silently diverge; the WHITESPACE-count leg
    * (q_token_count_cjk.n_space_tokens) still assumes the precondition —
    * that is what the fixture-shape assertion pins.
    */
  private def cjkEnriched: Column =
    when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" 안녕 세계"),
        expr("repeat('中', CAST(doc_id % 4 + 1 AS INT))"), lit("tail")))
      .otherwise(col("text"))

  def tokenCountCjk(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("enriched", cjkEnriched)
      .withColumn("toks", tokensOf(col("enriched"), unicodeAware = true))
      .select(col("doc_id"),
        size(col("toks")).as("n_unicode_tokens"),
        size(tokensOf(col("enriched"))).as("n_space_tokens"),
        md5(concat_ws(" ", col("toks")).cast("binary")).as("tokens_md5"))
      .orderBy("doc_id")
  }

  /** [[topTermsPerLang]] with the unicode tokenizer over the CJK-enriched
    * corpus — the composition gate: the UAX#29 mode feeding the standard
    * explode → two-level agg → windowed top-k vocabulary shape. The CJK
    * tokens participate in ranking like any others (the whitespace mode
    * would fuse '세계中…中tail' into per-doc-unique tokens and never rank
    * them); the oracle reconstructs the token lists arithmetically and
    * recomputes the same aggregation.
    */
  def topTermsCjk(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("token").asc)
    t(s, d, "documents")
      .withColumn("enriched", cjkEnriched)
      .select(col("lang"),
        explode(tokensOf(col("enriched"), unicodeAware = true)).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("lang", "rnk", "token", "cnt")
      .orderBy("lang", "rnk")
  }

  /** [[salientTermsPerSource]] with the unicode tokenizer over the
    * CJK-enriched corpus — whitespace tokenization goes blind on CJK text
    * for exactly the signals TF-IDF exists for: the fused '세계中…中tail'
    * run would be a per-doc-unique token (tf 1, df 1) instead of its
    * constituent terms. Same two-level agg + WindowGroupLimit shape; the
    * oracle reconstructs the token lists arithmetically and replays the
    * integer TF-IDF.
    */
  def salientTermsCjk(s: SparkSession, d: String,
                      nSourcesHint: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("score").desc, col("token").asc)
    val tokenCounts = t(s, d, "documents")
      .withColumn("enriched", cjkEnriched)
      .select(col("source"),
        explode(tokensOf(col("enriched"), unicodeAware = true)).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
    // same lazy-plan hint contract as salientTermsPerSource (PlanAudit)
    val nSources = nSourcesHint.getOrElse(
      t(s, d, "documents").select("source").distinct().count())
    val docFreq = tokenCounts.groupBy("token").agg(count(lit(1)).as("df"))
    tokenCounts.join(docFreq, "token")
      .withColumn("score", expr(s"tf * ${nSources}L div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("source", "rnk", "token", "tf", "df", "score")
      .orderBy("source", "rnk")
  }

  /** [[decontaminateNgram]] with the unicode tokenizer over the
    * CJK-enriched corpus: an eval-set n-gram whose terms are CJK segments
    * is invisible to the whitespace gram stream (the fused run never
    * splits), so decontamination would silently pass contaminated CJK
    * documents. The gram stream stays on the CODEGEN `word_ngrams` by
    * re-joining the unicode tokens with single spaces first — tokens are
    * space-free segments, so word_ngrams over the re-joined stream IS the
    * n-gram set over unicode tokens, with no interpreted lambda per
    * window.
    */
  def decontaminateCjk(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val docs = t(s, d, "documents")
    cjkFlagged(docs, docs, n).orderBy("doc_id")
  }

  /** CJK-aware contamination core over explicit frames: eval n-grams from
    * `all` (the benchmark set lives in the FULL corpus — `doc_id % 100 =
    * 7`), corpus grams from `corpus` (the pipeline passes its deduped
    * survivor slice; the fixture query passes the whole table). Returns
    * (doc_id, n_shared) for corpus docs sharing ≥ 1 gram with the eval
    * set. Same plan shape as before the split: broadcast eval grams,
    * corpus-side explode, map-side-combined count.
    */
  private def cjkGrams(df: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("grams",
      call_function("word_ngrams",
        concat_ws(" ", tokensOf(cjkEnriched, unicodeAware = true)), lit(n)))
  }

  /** Distinct CJK-aware n-grams of `all`'s EVAL docs (doc_id % 100 = 7) —
    * what the decontamination blocklist stores/appends incrementally.
    */
  private[graft] def cjkEvalGrams(all: DataFrame, n: Int = 3): DataFrame =
    cjkGrams(all, n).filter(col("doc_id") % 100 === 7)
      .select(explode(col("grams")).as("g")).distinct()

  /** Non-eval `corpus` docs sharing ≥1 gram with the GIVEN (broadcast)
    * gram set — the probe half of [[cjkFlagged]], reusable against a
    * persisted or delta gram set.
    */
  private[graft] def cjkFlaggedAgainst(evalGrams: DataFrame, corpus: DataFrame,
                                       n: Int = 3): DataFrame =
    cjkGrams(corpus, n).filter(col("doc_id") % 100 =!= 7)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))

  private[graft] def cjkFlagged(all: DataFrame, corpus: DataFrame,
                                n: Int = 3): DataFrame =
    cjkFlaggedAgainst(cjkEvalGrams(all, n), corpus, n)

  /** Corpus-internal repeated spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", at n-gram granularity):
    * the n-word spans shared by at least `minDocs` DISTINCT documents —
    * the signal behind substring-level dedup, and the corpus-internal
    * complement of [[decontaminateNgram]]'s cross-set overlap. word_ngrams
    * emits each doc's distinct grams, so the count per gram IS its
    * containing-document count.
    *
    * Scale shape: codegen gram expansion → ONE map-side-combined count on
    * the gram key (the only token-volume shuffle) → threshold filter →
    * bounded top-k (rank by count then gram; global limit over the tiny
    * filtered set). Linear in corpus token volume; nothing all-pairs.
    */
  val SpanNgram = 5
  val SpanMinDocs = 2
  val SpanTopK = 50
  def repeatedSpans(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("grams",
        call_function("word_ngrams", col("text"), lit(SpanNgram)))
      .select(explode(col("grams")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= SpanMinDocs)
      .orderBy(col("n_docs").desc, col("gram").asc)
      .limit(SpanTopK)
  }

  /** Document length distribution — the curation histogram every corpus
    * report starts with: docs bucketed by token count (fixed integer
    * width), rows per bucket plus exact token totals. One scan, one
    * map-side-combined aggregation on a handful of bucket keys.
    */
  val LenBucketWidth = 16
  def lengthHistogram(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(expr(s"CAST(size(tokens) DIV $LenBucketWidth AS BIGINT)")
        .as("bucket"), size(col("tokens")).as("n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n").cast("bigint")).as("token_sum"),
        min("n").as("min_tokens"), max("n").as("max_tokens"))
      .orderBy("bucket")

  /** The surviving corpus after [[decontaminateNgram]]: eval docs and any
    * doc overlapping them are removed (broadcast anti-join on doc_id).
    */
  def decontaminatedCorpus(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val flagged = decontaminateNgram(s, d, n).select("doc_id")
    t(s, d, "documents")
      .filter(col("doc_id") % 100 =!= 7)
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
  }

  /** Dataset card: the per-source summary table a corpus release ships —
    * doc/language/token/char totals, mean tokens (×100 fixed point),
    * intra-source exact-dup count (docs minus distinct normalized text
    * hashes — the [[dedupGroups]] normalization, so the card can never
    * disagree with the dedup operator about what "duplicate" means) and
    * the exact per-million corpus share. ONE source-keyed aggregate pass
    * (dup counting rides it as a distinct-count) + a 1-row broadcast
    * total. Gate `q_dataset_card`.
    */
  def datasetCard(s: SparkSession, d: String): DataFrame =
    cardOver(t(s, d, "documents")).orderBy("source")

  /** The card over any documents-shaped frame — shared by the corpus
    * gate, the drift comparison's two snapshots and the stored lifecycle,
    * so every consumer agrees on what the summary IS.
    */
  private[graft] def cardOver(docs0: DataFrame): DataFrame = {
    val docs = withTokens(docs0)
      .select(col("source"), col("lang"), col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        sha2(lower(trim(col("text"))), 256).as("text_hash"))
    val perSource = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum("n_tokens").as("tokens_total"),
      sum("n_chars").as("chars_total"),
      (count(lit(1)) - countDistinct(col("text_hash"))).as("dup_docs"))
    val total = docs.agg(count(lit(1)).as("corpus_docs"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("tokens_total"), col("chars_total"),
        expr("tokens_total * 100L div n_docs").as("mean_tokens_x100"),
        col("dup_docs"),
        expr("n_docs * 1000000L div corpus_docs").as("share_ppm"))
  }

  /** A source whose corpus share moved more than this (per million)
    * between snapshots is flagged as drifted.
    */
  val DriftThresholdPpm = 5000L

  /** Card-to-card drift verdicts: per-source doc counts and shares of two
    * snapshots, signed share delta, and the drift flag (share shift past
    * [[DriftThresholdPpm]], or a source appearing/vanishing — both
    * surface with 0-filled counts, never drop). Cards are source-sized,
    * so the comparison is a broadcast-scale full outer join.
    */
  private[graft] def compareCards(oldCard: DataFrame,
                                  newCard: DataFrame): DataFrame =
    oldCard.select(col("source"), col("n_docs").as("docs_old"),
        col("share_ppm").as("share_old_ppm"))
      .join(newCard.select(col("source"), col("n_docs").as("docs_new"),
        col("share_ppm").as("share_new_ppm")), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("docs_old"), lit(0L)).as("docs_old"),
        coalesce(col("docs_new"), lit(0L)).as("docs_new"),
        coalesce(col("share_old_ppm"), lit(0L)).as("share_old_ppm"),
        coalesce(col("share_new_ppm"), lit(0L)).as("share_new_ppm"))
      .withColumn("share_delta_ppm",
        col("share_new_ppm") - col("share_old_ppm"))
      .withColumn("drift",
        (abs(col("share_delta_ppm")) > DriftThresholdPpm ||
          col("docs_old") === 0L || col("docs_new") === 0L).cast("int"))

  /** Gate `q_card_drift`: drift of the full corpus against the
    * deterministic "previous snapshot" slice (doc_id % 10 ≠ 0) — the
    * oracle replays both cards and the comparison. The STORED lifecycle
    * ([[buildDatasetCard]] / [[cardDriftFromModel]]) is spec-gated
    * bit-equal to this in-query form.
    */
  def cardDrift(s: SparkSession, d: String): DataFrame = {
    val all = t(s, d, "documents")
    compareCards(cardOver(all.filter(col("doc_id") % 10 =!= 0)),
      cardOver(all))
      .orderBy("source")
  }

  /** Stored-card half of the drift monitor: persist today's card ... */
  def buildDatasetCard(docs: DataFrame, db: String): Unit =
    graft.store.Warehouse.saveModel(cardOver(docs), db, "dataset_card")

  /** ... and compare a later corpus against it (card side is the stored
    * table — no recomputation of the old snapshot; refreshDb per the
    * cross-session freshness contract).
    */
  def cardDriftFromModel(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    compareCards(s.table(s"$db.dataset_card"), cardOver(t(s, d, "documents")))
      .orderBy("source")
  }
}
