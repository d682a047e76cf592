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

/** Core shared by every Text*Part: THE tokenizer and the quality-gate
  * helpers (single definitions — a second inline copy could silently
  * diverge between families).
  */
private[graft] trait TextCorePart {

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

  private[ops] def tokensExpr: Column = tokensOf(col("text"))

  private[ops] def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tokens", tokensExpr)

  /** Quality scoring: stopword ratio + mean token length (int/int double
    * division — deterministic).
    */
  /** Canonical English stopword set — shared by quality scoring and the
    * cleaning pass so their ratios can never silently diverge (and by the
    * matching oracle SQL literals).
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "to", "and")

  private[ops] def stopCount(tokens: Column): Column =
    size(filter(tokens, tk => tk.isin(StopWords.map(x => x: Any): _*)))

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

  private[ops] def cleanGated(docs: DataFrame, survivors: DataFrame): DataFrame =
    qualityGateStats(docs)
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(qualityGate)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("__gate_n_tokens").as("n_tokens"))


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
  private[ops] def cjkEnriched: Column =
    when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" 안녕 세계"),
        expr("repeat('中', CAST(doc_id % 4 + 1 AS INT))"), lit("tail")))
      .otherwise(col("text"))
}

object TextOps extends TextCorePart with TextStatsPart
  with TextDedupPart with TextLmPart with TextQcPart
  with TextVocabPart with TextSpanPart with TextDecontamPart

