package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Decontamination and privacy: probe contamination, n-gram/CJK
  * decontamination, PII redaction/pseudonymization, chunking, and the
  * decontaminated-corpus composition.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextDecontamPart extends TextCorePart {

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

  /** The surviving corpus after [[decontaminateNgram]]: eval docs and any
    * doc overlapping them are removed (broadcast anti-join on doc_id).
    */
  def decontaminatedCorpus(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val flagged = decontaminateNgram(s, d, n).select("doc_id")
    t(s, d, "documents")
      .filter(col("doc_id") % 100 =!= 7)
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
  }
}

