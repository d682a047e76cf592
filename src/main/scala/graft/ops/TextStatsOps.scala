package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Per-document statistics, language-ID, readability, concordance,
  * provenance concentration and dataset-card reporting over `documents`.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextStatsPart extends TextCorePart {

  /** Per-doc token/char counts. */
  def textStats(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents")).select(
      col("doc_id"),
      length(col("text")).as("n_chars_m"),
      size(col("tokens")).as("n_tokens"),
      length(regexp_replace(col("text"), " ", "")).as("n_nonspace"))
      .orderBy("doc_id")

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
