package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Web-corpus document-structure operators — the document-layout half of
  * the training-data cleaning toolbox that [[TextOps]]'s token-level
  * passes don't cover: Gopher/C4-style repetition and format quality
  * rules, CCNet-style corpus-level line (boilerplate) deduplication, HTML
  * boilerplate extraction, and the near-dup-cluster-keyed leakage-safe
  * holdout split.
  *
  * The fixture corpus is a flat single-space token stream (TESTDATA.md), so
  * every operator here runs over a DETERMINISTIC crafted multi-line view
  * ([[craftedLines]]) that both engines reconstruct identically — the
  * [[TextOps]] CJK-enrichment posture: the crafting is the fixture, the
  * operator logic is the product.
  *
  * Scale posture: per-doc signals are doc-keyed aggregations over the line
  * volume (one line-volume shuffle, linear); corpus-level dedup adds one
  * md5-line-key shuffle for the document-frequency count — never all-pairs,
  * never a driver collect.
  */
object WebTextOps {

  /** Tokens per crafted content line. */
  private[graft] val LineTokens = 8

  /** Deterministic multi-line crafting shared by every line-family query
    * (a second inline copy could silently drift from the oracles'
    * reconstruction — the [[TextOps]] cjkEnriched rule):
    *
    *  - a per-source boilerplate header (`home about contact <source>`) —
    *    repeats across every doc of a source;
    *  - the base text broken into [[LineTokens]]-token content lines (a
    *    single global regex: every 8th inter-token space becomes a
    *    newline — bit-identical in Java regex and RE2);
    *  - `doc_id % 4 == 0`: a bullet line (`- related links`);
    *  - `doc_id % 3 == 0`: an ellipsis line (`read more ...`);
    *  - `doc_id % 5 == 0`: a newsletter line TWICE (an in-doc duplicate);
    *  - a global footer (`copyright 2024 all rights reserved`).
    *
    * `concat_ws` skips the null optional pieces in both engines.
    *
    * FIXTURE PRECONDITION (pinned by the "lined fixture shape" spec): base
    * text is non-empty and single-space delimited — the line-break regex
    * counts token boundaries as single spaces, and the crafted view's
    * line semantics are only the documented ones under that shape.
    */
  private[graft] def craftedLines: Column = concat_ws("\n",
    concat(lit("home about contact "), col("source")),
    regexp_replace(trim(col("text")), "(\\S+( \\S+){7}) ", "$1\n"),
    when(col("doc_id") % 4 === 0, lit("- related links")),
    when(col("doc_id") % 3 === 0, lit("read more ...")),
    when(col("doc_id") % 5 === 0,
      lit("subscribe to our newsletter\nsubscribe to our newsletter")),
    lit("copyright 2024 all rights reserved"))

  /** (doc_id, p, line, lk): 1-based line explosion of the crafted view
    * with the md5 line key the corpus-level passes join on.
    */
  private def explodedLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("crafted"), "\n")).as(Seq("p0", "line")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("line"),
        md5(col("line").cast("binary")).as("lk"))

  /** Gopher-style repetition + format quality signals (Rae et al. 2021,
    * table A1 thresholds) with a composed keep verdict:
    *
    *  - duplicate-line fraction (occurrences beyond each line's first /
    *    total lines) and the duplicate-line CHARACTER fraction inputs;
    *  - fraction of lines starting with a bullet / ending in an ellipsis;
    *  - word count bounds [50, 100k] and mean word length bounds [3, 10].
    *
    * The keep rule cross-multiplies integer counts (`n_dup*10 <= n_lines*3`
    * is `frac <= 0.30`) — no float threshold compare anywhere, the
    * engine's exact-integer posture; the reported `dup_line_frac` double
    * is int/int division, deterministic in both engines.
    *
    * Scale shape: one (doc_id, line)-keyed line-volume aggregation folded
    * into a doc-keyed one, plus per-row token counts — linear, zero
    * corpus-wide state.
    */
  def gopherQuality(s: SparkSession, d: String): DataFrame =
    gopherQualityFor(t(s, d, "documents"))

  /** [[gopherQuality]] over any (doc_id, text, source) frame. */
  private[graft] def gopherQualityFor(raw: DataFrame): DataFrame = {
    val docs = raw.withColumn("crafted", craftedLines)
    val perLine = explodedLines(docs).groupBy("doc_id", "line")
      .agg(count(lit(1)).as("c"))
    val lineAgg = perLine.groupBy("doc_id").agg(
      sum("c").as("n_lines"),
      sum(col("c") - 1).as("n_dup_lines"),
      sum((col("c") - 1) * length(col("line"))).as("dup_chars"),
      sum(when(col("line").startsWith("- "), col("c")).otherwise(0L))
        .as("n_bullet"),
      sum(when(col("line").endsWith("..."), col("c")).otherwise(0L))
        .as("n_ellipsis"))
    val tok = docs.select(col("doc_id"),
      size(split(trim(col("crafted")), "\\s+")).as("n_tokens"),
      length(regexp_replace(col("crafted"), "\\s", "")).as("n_nonspace"))
    lineAgg.join(tok, "doc_id")
      .select(col("doc_id"), col("n_lines"), col("n_dup_lines"),
        col("dup_chars"), col("n_bullet"), col("n_ellipsis"),
        col("n_tokens"), col("n_nonspace"),
        (col("n_dup_lines").cast("double") / col("n_lines").cast("double"))
          .as("dup_line_frac"),
        (col("n_dup_lines") * 10 <= col("n_lines") * 3 &&
          col("n_bullet") * 10 <= col("n_lines") * 9 &&
          col("n_ellipsis") * 10 <= col("n_lines") * 3 &&
          col("n_tokens") >= 50 && col("n_tokens") <= 100000 &&
          col("n_nonspace") >= col("n_tokens") * 3 &&
          col("n_nonspace") <= col("n_tokens") * 10).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Minimum tokens for a line to qualify as content in [[lineQuality]]. */
  val LineMinTokens = 4

  /** jusText-style SINGLE-DOCUMENT content/boilerplate line
    * classification (Pomikálek 2011's stopword-density core) — the
    * corpus-state-free complement of [[lineDedup]]'s cross-document df
    * rule: a line is CONTENT iff it carries ≥ [[LineMinTokens]] tokens
    * AND at least one stopword ([[TextOps.StopWords]] — function words
    * mark running prose; nav/footer fragments are noun strings). The
    * crafted header (`home about contact …`, 4 tokens, 0 stops), bullet
    * and ellipsis lines (3 tokens) and the copyright footer (0 stops)
    * all classify boilerplate without ANY corpus pass — the rule a
    * single-page extractor can run at crawl time, before corpus-level
    * dedup ever sees the page. Output: per-doc line verdict counts and
    * the cleaned text (content lines re-joined in original order,
    * cell-exact against the oracle).
    *
    * Scale shape: per-row line explode + per-line expressions + ONE
    * doc-keyed aggregation — no corpus-wide state, linear always.
    * Gate `q_line_quality`.
    */
  def lineQuality(s: SparkSession, d: String): DataFrame =
    lineQualityFor(t(s, d, "documents"))

  /** [[lineQuality]] over any (doc_id, text, source) frame. */
  private[graft] def lineQualityFor(raw: DataFrame): DataFrame = {
    val stops = TextOps.StopWords.map(x => x: Any)
    val scored = explodedLines(raw.withColumn("crafted", craftedLines))
      .withColumn("toks", split(col("line"), " "))
      .withColumn("content",
        size(col("toks")) >= LineMinTokens &&
          size(filter(col("toks"), tk => tk.isin(stops: _*))) >= 1)
    scored.groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(col("content").cast("long")).as("n_content"),
        sum((!col("content")).cast("long")).as("n_boiler"),
        concat_ws("\n", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN content THEN struct(p, line) END))," +
            " x -> x.line)")).as("text_content"))
      .orderBy("doc_id")
  }

  /** Minimum words per kept line and minimum kept lines per page in
    * [[c4Filters]] (Raffel et al. 2020 §2.2's 5-word / 3-sentence rules,
    * lines standing in for sentences over the crafted view).
    */
  val C4MinLineTokens = 5
  val C4MinKeptLines = 3

  /** C4-style rule-based cleaning (Raffel et al. 2020 §2.2) — the THIRD
    * classic web-cleaning recipe next to [[gopherQuality]]'s repetition
    * thresholds and [[lineQuality]]'s stopword-density rule, and the one
    * production pipelines usually run FIRST because every rule is a
    * per-line constant test:
    *
    *  - keep only lines ending in terminal punctuation (`.` `!` `?` `"`),
    *  - with ≥ [[C4MinLineTokens]] single-space words,
    *  - not mentioning `javascript` and not a `privacy policy` line;
    *  - drop the WHOLE page when any line carries `{` or `lorem ipsum`,
    *    or fewer than [[C4MinKeptLines]] lines survive.
    *
    * The crafted view extends [[craftedLines]] with the rule-exercising
    * fixtures (the lang-ID enrichment posture — crafting is the fixture,
    * the rules are the product): `doc_id % 13 = 0` gets a
    * `lorem ipsum … {` line (page kill), `% 9 = 0` a javascript notice,
    * `% 10 = 0` a privacy-policy line, and every line whose
    * `(p + doc_id) % 3 = 1` gains a terminal period — so all four line
    * rules and both page rules fire on deterministic slices. Output:
    * per-doc line/kept counts, the page verdict, and the cleaned text
    * (kept lines in original order; `''` for dropped pages).
    *
    * Scale shape: per-row line explode + constant per-line tests + ONE
    * doc-keyed aggregation — zero corpus-wide state, linear always.
    * Gate `q_c4_filters`.
    */
  def c4Filters(s: SparkSession, d: String): DataFrame =
    c4FiltersFor(t(s, d, "documents"))

  /** [[c4Filters]] over any (doc_id, text, source) frame. */
  private[graft] def c4FiltersFor(raw: DataFrame): DataFrame = {
    val crafted = concat_ws("\n", craftedLines,
      when(col("doc_id") % 13 === 0, lit("lorem ipsum dolor sit amet {")),
      when(col("doc_id") % 9 === 0,
        lit("please enable javascript to view this site.")),
      when(col("doc_id") % 10 === 0, lit("read our privacy policy here.")))
    val scored = explodedLines(raw.withColumn("crafted", crafted))
      .withColumn("line2", concat(col("line"),
        when((col("p") + col("doc_id")) % 3 === 1, lit(".")).otherwise(lit(""))))
      .withColumn("kept",
        substring(col("line2"), -1, 1).isin(".", "!", "?", "\"") &&
          size(split(col("line2"), " ")) >= C4MinLineTokens &&
          !col("line2").contains("javascript") &&
          !col("line2").contains("privacy policy"))
      .withColumn("page_bad",
        col("line2").contains("{") || col("line2").contains("lorem ipsum"))
    scored.groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(col("kept").cast("long")).as("n_kept"),
        (!max(col("page_bad")) &&
          sum(col("kept").cast("long")) >= C4MinKeptLines).as("pk"),
        concat_ws("\n", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN kept THEN struct(p, line2) END))," +
            " x -> x.line2)")).as("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("pk").cast("int").as("page_keep"),
        when(col("pk"), col("kept_text")).otherwise(lit("")).as("text_c4"))
      .orderBy("doc_id")
  }

  /** A line is corpus-boilerplate when this many DISTINCT documents carry
    * it (CCNet's cross-document paragraph-dedup rule).
    */
  val MinLineDocs = 2

  /** CCNet-style corpus-level line dedup — the OUTPUT-corpus form: every
    * line appearing in >= [[MinLineDocs]] distinct documents (the shared
    * header/footer/newsletter boilerplate) is removed from EVERY document;
    * survivors re-join in original order. In-document duplicates of a
    * corpus-shared line are removed in full (the rule counts distinct
    * documents, not occurrences).
    *
    * Scale shape: the document-frequency count groups the 16-byte md5
    * line key (per-doc DISTINCT first, so a hot boilerplate line costs one
    * row per doc); the verdict joins back on the same key; reassembly is
    * one doc-keyed aggregation. Three linear shuffles, no all-pairs, no
    * broadcast of an unbounded dup set.
    */
  def lineDedup(s: SparkSession, d: String): DataFrame =
    lineDedupFor(t(s, d, "documents"))

  /** [[lineDedup]] over any (doc_id, text, source) frame. */
  private[graft] def lineDedupFor(raw: DataFrame): DataFrame = {
    val lines = explodedLines(raw.withColumn("crafted", craftedLines))
    val dup = lines.select("lk", "doc_id").distinct()
      .groupBy("lk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= MinLineDocs).select("lk")
    val marked = lines
      .join(dup.withColumn("dropped", lit(true)), Seq("lk"), "left")
      .withColumn("dropped", coalesce(col("dropped"), lit(false)))
    marked.groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(col("dropped").cast("long")).as("n_removed"),
        concat_ws("\n", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN NOT dropped THEN struct(p, line) END))," +
            " x -> x.line)")).as("text_clean"))
      .orderBy("doc_id")
  }

  /** Deterministic crafted HTML wrapper shared by the extraction query and
    * its oracle: head noise (script + style blocks, a title), nav
    * boilerplate, the document text as the main paragraph, an
    * entity-bearing ad block on every 3rd doc, and an entity-bearing
    * footer.
    */
  private[graft] def craftedHtml: Column = concat(
    lit("<html><head><script type=\"text/javascript\">var t = 1;</script>"),
    lit("<style>.x{color:red;}</style><title>"),
    col("source"), lit(" "), col("doc_id").cast("string"),
    lit("</title></head><body><nav><a href=\"/\">Home</a> | " +
      "<a href=\"/about\">About</a></nav><h1>Doc "),
    col("doc_id").cast("string"), lit("</h1><p>"), col("text"), lit("</p>"),
    when(col("doc_id") % 3 === 0,
      lit("<div class=\"ad\">Buy now &amp; save &lt;50%&gt;</div>"))
      .otherwise(lit("")),
    lit("<footer>&copy; 2024 "), col("source"), lit("</footer></body></html>"))

  /** Entity decode table, applied IN ORDER — `&amp;` must decode last so
    * a literal `&amp;lt;` in source can never double-decode into `<`.
    */
  private val HtmlEntities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&copy;" -> "©", "&amp;" -> "&")

  /** Deterministic HTML boilerplate extraction — the first stage of every
    * web-crawl corpus pipeline: drop the head and any script/style blocks
    * (lazy dot-all regexes — identical semantics in Java regex and RE2;
    * the title still surfaces as its own column), strip remaining
    * tags to single spaces (so adjacent text nodes cannot fuse), decode
    * the standard entities in fixed order, collapse whitespace. Emits the
    * extracted text, the title, and the text-to-html per-mille ratio (the
    * text-density signal boilerplate classifiers threshold on) as exact
    * integer division. Per-row expressions only — zero shuffle before the
    * output sort.
    */
  def htmlExtract(s: SparkSession, d: String): DataFrame =
    htmlExtractFor(t(s, d, "documents"))

  /** [[htmlExtract]] over any (doc_id, text, source) frame. */
  private[graft] def htmlExtractFor(raw: DataFrame): DataFrame = {
    val noBlocks = regexp_replace(col("html"),
      "(?is)<head>.*?</head>|<script.*?</script>|<style.*?</style>", "")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, v)) =>
      call_function("replace", c, lit(e), lit(v))
    }
    raw.withColumn("html", craftedHtml)
      .withColumn("text_main", trim(regexp_replace(decoded, "\\s+", " ")))
      .withColumn("title",
        regexp_extract(col("html"), "(?is)<title>(.*?)</title>", 1))
      .withColumn("n_chars_html", length(col("html")))
      .withColumn("n_chars_text", length(col("text_main")))
      .withColumn("text_permille",
        expr("n_chars_text * 1000 div n_chars_html"))
      .select("doc_id", "title", "n_chars_html", "n_chars_text",
        "text_permille", "text_main")
      .orderBy("doc_id")
  }

  /** Leakage-safe holdout split — the composition the flat hash split
    * ([[SamplingOps.splitAssign]]) cannot provide: near-duplicate
    * documents must never straddle train/test (a test doc with a training
    * near-copy is contamination, Lee et al. 2021 §6). Split assignment is
    * keyed on the near-dup CLUSTER canonical id (minhash candidate pairs →
    * transitive closure → min-id canon, the [[TextOps.dedupSurvivors]]
    * machinery), so every cluster member inherits one verdict by
    * construction — the no-straddle property is structural, not
    * probabilistic (asserted in spec over the real pair set).
    *
    * Split gate: pairs are hash-family-specific (materialized rows-only);
    * the closure + md5-bucket assignment is replayed by the oracle over
    * the same rows. Scale: CC's O(log d) checkpointed rounds + per-row
    * hashing — no new shuffle beyond the cluster machinery.
    */
  def leakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.OracleInputs.checkpoint(
      TextOps.minhashCandidatePairs(s, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")),
      d, "split_pairs")
    val canon = GraphOps.connectedComponents(pairs,
        t(s, d, "documents").select(col("doc_id").as("id")))
      .select(col("id").as("doc_id"), col("cluster_id").as("canonical_id"))
    canon
      .withColumn("sk", md5(concat(lit("split|"),
        col("canonical_id").cast("string")).cast("binary")))
      .withColumn("bucket", SamplingOps.bucketOfKey(col("sk")))
      .withColumn("split",
        when(col("bucket") < SamplingOps.TrainPerMille, "train")
          .when(col("bucket") < SamplingOps.ValPerMille, "val")
          .otherwise("test"))
      .select("doc_id", "canonical_id", "bucket", "split")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ mojibake

  /** Mojibake detection and repair (the ftfy core case): text whose UTF-8
    * bytes were once decoded as Latin-1 shows as 'Ã©'-style pairs; the
    * exact inverse is encode(Latin-1) → decode(UTF-8), both codegen'd
    * built-ins. Repair is GUARDED three ways — the string must be
    * Latin-1-representable (chars ≤ U+00FF, else the encode would
    * lossily '?'-substitute), must carry at least one UTF-8-shaped lead +
    * continuation pattern, and the re-decode must produce no U+FFFD
    * replacement char (a genuine Latin-1 'é' round-trips to malformed
    * UTF-8 and must be left alone). Per-row, zero shuffles.
    *
    * The gate follows the crafted-fixture convention: docs are injected
    * (by doc_id arithmetic, identically in both engines) with a 2-byte
    * mojibake token, a 3-byte CJK mojibake, or a GENUINE Latin-1 char
    * that must survive unrepaired — and the oracle computes the expected
    * repaired text by CONSTRUCTION (repair ∘ craft = identity), so a
    * green row is an inverse proof, not an arithmetic replay.
    */
  private[graft] val MojiSuspectRe =
    "[\u00E0-\u00EF][\u0080-\u00BF]{2}|[\u00C2-\u00DF][\u0080-\u00BF]"

  /** Inject deterministic mojibake/clean suffixes (engine side of the
    * crafted fixture — the oracle builds the same strings with chr()).
    */
  private[graft] def craftedMojibake(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"),
      when(pmod(col("doc_id"), lit(7)) === 2, lit(" caf\u00C3\u00A9")) // UTF-8 'é' as Latin-1
        .when(pmod(col("doc_id"), lit(7)) === 3, lit(" \u00ED\u0095\u009C")) // UTF-8 '한' as Latin-1
        .when(pmod(col("doc_id"), lit(7)) === 4, lit(" caf\u00E9")) // genuine é: keep
        .otherwise(lit(""))))

  def mojibakeRepairFor(raw: DataFrame): DataFrame = {
    val suspects = size(expr(s"regexp_extract_all(text, '$MojiSuspectRe', 0)"))
    val latin1able = col("text").rlike("^[\u0000-\u00FF]*$")
    val redecoded = decode(encode(col("text"), "ISO-8859-1"), "UTF-8")
    raw
      .withColumn("n_suspects", suspects.cast("long"))
      .withColumn("cand", when(latin1able && col("n_suspects") > 0, redecoded))
      .withColumn("repaired",
        (col("cand").isNotNull && !col("cand").contains("\uFFFD")).cast("int"))
      .select(col("doc_id"), col("n_suspects"), col("repaired"),
        md5(when(col("repaired") === 1, col("cand")).otherwise(col("text"))
          .cast("binary")).as("repaired_md5"),
        length(when(col("repaired") === 1, col("cand")).otherwise(col("text")))
          .cast("long").as("n_chars"))
  }

  /** Gate `q_mojibake_repair`. */
  def mojibakeRepair(s: SparkSession, d: String): DataFrame =
    mojibakeRepairFor(craftedMojibake(graft.Tables.t(s, d, "documents")))
      .orderBy("doc_id")
}
