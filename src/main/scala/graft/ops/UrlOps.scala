package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** URL canonicalization and per-domain corpus statistics — the provenance
  * half of a web-corpus pipeline (CCNet/RefinedWeb posture): dedup and
  * filtering key on the CANONICAL url and the REGISTERED domain, not the
  * raw crawl string, and domain-level shares drive spam/over-crawl cuts.
  *
  * The fixture has no url column, so every query runs over a DETERMINISTIC
  * crafted url ([[craftedUrl]]) with the messiness canonicalization exists
  * for: upper-cased scheme/host, a www prefix, an explicit default port,
  * tracking params, a trailing slash and a fragment. The crafting is the
  * fixture; the normalization logic is the product.
  *
  * Scale posture: normalization is per-row regex/string expressions (zero
  * shuffle); domain stats are one registered-domain-keyed aggregation plus
  * a 1-row broadcast for the corpus total — never a single-partition
  * funnel.
  */
object UrlOps {

  /** Deterministic crafted url shared by every url query (and replayed
    * verbatim by the oracles):
    *  - `doc_id % 7 == 0` (7 is coprime with the fixture's
    *    source = src(doc_id mod 20) assignment, so every source carries
    *    BOTH suffixes and domain shares genuinely vary): a UK host under
    *    a country-code suffix with a
    *    sub-label, no port, a trailing-slash path, a tracking param and a
    *    fragment — `https://Sub.<source>.CO.UK/Path/<id>/?utm_source=feed&id=<id>#top`;
    *  - otherwise: an upper-cased scheme, www + explicit default port,
    *    and (every 3rd doc) a `ref` tracking param —
    *    `HTTPS://WWW.<source>.COM:443/Path/<id>?id=<id>&utm_campaign=x[&ref=promo]`.
    */
  private[graft] def craftedUrl: Column = {
    val id = col("doc_id").cast("string")
    when(col("doc_id") % 7 === 0,
      concat(lit("https://Sub."), col("source"), lit(".CO.UK/Path/"), id,
        lit("/?utm_source=feed&id="), id, lit("#top")))
      .otherwise(concat(lit("HTTPS://WWW."), col("source"), lit(".COM:443/Path/"),
        id, lit("?id="), id, lit("&utm_campaign=x"),
        when(col("doc_id") % 3 === 0, lit("&ref=promo")).otherwise(lit(""))))
  }

  /** Tracking query params dropped by canonicalization: the `utm_*` family
    * and bare `ref`.
    */
  private def isTracking(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("ref=")

  /** Minimal public-suffix rule for the crafted corpus: `co.uk` is a
    * two-label suffix (registered domain = last THREE labels), everything
    * else single-label (last TWO). A production deployment swaps in the
    * full public-suffix list as a broadcast lookup; the label arithmetic
    * is the same.
    */
  private def registeredDomainOf(host: Column): Column = {
    val labels = split(host, "\\.")
    val k = when(host.endsWith(".co.uk"), 3).otherwise(2)
    concat_ws(".", slice(labels, size(labels) - k + 1, k))
  }

  /** Appends the canonical url parts to any frame carrying a `url` column
    * (other columns pass through — link extraction normalizes per-LINK
    * rows through the same definitions the document query uses):
    * lower-cased scheme and host, `www.` prefix and default `:443` port
    * stripped, trailing path slash removed, tracking params dropped
    * (remaining params in original order), fragment discarded.
    */
  private[graft] def withNormColumns(docs: DataFrame): DataFrame = {
    val parsed = docs
      .withColumn("scheme", lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)))
      .withColumn("hostport", lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]*)", 1)))
      .withColumn("path", regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]*([^?#]*)", 1))
      .withColumn("query", regexp_extract(col("url"), "\\?([^#]*)", 1))
    parsed
      .withColumn("host",
        regexp_replace(regexp_replace(col("hostport"), ":443$", ""), "^www\\.", ""))
      .withColumn("path_norm",
        when(col("path") === "", "/")
          .otherwise(regexp_replace(col("path"), "(.)/$", "$1")))
      .withColumn("query_norm", concat_ws("&",
        filter(split(col("query"), "&"), p => !isTracking(p) && p =!= "")))
      .withColumn("registered_domain", registeredDomainOf(col("host")))
      .withColumn("norm_url", concat(
        col("scheme"), lit("://"), col("host"), col("path_norm"),
        when(col("query_norm") === "", "").otherwise(concat(lit("?"), col("query_norm")))))
      .drop("hostport", "path", "query")
  }

  /** Canonicalization projection for a (doc_id, url) frame. */
  private[graft] def urlNormalizeFor(docs: DataFrame): DataFrame =
    withNormColumns(docs)
      .select("doc_id", "url", "scheme", "host", "path_norm", "query_norm",
        "registered_domain", "norm_url")

  /** Crafted-url canonicalization over the documents table — per-row only,
    * ordered for the gate.
    */
  def urlNormalize(s: SparkSession, d: String): DataFrame =
    urlNormalizeFor(t(s, d, "documents").withColumn("url", craftedUrl))
      .orderBy("doc_id")

  /** A registered domain holding more than this per-mille share of the
    * corpus is flagged as an over-crawl/spam candidate (the domain-cut
    * input of RefinedWeb-style pipelines).
    */
  val SpamSharePerMille = 30L

  /** Per-registered-domain corpus statistics: doc count, distinct
    * languages, total whitespace tokens, exact per-mille share of the
    * corpus (int/int) and the over-share flag. One domain-keyed
    * aggregation; the corpus total joins in as a 1-row broadcast (never an
    * Exchange SinglePartition over the data).
    */
  def domainStats(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("url", craftedUrl)
      .withColumn("host", regexp_replace(regexp_replace(
        lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]*)", 1)),
        ":443$", ""), "^www\\.", ""))
      .withColumn("registered_domain", registeredDomainOf(col("host")))
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
    val perDomain = docs.groupBy("registered_domain").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_tokens").cast("long")).as("total_tokens"))
    val total = docs.agg(count(lit(1)).as("corpus_docs"))
    perDomain.crossJoin(broadcast(total))
      .withColumn("share_permille", expr("n_docs * 1000 div corpus_docs"))
      .select(col("registered_domain"), col("n_docs"), col("n_langs"),
        col("total_tokens"), col("share_permille"),
        (col("share_permille") > SpamSharePerMille).cast("int").as("over_share"))
      .orderBy("registered_domain")
  }

  /** Sitemap coverage — crawl completeness against the publisher's own
    * URL inventory. Each domain's sitemap XML is ASSEMBLED
    * deterministically (sorted `<url><loc>…</loc><lastmod>…</lastmod>
    * </url>` entries: every corpus page except the doc_id % 5 = 4 slice,
    * plus phantom id+100000 pages for the % 5 = 0 slice — pages the site
    * lists but the crawl never fetched), then PARSED BACK with the real
    * regex walk (`<url>` blocks → loc/lastmod fields → path), and the
    * parsed inventory full-outer-joins the crawled page set per
    * (domain, path):
    *   - both sides      → listed and crawled,
    *   - sitemap only    → listed_uncrawled (the crawl frontier),
    *   - corpus only     → crawled_unlisted (organic discovery).
    *
    * Scale shape: entries explode per-row; the XML assembly and re-parse
    * are one domain-keyed agg + per-row regex (a production crawl feeds
    * real sitemap bytes into the SAME parse path); the coverage join keys
    * (domain, path). Gate `q_sitemap_coverage` replays assembly, parse
    * and join.
    */
  def sitemapCoverage(s: SparkSession, d: String): DataFrame = {
    val docs = withNormColumns(
        t(s, d, "documents").withColumn("url", craftedUrl))
      .select(col("doc_id"), col("registered_domain").as("domain"),
        col("path_norm"))
    def entryFor(id: org.apache.spark.sql.Column) = concat(
      lit("<url><loc>https://"), col("domain"), lit("/Path/"),
      id.cast("string"), lit("</loc><lastmod>2024-01-"),
      lpad((id % 28 + 1).cast("string"), 2, "0"),
      lit("</lastmod></url>"))
    val entries = docs.select(col("domain"), explode(array(
        when(col("doc_id") % 5 =!= 4, entryFor(col("doc_id"))),
        when(col("doc_id") % 5 === 0, entryFor(col("doc_id") + 100000))))
        .as("entry"))
      .where(col("entry").isNotNull)
    val xml = entries.groupBy("domain").agg(concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      array_join(array_sort(collect_list(col("entry"))), ""),
      lit("</urlset>")).as("xml"))
    val parsed = xml.select(col("domain"),
        explode(expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)"))
          .as("block"))
      .select(col("domain"),
        regexp_extract(col("block"), "<loc>([^<]*)</loc>", 1).as("loc"),
        regexp_extract(col("block"), "<lastmod>([^<]*)</lastmod>", 1)
          .as("lastmod"))
      .withColumn("path",
        regexp_extract(col("loc"), "^https://[^/]+(/.*)$", 1))
    val cov = parsed
      .select(col("domain"), col("path"), col("lastmod"), lit(1).as("listed"))
      .join(docs.select(col("domain"), col("path_norm").as("path"),
        lit(1).as("crawled")), Seq("domain", "path"), "full_outer")
    cov.groupBy("domain").agg(
        sum(coalesce(col("listed"), lit(0))).cast("long").as("n_listed"),
        sum(coalesce(col("crawled"), lit(0))).cast("long").as("n_crawled"),
        sum(when(col("listed") === 1 && col("crawled") === 1, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("listed") === 1 && col("crawled").isNull, 1L)
          .otherwise(0L)).as("n_listed_uncrawled"),
        sum(when(col("listed").isNull && col("crawled") === 1, 1L)
          .otherwise(0L)).as("n_crawled_unlisted"),
        max(when(col("listed") === 1, col("lastmod"))).as("latest_lastmod"))
      .withColumn("coverage_ppm", when(col("n_listed") === 0L, 0L)
        .otherwise(expr("n_both * 1000000L div n_listed")))
      .orderBy("domain")
  }
}
