package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** URL canonicalization laws: part extraction, host/port/www and
  * trailing-slash normalization, tracking-param filtering (order
  * preserved), public-suffix label arithmetic, idempotence of the
  * canonical form, and domain-stat share consistency.
  */
class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def normOf(urls: (Long, String)*): Map[Long, org.apache.spark.sql.Row] =
    UrlOps.urlNormalizeFor(urls.toDF("doc_id", "url")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("normalization: scheme/host case, www, default port, slash, fragment") {
    val m = normOf(
      1L -> "HTTPS://WWW.News.Example.COM:443/A/B/?utm_source=x&id=9&ref=z#frag",
      2L -> "https://cdn.example.co.uk/x",
      3L -> "https://example.com",
      4L -> "https://example.com/?utm_campaign=only")
    val r1 = m(1L)
    assert(r1.getAs[String]("scheme") == "https")
    assert(r1.getAs[String]("host") == "news.example.com")
    assert(r1.getAs[String]("path_norm") == "/A/B")
    assert(r1.getAs[String]("query_norm") == "id=9")
    assert(r1.getAs[String]("registered_domain") == "example.com")
    assert(r1.getAs[String]("norm_url") == "https://news.example.com/A/B?id=9")
    // co.uk: three labels
    assert(m(2L).getAs[String]("registered_domain") == "example.co.uk")
    // empty path → '/'; no query → no '?'
    assert(m(3L).getAs[String]("norm_url") == "https://example.com/")
    // all-tracking query disappears entirely
    assert(m(4L).getAs[String]("norm_url") == "https://example.com/")
  }

  test("normalization: surviving params keep their original order") {
    val m = normOf(5L -> "https://a.com/p?b=2&utm_x=t&a=1&ref=r&c=3")
    assert(m(5L).getAs[String]("query_norm") == "b=2&a=1&c=3")
  }

  test("normalization is idempotent on its own output") {
    val once = UrlOps.urlNormalize(spark, sf)
      .select(col("doc_id"), col("norm_url").as("url"))
    val twice = UrlOps.urlNormalizeFor(once)
      .select(col("doc_id"), col("norm_url"))
    val diff = once.withColumnRenamed("url", "u1")
      .join(twice, "doc_id")
      .filter(col("u1") =!= col("norm_url")).count()
    assert(diff == 0L, "canonical form must be a fixed point")
  }

  test("domain stats: share arithmetic and over-share verdict agree") {
    val rows = UrlOps.domainStats(spark, sf).collect()
    assert(rows.length > 20, "both suffix families must appear")
    val totalDocs = Tables.t(spark, sf, "documents").count()
    rows.foreach { r =>
      val share = r.getAs[Long]("share_permille")
      assert(share == r.getAs[Long]("n_docs") * 1000 / totalDocs)
      assert((r.getAs[Int]("over_share") == 1) ==
        (share > UrlOps.SpamSharePerMille))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    // the verdict is non-vacuous in both directions on the fixture
    assert(rows.exists(_.getAs[Int]("over_share") == 1))
    assert(rows.exists(_.getAs[Int]("over_share") == 0))
  }

  test("sitemap coverage: classes foot, phantoms uncrawled, " +
      "%5=4 slice unlisted, ppm arithmetic exact") {
    import org.apache.spark.sql.functions._
    val rows = UrlOps.sitemapCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nl, nc, nb) = (r.getAs[Long]("n_listed"),
        r.getAs[Long]("n_crawled"), r.getAs[Long]("n_both"))
      assert(nl == nb + r.getAs[Long]("n_listed_uncrawled"))
      assert(nc == nb + r.getAs[Long]("n_crawled_unlisted"))
      assert(r.getAs[Long]("coverage_ppm") ==
        (if (nl == 0) 0L else nb * 1000000L / nl))
      // lastmod parsed back out of the XML: a 2024-01-dd date whenever
      // the domain lists anything (a domain whose only pages fall in the
      // unlisted %5=4 slice has an empty sitemap -> null)
      val lm = Option(r.getAs[String]("latest_lastmod"))
      assert(if (nl == 0) lm.isEmpty
             else lm.exists(_.matches("2024-01-\\d\\d")))
    }
    // corpus-level accounting against the slices that crafted the sitemap
    val docs = Tables.t(spark, sf, "documents")
    val phantoms = docs.filter(col("doc_id") % 5 === 0).count()
    val unlisted = docs.filter(col("doc_id") % 5 === 4).count()
    assert(rows.map(_.getAs[Long]("n_listed_uncrawled")).sum == phantoms)
    assert(rows.map(_.getAs[Long]("n_crawled_unlisted")).sum == unlisted)
    assert(rows.map(_.getAs[Long]("n_crawled")).sum == docs.count())
  }

  test("url plans are per-row: no exchange beyond the output sort") {
    val plan = UrlOps.urlNormalize(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("rangepartitioning"),
      s"urlNormalize shuffled beyond the output sort:\n$plan")
  }
}
