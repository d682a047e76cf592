package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Robots-exclusion filtering (RFC 9309) — the crawl-compliance leg of the
  * web-provenance family: parse a per-domain robots.txt, select the rule
  * group for our user agent, and decide every page URL by the
  * longest-match rule with allow-wins-ties.
  *
  * The fixture carries no robots files, so each registered domain gets a
  * DETERMINISTIC crafted file ([[craftedRobots]]) that exercises the real
  * parser cases: comments, a specific-agent group shadowing the `*` group
  * (even domain digit — the `*` group there says `Disallow: /`, so a
  * group-selection bug blocks everything LOUDLY), a `*`-wildcard pattern,
  * an exact length tie between Allow and Disallow (resolved to allow per
  * RFC 9309 §2.2.2), and an empty `Disallow:` line (ignored, not
  * allow-all/deny-all).
  *
  * Matching contract (documented simplifications, both engines identical):
  * patterns match as prefixes with `*` as a multi-char wildcard (LIKE
  * translation `*`→`%` + `%` suffix — crafted patterns contain no `%`/`_`
  * LIKE metachars); precedence is RAW pattern length (the common
  * practical reading of "most specific match"; Google's parser does the
  * same), ties broken allow-first then pattern text for total
  * determinism; `$` end-anchors are out of scope.
  *
  * Scale shape: the rule table is domain-sized (broadcast); the corpus is
  * scanned once, fan-out = rules-per-domain (constant), decided by one
  * per-doc WindowGroupLimit. Gate `q_robots_filter` replays craft, parse,
  * group selection and match arithmetic line by line.
  */
object RobotsOps {

  /** The agent the engine crawls as. */
  val Agent = "graftbot"

  /** Deterministic per-domain robots.txt text; `k` is the domain's digit
    * (digits of the source label mod 10).
    */
  private def craftedRobots(domain: org.apache.spark.sql.Column,
                            k: org.apache.spark.sql.Column) = {
    val ks = k.cast("string")
    val nl = lit("\n")
    when(k % 2 === 0, concat(
      lit("# crafted robots for "), domain, nl,
      lit(s"User-agent: $Agent"), nl,
      lit("Disallow: /Path/"), ks, lit("  # note: prefix rule"), nl,
      lit("Allow: /Path/"), ks, ks, nl,
      nl,
      lit("User-agent: *"), nl,
      lit("Disallow: /")))
      .otherwise(concat(
        lit("User-agent: *"), nl,
        lit("Disallow: /Path/*"), ks, nl,
        lit("Allow: /Path/"), ks, ks, nl,
        lit("Disallow:")))
  }

  /** Parse crafted robots into the chosen-group rule table:
    * (domain, rtype, pattern). Group selection: the [[Agent]]-specific
    * group when one exists, else the `*` group.
    */
  private[graft] def ruleTable(domains: DataFrame): DataFrame = {
    val lines = domains
      .withColumn("robots", craftedRobots(col("domain"), col("dom_k")))
      .select(col("domain"), posexplode(split(col("robots"), "\n"))
        .as(Seq("line_no", "raw")))
      // strip comments, then surrounding whitespace
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("directive",
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
    val wg = Window.partitionBy("domain").orderBy("line_no")
    val grouped = lines
      .withColumn("group_id", sum(when(col("directive") === "user-agent", 1)
        .otherwise(0)).over(wg))
    val agents = grouped.where(col("directive") === "user-agent")
      .groupBy("domain", "group_id")
      .agg(max("value").as("agent"))
    val hasBot = agents.groupBy("domain")
      .agg(max((col("agent") === Agent).cast("int")).as("has_bot"))
    val chosen = agents.join(hasBot, "domain")
      .where((col("has_bot") === 1 && col("agent") === Agent) ||
        (col("has_bot") === 0 && col("agent") === "*"))
      .select("domain", "group_id")
    grouped
      .where(col("directive").isin("allow", "disallow") && col("value") =!= "")
      .join(chosen, Seq("domain", "group_id"))
      .select(col("domain"), col("directive").as("rtype"),
        col("value").as("pattern"))
  }

  /** Decide every crafted page URL against its domain's rules. */
  def robotsFilter(s: SparkSession, d: String): DataFrame =
    robotsFilterFor(UrlOps.withNormColumns(
        t(s, d, "documents").withColumn("url", UrlOps.craftedUrl))
      .select(col("doc_id"), col("registered_domain").as("domain"),
        col("path_norm")))

  /** Core over any (doc_id, domain, path_norm) frame — the spec's crafted
    * cases enter here.
    */
  private[graft] def robotsFilterFor(docs: DataFrame): DataFrame = {
    val domains = docs.select(col("domain")).distinct()
      .withColumn("dom_k",
        coalesce(regexp_extract(col("domain"), "([0-9]+)", 1).cast("int"), lit(0))
          % 10)
    val rules = ruleTable(domains)
    val matched = docs.join(broadcast(rules), Seq("domain"), "left")
      .withColumn("hit", col("pattern").isNotNull &&
        expr("path_norm LIKE replace(pattern, '*', '%') || '%'"))
    // hits sort first, so rnk 1 is a hit exactly when any rule matched;
    // the rnk-1 guard below re-checks `hit` so a no-hit doc decides `none`
    val w = Window.partitionBy("doc_id").orderBy(
      col("hit").desc,
      length(col("pattern")).desc,
      when(col("rtype") === "allow", 0).otherwise(1).asc,
      col("pattern").asc)
    matched
      .withColumn("rnk", row_number().over(w))
      .groupBy("doc_id", "domain", "path_norm")
      .agg(
        max(when(col("rnk") === 1 && col("hit"), col("pattern"))).as("rule_pattern0"),
        max(when(col("rnk") === 1 && col("hit"), col("rtype"))).as("rule_type0"))
      .select(col("doc_id"), col("domain"), col("path_norm").as("path"),
        coalesce(col("rule_pattern0"), lit("")).as("rule_pattern"),
        coalesce(col("rule_type0"), lit("none")).as("rule_type"),
        when(coalesce(col("rule_type0"), lit("allow")) === "disallow", 0)
          .otherwise(1).as("allowed"))
      .orderBy("doc_id")
  }
}
