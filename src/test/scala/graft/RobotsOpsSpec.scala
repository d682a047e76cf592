package graft

import org.apache.spark.sql.functions._
import graft.ops.RobotsOps

/** Robots exclusion: group selection (specific agent shadows `*`), prefix
  * and wildcard matching, the allow-wins-tie rule, and the ignored empty
  * Disallow line — each on a crafted (doc, domain, path) row whose
  * expected verdict is hand-derived from the crafted robots file.
  */
class RobotsOpsSpec extends SparkSpec {

  import spark.implicits._

  private def decide(rows: (Long, String, String)*)
      : Map[Long, (String, String, Int)] =
    RobotsOps.robotsFilterFor(rows.toSeq.toDF("doc_id", "domain", "path_norm"))
      .collect().map(r => r.getAs[Long]("doc_id") -> ((
        r.getAs[String]("rule_pattern"), r.getAs[String]("rule_type"),
        r.getAs[Int]("allowed")))).toMap

  // even digit (k=2): graftbot group [Disallow /Path/2, Allow /Path/22];
  // `*` group says Disallow: / and MUST be shadowed
  test("specific agent group shadows the deny-all `*` group") {
    val m = decide(
      (1L, "src2.com", "/Path/9"),   // matches neither rule -> none
      (2L, "src2.com", "/Path/2"),   // prefix disallow
      (3L, "src2.com", "/Path/25"),  // prefix disallow (/Path/2 is a prefix)
      (4L, "src2.com", "/Path/22"))  // longer allow wins
    assert(m(1L) == (("", "none", 1)))
    assert(m(2L) == (("/Path/2", "disallow", 0)))
    assert(m(3L) == (("/Path/2", "disallow", 0)))
    assert(m(4L) == (("/Path/22", "allow", 1)))
  }

  // odd digit (k=3): `*` group [Disallow /Path/*3, Allow /Path/33,
  // empty Disallow]
  test("wildcard match, allow-wins-tie, empty Disallow ignored") {
    val m = decide(
      (1L, "src3.com", "/Path/13"),  // wildcard hit (3 not at start)
      (2L, "src3.com", "/Path/3"),   // wildcard hit at start
      (3L, "src3.com", "/Path/33"),  // tie: len(/Path/*3) == len(/Path/33) -> allow
      (4L, "src3.com", "/Path/45"))  // no rule matches; empty Disallow must
                                     // NOT read as deny-all (or allow-rule)
    assert(m(1L) == (("/Path/*3", "disallow", 0)))
    assert(m(2L) == (("/Path/*3", "disallow", 0)))
    assert(m(3L) == (("/Path/33", "allow", 1)))
    assert(m(4L) == (("", "none", 1)))
  }

  test("fixture run: every row decided, verdict classes all non-empty") {
    val out = RobotsOps.robotsFilter(spark, sf)
    val byType = out.groupBy("rule_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("allow", "disallow", "none"))
    assert(out.count() == Tables.t(spark, sf, "documents").count())
  }
}
