package graft

import org.apache.spark.sql.functions._
import graft.ops.ExpectationOps._

/** Expectations engine: crafted-violation detection (the gate's fixture is
  * clean, so detection must be proven on frames that actually violate),
  * null semantics per check type, and the uniqueness/null no-double-count
  * rule.
  */
class ExpectationOpsSpec extends SparkSpec {

  import spark.implicits._

  private def verdictMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => (
      r.getAs[String]("check_id"),
      (r.getAs[Long]("n_rows"), r.getAs[Long]("violations")))).toMap

  test("crafted violations are counted exactly, per constraint") {
    // 6 rows: one dup key pair, one null key, one null fk, one bad enum,
    // one out-of-range value
    val bad = Seq(
      (Some(1L), Some(10L), "O", 5.0),
      (Some(1L), Some(11L), "F", 5.0),   // dup key
      (None,     Some(10L), "P", 5.0),   // null key
      (Some(2L), None,      "O", 5.0),   // null fk
      (Some(3L), Some(10L), "X", 5.0),   // bad enum
      (Some(4L), Some(10L), "O", -1.0))  // below range
      .toDF("k", "fk", "status", "amt")
    val out = withRates(tableVerdicts(bad, "bad", Seq(
      notNull("bad.fk.not_null", col("fk")),
      inSet("bad.status.in_set", col("status"), Seq("O", "F", "P")),
      between("bad.amt.non_negative", col("amt"), 0.0, 1e12)),
      uniqueCol = Some(("bad.k.unique", col("k")))))
    val m = verdictMap(out)
    assert(m("bad.fk.not_null") == ((6L, 1L)))
    assert(m("bad.status.in_set") == ((6L, 1L)))
    assert(m("bad.amt.non_negative") == ((6L, 1L)))
    // uniqueness: 6 rows − 4 distinct non-null keys − 1 null key = 1
    // (the null key reports ONLY under its own not-null check, were one
    // declared on k — never as a uniqueness violation)
    assert(m("bad.k.unique") == ((6L, 1L)))
    // rates: 1 violation in 6 rows → 166_666 ppm, truncating
    val ppm = out.filter(col("check_id") === "bad.k.unique")
      .select("viol_ppm").as[Long].head()
    assert(ppm == 166666L)
    assert(out.filter(col("ok") === 1).count() == 0L)
  }

  test("referential check counts dangling non-null keys only") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = withRates(refVerdict("fact.fk.ref_dim", fact, col("fk"),
      dim, col("pk"), "fact"))
    val m = verdictMap(out)
    // 99 dangles; the null fk is the not-null check's business
    assert(m("fact.fk.ref_dim") == ((4L, 1L)))
  }

  test("clean frame passes every check with zero violations") {
    val good = Seq((1L, 10L, "O", 5.0), (2L, 11L, "F", 6.0))
      .toDF("k", "fk", "status", "amt")
    val out = withRates(tableVerdicts(good, "good", Seq(
      notNull("good.fk.not_null", col("fk")),
      inSet("good.status.in_set", col("status"), Seq("O", "F", "P")),
      between("good.amt.non_negative", col("amt"), 0.0, 1e12)),
      uniqueCol = Some(("good.k.unique", col("k")))))
    assert(out.filter(col("ok") =!= 1).count() == 0L)
    assert(out.filter(col("violations") =!= 0L).count() == 0L)
  }

  test("fixture suite runs green end-to-end (7 verdicts, all exact)") {
    val out = graft.ops.ExpectationOps.expectations(spark, sf)
    assert(out.count() == 7L)
    // fixture is generated consistent: expect all-pass
    assert(out.filter(col("ok") =!= 1).count() == 0L)
  }
}
