package graft

import org.apache.spark.sql.functions._

/** The r9-verdict `weak`: `Tables.t` normalizes a timestamp-typed
  * `events.ts` to ns-epoch Long, which made `ts > watermark` a post-scan
  * computed-column predicate (`PushedFilters: []`) on exactly the
  * incremental-extract hot path. [[graft.plans.EpochNsTranspose]]
  * transposes the comparison back into the raw µs domain; these tests
  * assert both the restored pushdown and the exact ns↔µs boundary
  * semantics the transposition must preserve.
  */
class EventsPushdownSpec extends SparkSpec {

  private def eventsScanMeta(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("events.parquet"))
      .getOrElse(fail("no events parquet scan in plan"))

  private def tsIsComputed: Boolean = {
    // only the TIMESTAMP-typed fixture shape computes ts (the NANOS shape
    // reads ts natively as Long — nothing to transpose, nothing to assert)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.schema("ts").dataType != org.apache.spark.sql.types.LongType
  }

  test("watermark ts > C reaches the events scan's PushedFilters") {
    assume(tsIsComputed)
    val meta = eventsScanMeta(ops.Parity.filterIncremental(spark, sf))
    val pushed = meta.split("PushedFilters: ").last
    assert(pushed.contains("GreaterThan(ts"), meta.takeRight(600))
  }

  test("transposed predicate matches ground truth exactly at ns boundaries") {
    val t = Tables.t(spark, sf, "events")
    // rule-independent ground truth: the materialized ns values themselves
    val allTs = t.select("ts").collect().map(_.getLong(0))
    val someTs = allTs.min
    // constants ON and OFF the µs grid, in every comparison direction —
    // the floor/ceil transposition must agree with the ns-domain compare
    for (c <- Seq(someTs, someTs + 1, someTs - 1, someTs + 1000,
                  someTs + 999, someTs - 999)) {
      assert(t.filter(col("ts") > lit(c)).count() ===
        allTs.count(_ > c).toLong, s"> $c")
      assert(t.filter(col("ts") >= lit(c)).count() ===
        allTs.count(_ >= c).toLong, s">= $c")
      assert(t.filter(col("ts") < lit(c)).count() ===
        allTs.count(_ < c).toLong, s"< $c")
      assert(t.filter(col("ts") <= lit(c)).count() ===
        allTs.count(_ <= c).toLong, s"<= $c")
      assert(t.filter(col("ts") === lit(c)).count() ===
        allTs.count(_ == c).toLong, s"= $c")
    }
  }

  test("off-grid ns equality is unsatisfiable but keeps NULL semantics") {
    assume(tsIsComputed)
    val t = Tables.t(spark, sf, "events")
    val someTs = t.select("ts").limit(1).head.getLong(0)
    assert(t.filter(col("ts") === lit(someTs + 1)).count() === 0L)
  }

  test("non-UTC session is refused, not silently shifted") {
    assume(tsIsComputed)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try {
      val e = intercept[IllegalArgumentException](Tables.t(spark, sf, "events"))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
