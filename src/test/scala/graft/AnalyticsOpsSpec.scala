package graft

import org.apache.spark.sql.functions._
import graft.ops.{BasketOps, EventOps, SkylineOps}

/** Association rules, skyline and linear attribution: hand-counted
  * supports/ratios, dominance/tie conventions, and credit conservation.
  */
class AnalyticsOpsSpec extends SparkSpec {

  import spark.implicits._

  test("assoc rules: hand-counted supports and truncated ppm ratios") {
    // o1{A,B} o2{A,B} o3{C,B} o4{A}: supp A=3 B=3 C=1; AB=2, CB=1; n=4
    val m = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "C"), (3L, "B"), (4L, "A"), (4L, "A")) // dup row must not count
      .toDF("l_orderkey", "p_brand")
    val got = BasketOps.rulesOver(m, 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // conf A->B = 2e6 div 3 = 666666; lift = 2*4e6 div 9 = 888888
    assert(got === Array(
      ("A", "B", 2L, 3L, 3L, 666666L, 888888L),
      ("B", "A", 2L, 3L, 3L, 666666L, 888888L)))
  }

  test("assoc rules: below-min-support pairs are cut, singletons never pair") {
    val m = Seq((1L, "A"), (1L, "B"), (2L, "C")).toDF("l_orderkey", "p_brand")
    assert(BasketOps.rulesOver(m, 2L).count() === 0L)
    assert(BasketOps.rulesOver(m, 1L).count() === 2L) // AB both ways
  }

  private def parts(rows: (String, Long, Long, Int)*) =
    rows.toDF("p_type", "p_partkey", "price_cents", "p_size")

  test("skyline: dominance needs one strict edge; duplicates both survive") {
    val df = SkylineOps.skylineOf(parts(
      ("T", 1L, 100L, 10), // kept
      ("T", 2L, 100L, 10), // exact duplicate: neither dominates -> kept
      ("T", 3L, 150L, 8),  // dominated by 1 (cheaper AND bigger)
      ("T", 4L, 150L, 12), // kept (pricier but bigger than all cheaper)
      ("T", 5L, 200L, 12), // dominated by 4 (same size, strictly pricier)
      ("T", 6L, 90L, 5),   // cheapest -> kept
      ("U", 7L, 500L, 1))) // separate group: alone -> kept
    assert(df.collect().map(_.getLong(1)).toSeq === Seq(1L, 2L, 4L, 6L, 7L))
  }

  test("skyline: equal price with strictly larger size dominates") {
    val df = SkylineOps.skylineOf(parts(
      ("T", 1L, 100L, 10), ("T", 2L, 100L, 12)))
    assert(df.collect().map(_.getLong(1)).toSeq === Seq(2L))
  }

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("attribution: equal split, remainder to the most recent click") {
    // 3 clicks before a 1-cent purchase: 1e6 micro-cents over 3 ->
    // 333333 each, remainder 1 to the latest click (id 3)
    val df = EventOps.attributionOver(ev(
      (1L, 1L, 1L, "click", 0.0), (2L, 2L, 1L, "click", 0.0),
      (3L, 3L, 1L, "click", 0.0), (4L, 10L, 1L, "purchase", 0.01)))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got === Array((1L, 333333L), (2L, 333333L), (3L, 333334L)))
  }

  test("attribution: lookback window bounds and user isolation") {
    val week = EventOps.AttribWindowNs
    val df = EventOps.attributionOver(ev(
      (1L, 0L, 1L, "click", 0.0),              // exactly 7d before: included
      (2L, week, 1L, "purchase", 1.0),          // 100 cents
      (3L, week, 1L, "click", 0.0),             // same instant: NOT before
      (4L, week - 1, 2L, "click", 0.0)))        // other user: no credit
    val got = df.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got === Array((1L, 1L, 100000000L)))
  }

  test("attribution conserves every attributed purchase's value exactly") {
    val events = graft.Tables.t(spark, sf, "events")
    val credited = EventOps.attributionOver(events)
      .agg(sum("credit_micro_cents")).head.getLong(0)
    // total over purchases that HAVE >=1 click in-window
    val pu = events.filter(col("event_type") === "purchase").select(
      col("event_id").as("pid"), col("user_id").as("u"), col("ts").as("pts"),
      expr(s"CAST(round(value * 100) AS BIGINT) * ${EventOps.AttribScale}")
        .as("ct"))
    val cl = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val attributed = pu.join(cl, col("cu") === col("u") &&
        col("cts") < col("pts") &&
        col("cts") >= col("pts") - lit(EventOps.AttribWindowNs), "leftsemi")
      .agg(sum("ct")).head.getLong(0)
    assert(credited === attributed)
  }
}
