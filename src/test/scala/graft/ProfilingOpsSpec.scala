package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, GraphOps, Relational}

/** Round-12 profiling/analytics additions: Gini spend inequality, FD
  * profiling, burstiness (Fano), Markov stationary distribution and
  * LPA modularity — each pinned by an independent brute-force replay
  * (or a hand graph with a textbook value) on the sf0.001 fixture.
  */
class ProfilingOpsSpec extends SparkSpec {

  import spark.implicits._

  test("gini spend: brute-force rank-weighted formula per region") {
    val got = Relational.giniSpend(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("total_cents"),
          r.getAs[Long]("gini_ppm"))).toMap
    assert(got.nonEmpty)
    val spend = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val cn = Tables.t(spark, sf, "customer").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val nr = Tables.t(spark, sf, "nation").collect()
      .map(r => r.getInt(0) -> r.getInt(2)).toMap
    val rn = Tables.t(spark, sf, "region").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val byRegion = spend.toSeq
      .groupBy { case (ck, _) => rn(nr(cn(ck))) }
    for ((region, xs) <- byRegion) {
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toLong
      val s = sorted.map(BigInt(_)).sum
      val num = sorted.zipWithIndex
        .map { case (x, i) => BigInt(2L * (i + 1) - n - 1) * x }.sum
      assert(got(region)._1 === n)
      assert(got(region)._2 === s.toLong)
      assert(got(region)._3 === (num * 1000000 / (n * s)).toLong)
      assert(num >= 0)
    }
  }

  test("fd profile: brute-force distinct-dep counting on two FDs") {
    val got = Relational.fdProfile(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("viol_ppm"), r.getAs[Long]("max_card"))).toMap
    assert(got.size === 5)
    def brute(pairs: Seq[(Any, Any)]): (Long, Long, Long, Long) = {
      val cards = pairs.groupBy(_._1).map(_._2.map(_._2).distinct.length)
      val (g, v) = (cards.size.toLong, cards.count(_ > 1).toLong)
      (g, v, v * 1000000L / g, cards.max.toLong)
    }
    val cust = Tables.t(spark, sf, "customer").collect()
      .map(r => (r.getInt(2): Any, r.getString(4): Any)).toSeq
    assert(got("customer.nation->segment") === brute(cust))
    val ev = Tables.t(spark, sf, "events").collect()
      .map(r => (r.getLong(2): Any, r.getString(3): Any)).toSeq
    assert(got("events.user->type") === brute(ev))
    // nation -> segment must violate (25 nations, 5 segments, many custs)
    assert(got("customer.nation->segment")._2 > 0)
  }

  test("burstiness: brute-force Fano over the global day grid") {
    val got = EventOps.burstiness(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_days"),
          r.getAs[Long]("days_active"), r.getAs[Long]("fano_ppm"))).toMap
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"), expr(s"ts div ${EventOps.DayNs}").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d = ev.map(_._2).max - ev.map(_._2).min + 1
    for ((tpe, rows) <- ev.groupBy(_._1)) {
      val daily = rows.groupBy(_._2).map(_._2.length.toLong)
      val s = daily.sum
      val s2 = daily.map(c => BigInt(c) * c).sum
      val fano = ((BigInt(d) * s2 - BigInt(s) * s) * 1000000 /
        (BigInt(d) * s)).toLong
      assert(got(tpe) === ((s, d, daily.size.toLong, fano)))
      assert(fano >= 0)
    }
  }

  test("markov stationary: brute-force 8 exact-ppm power rounds") {
    val got = EventOps.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.t(spark, sf, "events")
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val ord = es.sortBy(e => (e._3, e._4)).map(_._2)
      ord.zip(ord.drop(1))
    }.toSeq
    val n: Map[(String, String), Long] =
      trans.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val tot: Map[String, Long] =
      n.groupBy(_._1._1).map { case (k, v) => (k, v.values.sum) }
    val p: Map[(String, String), Long] =
      n.map { case ((a, b), c) => ((a, b), c * 1000000L / tot(a)) }
    val states = ev.map(_._2).distinct.sorted
    var pi = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to EventOps.MarkovIters) {
      pi = states.map { j =>
        val acc = states.map(i =>
          BigInt(pi(i)) * BigInt(p.getOrElse((i, j), 0L))).sum
        j -> (acc / 1000000).toLong
      }.toMap
    }
    assert(got === pi)
    // mass only bleeds through floors and dangling states, never grows
    assert(got.values.sum <= 1000000L)
  }

  test("modularity: two triangles + bridge hit the textbook 5/14") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (1L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "label")
    val got = GraphOps.modularityOver(edges, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // m=7; each triangle: e_c=3, d_c=7 -> contrib 4*7*3-49=35; 4m²=196
    assert(got === Array((1L, 3L, 3L, 7L, 35L, 196L),
      (4L, 3L, 3L, 7L, 35L, 196L)))
    // Q = (35+35)/196 = 5/14
  }

  test("modularity gate: tallies obey the graph identities") {
    val rows = graft.ops.LinkOps.modularityCommunities(spark, sf).collect()
    assert(rows.nonEmpty)
    val fourM2 = rows.head.getAs[Long]("four_m2")
    assert(rows.forall(_.getAs[Long]("four_m2") === fourM2))
    val m2 = math.sqrt(fourM2 / 4.0).round // 4m² recovers m exactly
    assert(4L * m2 * m2 === fourM2)
    assert(rows.map(_.getAs[Long]("e_intra")).sum <= m2)
    assert(rows.map(_.getAs[Long]("d_sum")).sum === 2L * m2)
    for (r <- rows)
      assert(r.getAs[Long]("contrib_num") ===
        4L * m2 * r.getAs[Long]("e_intra") -
          r.getAs[Long]("d_sum") * r.getAs[Long]("d_sum"))
  }
}
