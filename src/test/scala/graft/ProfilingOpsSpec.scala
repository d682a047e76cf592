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

  test("skipgram pairs: brute-force window-2 counting on the fixture") {
    val got = graft.ops.TextOps.skipgramPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length === 100)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (r <- Tables.t(spark, sf, "documents").select("text").collect()) {
      val tk = r.getString(0).trim.split("\\s+")
      for (i <- tk.indices; j <- math.max(0, i - 2) until i) {
        counts((tk(i), tk(j))) = counts.getOrElse((tk(i), tk(j)), 0L) + 1
        counts((tk(j), tk(i))) = counts.getOrElse((tk(j), tk(i)), 0L) + 1
      }
    }
    val top = counts.toSeq.map { case ((w, c), n) => (w, c, n) }
      .sortBy { case (w, c, n) => (-n, w, c) }.take(100)
    assert(got.toSeq === top)
  }

  test("zipf profile: bucket law and token-mass conservation") {
    val rows = graft.ops.TextOps.zipfProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    for ((src, ds) <- docs.groupBy(_._1)) {
      val freq = ds.flatMap(_._2.trim.split("\\s+"))
        .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      val ranked = freq.toSeq.sortBy { case (tok, c) => (-c, tok) }
        .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
      val buckets = ranked
        .groupBy { case (rnk, _) => 63 - java.lang.Long
          .numberOfLeadingZeros(rnk) }
        .map { case (b, v) =>
          (b.toLong, v.length.toLong, v.map(_._2).sum) }
      val mine = rows.filter(_._1 == src)
      assert(mine.map(m => (m._2, m._3, m._4)).sortBy(_._1) ===
        buckets.toSeq.sortBy(_._1))
      // decay chain: each row's ppm replays next/cur; last row is -1
      val byB = mine.sortBy(_._2)
      for (w <- byB.sliding(2) if w.length == 2)
        assert(w(0)._5 === w(1)._4 * 1000000L / w(0)._4)
      assert(byB.last._5 === -1L)
    }
  }

  test("quantile align: brute-force percentile grid per source") {
    val got = graft.ops.TextOps.quantileAlign(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def grid(xs: Seq[Long]): Map[Int, Long] = {
      val sorted = xs.sorted
      (0 to 100).map { p =>
        val k = math.max(1L, (p.toLong * sorted.length + 99) / 100)
        p -> sorted((k - 1).toInt)
      }.toMap
    }
    val glob = grid(docs.map(_._2).toSeq)
    val srcs = docs.groupBy(_._1)
    assert(got.size === srcs.size * 101)
    for ((src, ds) <- srcs; (p, v) <- grid(ds.map(_._2).toSeq))
      assert(got((src, p)) === ((v, glob(p), v - glob(p))))
  }

  test("holt smoothing: brute-force dyadic fold per region") {
    val got = graft.ops.TimeSeriesOps.holtSmooth(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    val g = graft.ops.TimeSeriesOps.monthlyRevenue(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val s = graft.ops.TimeSeriesOps.HoltScale
    for ((region, rows) <- g.groupBy(_._1._1)) {
      val byMx = rows.map { case ((_, m), y) => (m, y) }.toMap
      val (mn, mh) = (byMx.keys.min, byMx.keys.max)
      var (l, b) = (0L, 0L)
      for (m <- mn to mh) {
        val y = byMx.getOrElse(m, 0L)
        if (m == mn) { l = y * s; b = 0L }
        else {
          val l2 = (y * s + l + b) >> 1
          b = ((l2 - l) + b) >> 1
          l = l2
        }
        assert(got((region, m)) === ((y, l, b)),
          s"mismatch at $region month $m")
      }
    }
  }

  test("eccentricity gate: direction duality and walk bounds") {
    val ecc = graft.ops.LinkOps.eccentricityDomains(spark, sf).collect()
    val har = graft.ops.LinkOps.harmonicCentrality(spark, sf).collect()
    assert(ecc.nonEmpty)
    // ordered reachable pairs counted from sources == counted at targets
    assert(ecc.map(_.getAs[Long]("n_reached")).sum ===
      har.map(_.getAs[Long]("n_reachers")).sum)
    for (r <- ecc) {
      val (n, ds, e) = (r.getAs[Long]("n_reached"),
        r.getAs[Long]("dist_sum"), r.getAs[Long]("ecc"))
      assert(e >= 0 && e <= 6) // the bounded-round contract
      assert(ds >= n && (n > 0 || ds == 0))
      assert(e <= ds && (n == 0 || e >= 1))
    }
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
