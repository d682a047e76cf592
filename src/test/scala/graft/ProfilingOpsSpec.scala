package graft

import org.apache.spark.sql.functions._
import graft.ops.{BasketOps, EventOps, GraphOps, Relational}

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

  /** The domain graph rebuilt from the link-extract gate's own output —
    * the independent edge list the graph-gate brute forces run on.
    */
  private lazy val domainEdges: Set[(String, String)] =
    graft.ops.LinkOps.linkExtract(spark, sf).collect()
      .filter(_.getAs[Int]("is_external") == 1)
      .map(r => (r.getAs[String]("page_domain"),
        r.getAs[String]("target_domain")))
      .filter(e => e._1 != e._2).toSet

  test("assortativity: brute-force symmetric degree Pearson") {
    val r = graft.ops.LinkOps.assortativityDomains(spark, sf).head
    val und = domainEdges.map { case (a, b) =>
      if (a < b) (a, b) else (b, a) }
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val pts = und.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m2 = pts.size.toLong
    val sx = pts.map(_._1).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val num = BigInt(m2) * sxy - BigInt(sx) * sx
    val den = BigInt(m2) * sxx - BigInt(sx) * sx
    val ppm = if (den == 0) 0L
      else if (num < 0) -((-num * 1000000) / den).toLong
      else (num * 1000000 / den).toLong
    assert(r.getAs[Long]("n_edges") === und.size.toLong)
    assert(r.getAs[Long]("assort_ppm") === ppm)
    assert(math.abs(ppm) <= 1000000L)
  }

  test("reciprocity: brute-force reversed-edge membership") {
    val r = graft.ops.LinkOps.reciprocityDomains(spark, sf).head
    val nRec = domainEdges.count(e => domainEdges((e._2, e._1))).toLong
    assert(r.getAs[Long]("n_edges") === domainEdges.size.toLong)
    assert(r.getAs[Long]("n_reciprocated") === nRec)
    assert(r.getAs[Long]("recip_ppm") ===
      nRec * 1000000L / domainEdges.size)
  }

  test("eccentricity: brute-force 6-round BFS per source") {
    val got = graft.ops.LinkOps.eccentricityDomains(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val verts = graft.ops.LinkOps.linkExtract(spark, sf).collect()
      .flatMap(r => Seq(r.getAs[String]("page_domain")) ++
        (if (r.getAs[Int]("is_external") == 1)
          Seq(r.getAs[String]("target_domain")) else Nil)).toSet
    val adj = domainEdges.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._2)) }
    assert(got.keySet === verts)
    for (s0 <- verts) {
      val dist = scala.collection.mutable.Map(s0 -> 0L)
      var frontier = Set(s0)
      for (i <- 1 to 6) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = i.toLong)
      }
      val reached = dist.filter(_._1 != s0).values.toSeq
      assert(got(s0) === ((reached.size.toLong, reached.sum,
        if (reached.isEmpty) 0L else reached.max)), s"source $s0")
    }
  }

  test("brand communities: brute-force affinity edges + 4 LPA rounds") {
    val got = BasketOps.brandCommunities(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pb = Tables.t(spark, sf, "part").select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val baskets = li.map { case (o, p) => (o, pb(p)) }.distinct
    val byOrder = baskets.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
    for (bs <- byOrder; i <- bs.indices; j <- i + 1 until bs.length
         if bs(i) < bs(j))
      pairCnt((bs(i), bs(j))) = pairCnt.getOrElse((bs(i), bs(j)), 0L) + 1
    val np = pairCnt.size.toLong
    val sc = pairCnt.values.sum
    val edges = pairCnt.filter { case (_, c) => 4 * c * np >= 5 * sc }
      .keySet
    val verts = baskets.map(_._2).toSet
    val sym = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    var labels: Map[String, String] = verts.map(v => v -> v).toMap
    for (_ <- 1 to BasketOps.BrandLpaIters)
      labels = verts.map { v =>
        val votes = sym.getOrElse(v, Set.empty).toSeq.map(labels)
          .groupBy(identity).map { case (l, o) => (l, o.size) }
        if (votes.isEmpty) v -> labels(v)
        else v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    val sizes = labels.values.groupBy(identity)
      .map { case (l, o) => (l, o.size.toLong) }
    assert(got === labels.map { case (v, l) => v -> (l, sizes(l)) })
  }

  test("funnel latency: brute-force first-touch latency stats") {
    val got = EventOps.funnelLatency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = Tables.t(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def firstAfter(tpe: String, prev: Map[Long, Long]): Map[Long, Long] =
      ev.filter(e => e._2 == tpe && prev.contains(e._1) &&
          e._3 > prev(e._1))
        .groupBy(_._1).map { case (u, es) => (u, es.map(_._3).min) }
    val t1 = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => (u, es.map(_._3).min) }
    val t2 = firstAfter("click", t1)
    val t3 = firstAfter("purchase", t2)
    def stats(lat: Seq[Long]): (Long, Long, Long, Long, Long) = {
      val sorted = lat.sorted
      (lat.size.toLong, lat.map(BigInt(_)).sum.toLong / lat.size,
        sorted(((lat.size + 1) / 2 - 1).toInt), sorted.head, sorted.last)
    }
    assert(got("1_signup_to_click") ===
      stats(t2.map { case (u, t) => (t - t1(u)) / 1000000 }.toSeq))
    assert(got("2_click_to_purchase") ===
      stats(t3.map { case (u, t) => (t - t2(u)) / 1000000 }.toSeq))
  }

  test("quantile align lifecycle: delta fold ≡ fresh, redelivery-safe") {
    import graft.ops.{IncrementalClusters, TextOps}
    val db = "graft_qa_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val front = IncrementalClusters.corpusDocsRange(spark, sf)
    val batch = IncrementalClusters.batchDocsRange(spark, sf)
    TextOps.buildQaModel(front, db)
    graft.pipeline.DeltaModelIngest.append(spark, TextOps.qaFamily(db),
      "spec", 0L, TextOps.histOfDocs(batch))
    // crash-window redelivery: the same (source, epoch) lands again
    graft.pipeline.DeltaModelIngest.append(spark, TextOps.qaFamily(db),
      "spec", 0L, TextOps.histOfDocs(batch))
    val served = TextOps.quantileAlignFromStore(spark, db).collect()
      .map(_.toSeq).toSet
    val fresh = TextOps.quantileAlign(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(served === fresh)
    assert(served.nonEmpty)
  }

  test("source similarity: brute-force gram-set Jaccard per pair") {
    val got = graft.ops.TextOps.sourceSimilarity(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        val tk = t.trim.split("\\s+")
        if (tk.length < 3) Array.empty[String]
        else tk.sliding(3).map(_.mkString(" ")).toArray
      }.toSet
    }
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toLong if inter > 0
    } yield ((a, b), (sets(a).size.toLong, sets(b).size.toLong, inter,
      inter * 1000000L / (sets(a).size + sets(b).size - inter)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("ivf nprobe curve: monotone recall/cost, exact arithmetic") {
    val rows = graft.ops.VectorOps.ivfNprobeCurve(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 4, 8))
    val nExact = graft.ops.VectorOps.knnCosineTopk(spark, sf).count()
    for ((np, nc, ne, nh, rp) <- rows) {
      assert(ne === nExact)
      assert(nh <= ne && nh >= 0 && nc >= nh)
      assert(rp === nh * 1000000L / ne)
    }
    for (w <- rows.sliding(2) if w.length == 2) {
      assert(w(0)._2 <= w(1)._2, "candidate volume must grow with nprobe")
      assert(w(0)._4 <= w(1)._4, "recall must not fall as cells widen")
    }
  }

  test("weekday profile: brute-force counts and Thursday epoch anchor") {
    val got = EventOps.weekdayProfile(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 1970-01-01 (epoch day 0) is a Thursday: (0 + 3) % 7 = 3 under
    // the Monday=0 convention the op documents
    assert((0L + 3) % 7 === 3L)
    val cells = ev.groupBy(e =>
      (e._1, (e._2 / EventOps.DayNs + 3) % 7))
    val byType = ev.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    assert(got.size === cells.size)
    for ((key, es) <- cells) {
      val n = es.size.toLong
      assert(got(key) === ((n, n * 1000000L / byType(key._1),
        es.map(_._3).sum)))
    }
  }

  test("vocab coverage: brute-force rank cutoffs, monotone curve") {
    val rows = graft.ops.TextOps.vocabCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(100L, 1000L, 10000L))
    val freq = Tables.t(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .groupBy(identity).map { case (w, o) => (w, o.length.toLong) }
    val ranked = freq.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._2)
    val total = ranked.sum
    for ((n, nTypes, tot, cov, ppm) <- rows) {
      assert(nTypes === ranked.length.toLong)
      assert(tot === total)
      assert(cov === ranked.take(n.toInt).sum)
      assert(ppm === cov * 1000000L / total)
    }
    for (w <- rows.sliding(2) if w.length == 2)
      assert(w(0)._4 <= w(1)._4)
  }

  test("oov rate: brute-force front-vocab membership per batch source") {
    val got = graft.ops.TextOps.oovRate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mx = docs.map(_._1).max
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val vocab = docs.filter(_._1 * 3 < mx * 2).flatMap(d => toks(d._3))
      .toSet
    val batch = docs.filter(_._1 * 3 >= mx * 2)
    assert(batch.nonEmpty && got.nonEmpty)
    for ((src, ds) <- batch.groupBy(_._2)) {
      val ws = ds.flatMap(d => toks(d._3))
      val oov = ws.count(!vocab(_)).toLong
      val oovTypes = ws.distinct.count(!vocab(_)).toLong
      assert(got(src) === ((ws.length.toLong, oov, oovTypes,
        oov * 1000000L / ws.length)))
    }
  }

  test("quantile align forget: negative fold ≡ retrain-without, " +
      "idempotent, loud on over-delete") {
    import graft.ops.{IncrementalClusters, TextOps}
    val db = "graft_qa_fgt_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val all = Tables.t(spark, sf, "documents")
    val departing = TextOps.histOfDocs(
      IncrementalClusters.batchDocsRange(spark, sf))
      .select(col("source"), col("n_chars"), (-col("c")).as("c"))
    TextOps.buildQaModel(all, db)
    graft.pipeline.DeltaModelIngest.append(spark, TextOps.qaFamily(db),
      "fgt", 0L, departing)
    // redelivered deletion: same (source, epoch) — must not double-forget
    graft.pipeline.DeltaModelIngest.append(spark, TextOps.qaFamily(db),
      "fgt", 0L, departing)
    val served = TextOps.quantileAlignFromStore(spark, db).collect()
      .map(_.toSeq).toSet
    val fresh = TextOps.quantileAlignFromHist(TextOps.histOfDocs(
      IncrementalClusters.corpusDocsRange(spark, sf))).collect()
      .map(_.toSeq).toSet
    assert(served === fresh)
    // a SECOND forget of the same slice (new epoch) drives cells
    // negative — serving must refuse loudly, never misalign silently
    graft.pipeline.DeltaModelIngest.append(spark, TextOps.qaFamily(db),
      "fgt", 1L, departing)
    val e = intercept[IllegalArgumentException] {
      TextOps.quantileAlignFromStore(spark, db).collect()
    }
    assert(e.getMessage.contains("negative histogram cell"))
  }

  test("brand modularity: tallies obey the graph identities") {
    val rows = BasketOps.brandModularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val fourM2 = rows.head.getAs[Long]("four_m2")
    val m = math.sqrt(fourM2 / 4.0).round
    assert(4L * m * m === fourM2)
    assert(rows.map(_.getAs[Long]("e_intra")).sum <= m)
    assert(rows.map(_.getAs[Long]("d_sum")).sum === 2L * m)
    for (r <- rows)
      assert(r.getAs[Long]("contrib_num") ===
        4L * m * r.getAs[Long]("e_intra") -
          r.getAs[Long]("d_sum") * r.getAs[Long]("d_sum"))
    // one tally row per community the LPA gate reports
    val comms = BasketOps.brandCommunities(spark, sf).collect()
      .map(_.getAs[String]("community")).toSet
    assert(rows.map(_.getAs[String]("community")).toSet === comms)
  }

  test("position attribution: conservation and the 40/20/40 split") {
    val got = EventOps.attributionPosition(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.nonEmpty)
    val ev = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    val clicks = ev.filter(_._3 == "click")
    val credits = scala.collection.mutable.Map.empty[Long, Long]
    var conserved = 0L
    var expected = 0L
    for ((pid, u, _, pts, v) <- ev.filter(_._3 == "purchase")) {
      val total = math.round(v * 100) * EventOps.AttribScale
      val cs = clicks.filter(c => c._2 == u && c._4 < pts &&
        c._4 >= pts - EventOps.AttribWindowNs)
        .sortBy(c => (c._4, c._1)) // ascending: first touch first
      val n = cs.length
      if (n > 0) {
        expected += total
        val shares: Seq[Long] =
          if (n == 1) Seq(total)
          else if (n == 2) Seq(total / 2, total - total / 2)
          else {
            val leg = total * 2 / 5
            val pool = total - 2 * leg
            val base = pool / (n - 2)
            // most recent middle (desc rank 2) takes the remainder
            Seq(leg) ++ (0 until n - 2).map(i =>
              base + (if (i == n - 3) pool - base * (n - 2) else 0L)) ++
              Seq(leg)
          }
        conserved += shares.sum
        for ((c, sh) <- cs.zip(shares))
          credits(c._1) = credits.getOrElse(c._1, 0L) + sh
      }
    }
    assert(conserved === expected) // every purchase fully credited
    assert(got.toMap === credits.toMap)
  }

  test("rfm migration: brute-force half-split quintile transitions") {
    val got = BasketOps.rfmMigration(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"),
        expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 div " +
          s"${EventOps.DayNs}").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val half = (orders.map(_._2).min + orders.map(_._2).max) / 2
    def quint(rows: Seq[(Long, Long)]): Map[Long, Int] = {
      val sorted = rows.sortBy { case (k, m) => (m, k) }
      val n = sorted.length.toLong
      sorted.zipWithIndex.map { case ((k, _), i) =>
        k -> (1 + (5 * i.toLong) / n).toInt }.toMap
    }
    def spend(p: ((Long, Long, Long)) => Boolean) =
      orders.filter(p).groupBy(_._1)
        .map { case (k, v) => (k, v.map(_._3).sum) }.toSeq
    val q1 = quint(spend(_._2 <= half))
    val q2 = quint(spend(_._2 > half))
    val cells = q1.keySet.intersect(q2.keySet).toSeq
      .map(k => (q1(k), q2(k))).groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val rowTot = cells.groupBy(_._1._1)
      .map { case (q, v) => (q, v.values.sum) }
    assert(got === cells.map { case (k, n) =>
      k -> (n, n * 1000000L / rowTot(k._1)) })
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
