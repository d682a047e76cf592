package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized brute-force cross-checks (fixed seeds — deterministic) for
  * the analytics tier: the distributed renderings must equal the obvious
  * O(n²)/sequential references on arbitrary inputs, not just the
  * hand-crafted spec cases.
  */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("skyline == brute-force non-dominated set on random frames") {
    val rnd = new Random(11)
    for (_ <- 1 to 5) {
      val rows = (1L to 60L).map(k => (s"T${rnd.nextInt(3)}", k,
        (rnd.nextInt(20) + 1).toLong, rnd.nextInt(10) + 1))
      val got = graft.ops.SkylineOps.skylineOf(
        rows.toDF("p_type", "p_partkey", "price_cents", "p_size"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      def dominates(a: (String, Long, Long, Int), b: (String, Long, Long, Int)) =
        a._1 == b._1 && a._3 <= b._3 && a._4 >= b._4 &&
          (a._3 < b._3 || a._4 > b._4)
      val want = rows.filter(p => !rows.exists(q => dominates(q, p)))
        .map(p => (p._1, p._2)).toSet
      assert(got === want)
    }
  }

  test("CUSUM/EWMA folds == sequential JVM references on random series") {
    val rnd = new Random(7)
    val daily = (0L until 40L).map(day => ("t", day, rnd.nextInt(50).toLong))
    val df = daily.toDF("event_type", "day", "cnt")
    val k = daily.map(_._3).sum / daily.size
    var hi = 0L; var lo = 0L
    val wantCusum = daily.map { case (_, _, x) =>
      hi = math.max(0L, hi + x - k); lo = math.max(0L, lo + k - x)
      (hi, lo)
    }
    val gotCusum = graft.ops.TimeSeriesOps.cusumStats(df).orderBy("day")
      .collect().map(r => (r.getAs[Long]("cusum_hi"), r.getAs[Long]("cusum_lo")))
    assert(gotCusum.toSeq === wantCusum)
    val S = graft.ops.TimeSeriesOps.EwmaScale
    var level = daily.head._3 * S
    val wantEwma = daily.zipWithIndex.map { case ((_, _, x), i) =>
      if (i > 0) level = (3 * x * S + 7 * level) / 10
      level
    }
    val gotEwma = graft.ops.TimeSeriesOps.ewmaLevels(df).orderBy("day")
      .collect().map(_.getAs[Long]("level_fp"))
    assert(gotEwma.toSeq === wantEwma)
  }

  test("k-core peel == sequential JVM peel on random graphs") {
    val rnd = new Random(23)
    for (_ <- 1 to 3) {
      val n = 25
      val edges = (1 to 60).map(_ =>
        (s"v${rnd.nextInt(n)}", s"v${rnd.nextInt(n)}")).distinct
      val verts = (0 until n).map(i => s"v$i")
      val k = 2 + rnd.nextInt(2)
      val rounds = 5
      // JVM reference: synchronous peel over the simple symmetric graph
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).distinct
      var alive = verts.toSet
      var cur = sym
      var removed = Map.empty[String, (Long, Long)]
      for (r <- 1 to rounds) {
        val deg = cur.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
        val condemned = alive.filter(v => deg.getOrElse(v, 0L) < k)
        removed ++= condemned.map(v => v -> (r.toLong, deg.getOrElse(v, 0L)))
        alive --= condemned
        cur = cur.filter(e => alive(e._1) && alive(e._2))
      }
      val degF = cur.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      val want = (removed.map { case (v, (r, d)) => (v, r, d) } ++
        alive.map(v => (v, -1L, degF.getOrElse(v, 0L)))).toSet
      val got = graft.ops.GraphOps.kcorePeel(edges.toDF("src", "dst"),
          verts.toDF("id"), k, rounds)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got === want, s"k=$k")
    }
  }

  test("key-skew Gini == BigInt sorted-formula on random count sets") {
    val rnd = new Random(41)
    for (_ <- 1 to 3) {
      val counts = (1L to 30L).map(k => k -> (rnd.nextInt(9) + 1))
      val rows = counts.flatMap { case (k, n) => Seq.fill(n)(Tuple1(k)) }
      val dir = java.nio.file.Files.createTempDirectory("skewp").toString
      rows.toDF("l_orderkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = graft.ops.Relational.keySkew(spark, dir).head
        .getAs[Long]("gini_ppm")
      val xs = counts.map(_._2.toLong).sorted
      val n = BigInt(xs.size)
      val sx = BigInt(xs.sum)
      val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val want = ((BigInt(2) * six - (n + 1) * sx) * 1000000 / (n * sx))
      assert(BigInt(got) === want)
    }
  }

  test("interval sweep == brute-force stabbing counts on random intervals") {
    val rnd = new Random(5)
    val day = 86400000000000L
    // orderkey drives the crafted duration (k mod 7 + 1), so random keys
    // give random spans; dates land on random days
    val orders = (1 to 40).map { i =>
      val k = rnd.nextInt(1000).toLong
      val d0 = rnd.nextInt(30).toLong
      (k, new java.sql.Timestamp(d0 * day / 1000000L))
    }
    val dir = java.nio.file.Files.createTempDirectory("sweep").toString
    orders.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val iv = orders.map { case (k, ts) =>
      val d0 = ts.getTime * 1000000L / day
      (d0, d0 + k % 7 + 1)
    }
    val got = graft.ops.EventOps.intervalConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val deltaDays = (iv.map(_._1) ++ iv.map(_._2)).distinct.sorted
    val want = deltaDays.map { d =>
      (d, iv.count(_._1 == d).toLong, iv.count(_._2 == d).toLong,
        iv.count(x => x._1 <= d && d < x._2).toLong)
    }
    assert(got.toSeq === want)
  }

  test("attribution conservation holds on random event sets") {
    val rnd = new Random(97)
    val week = graft.ops.EventOps.AttribWindowNs
    val rows = (1L to 200L).map { id =>
      val tpe = if (rnd.nextInt(3) == 0) "purchase" else "click"
      (id, (rnd.nextLong() % (2 * week)).abs, rnd.nextInt(8).toLong + 1,
        tpe, rnd.nextInt(10000) / 100.0)
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val credited = graft.ops.EventOps.attributionOver(ev)
      .agg(coalesce(sum("credit_micro_cents"), lit(0L))).head.getLong(0)
    // JVM reference: per purchase, full value iff >= 1 click in-window
    val clicks = rows.filter(_._4 == "click")
    val want = rows.filter(_._4 == "purchase").map { p =>
      val hasClick = clicks.exists(c => c._3 == p._3 &&
        c._2 < p._2 && c._2 >= p._2 - week)
      if (hasClick) math.round(p._5 * 100) * 1000000L else 0L
    }.sum
    assert(credited === want)
  }
}
