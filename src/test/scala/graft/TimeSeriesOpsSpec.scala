package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesOps

/** Gap-fill/LOCF and MAD outliers: hand-checked grids, carry semantics,
  * lower-median convention, and robustness of the MAD flag.
  */
class TimeSeriesOpsSpec extends SparkSpec {

  import spark.implicits._
  private val H = TimeSeriesOps.HourNs

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.map { case (u, ts, id, v) => (id, ts, u, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("gapfill: dense grid per user, zeros on gaps, LOCF carries values") {
    // user 1: events in hours 10 and 13 -> grid 10..13 with 11,12 filled
    val df = TimeSeriesOps.gapfillLocf(ev(
      (1L, 10 * H + 5, 1L, 1.5), (1L, 10 * H + 9, 2L, 2.5),
      (1L, 13 * H + 1, 3L, 9.0),
      (2L, 20 * H, 4L, 7.0)))
    val got = df.orderBy("user_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      (1L, 10L, 2L, 2.5), // latest-in-bucket by (ts, event_id)
      (1L, 11L, 0L, 2.5), // carried
      (1L, 12L, 0L, 2.5),
      (1L, 13L, 1L, 9.0),
      (2L, 20L, 1L, 7.0))) // span is per-user, not global
  }

  test("gapfill: in-bucket pick breaks ts ties by event_id") {
    val df = TimeSeriesOps.gapfillLocf(ev(
      (1L, 5 * H, 1L, 1.0), (1L, 5 * H, 2L, 2.0)))
    assert(df.select("value_filled").head.getDouble(0) === 2.0)
  }

  test("MAD: hand-computed lower median, MAD and outlier count") {
    // cents: 100,200,300,400,10000 -> lower median (n=5, rank 3) = 300
    // devs: 200,100,0,100,9700 -> sorted 0,100,100,200,9700, rank 3 = 100
    // outliers: dev > 5*100 -> only 9700
    val df = TimeSeriesOps.madOutliers(ev(
      (1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 3.0),
      (1L, 4L, 4L, 4.0), (1L, 5L, 5L, 100.0)))
    val r = df.head
    assert((r.getAs[Long]("n"), r.getAs[Long]("med_cents"),
      r.getAs[Long]("mad_cents"), r.getAs[Long]("n_outliers")) ===
      ((5L, 300L, 100L, 1L)))
  }

  test("MAD is robust: one wild point does not move the estimates") {
    val base = (1L to 9L).map(i => (1L, i, i, 10.0 + (i % 3))) // 10..12
    val wild = base :+ ((1L, 10L, 10L, 1e6))
    val a = TimeSeriesOps.madOutliers(ev(base: _*)).head
    val b = TimeSeriesOps.madOutliers(ev(wild: _*)).head
    assert(a.getAs[Long]("med_cents") === b.getAs[Long]("med_cents"))
    assert(b.getAs[Long]("n_outliers") === 1L)
  }

  test("histogram maintenance: build + append serves bit-equal to raw rows") {
    spark.sql(s"DROP DATABASE IF EXISTS `${TimeSeriesOps.Db}` CASCADE")
    val full = ev(
      (1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 3.0),
      (1L, 60L, 4L, 4.0), (1L, 70L, 5L, 100.0), (1L, 80L, 6L, 2.0))
    TimeSeriesOps.buildValueHistogram(full.where(col("ts") < 50L))
    TimeSeriesOps.appendValueHistogram(spark, full.where(col("ts") >= 50L))
    val served = TimeSeriesOps.madFromHistogram(spark).collect()
    val fresh = TimeSeriesOps.madOutliers(full).collect()
    assert(served.map(_.toSeq).toSeq === fresh.map(_.toSeq).toSeq)
  }

  test("histogram fence: replayed batches refuse loudly (counts would double)") {
    spark.sql(s"DROP DATABASE IF EXISTS `${TimeSeriesOps.Db}` CASCADE")
    TimeSeriesOps.buildValueHistogram(ev((1L, 1L, 1L, 1.0)))
    val batch = ev((1L, 10L, 2L, 2.0))
    TimeSeriesOps.appendValueHistogram(spark, batch)
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.appendValueHistogram(spark, batch)
    }
    assert(e.getMessage.contains("watermark"))
    // empty batch is a no-op
    TimeSeriesOps.appendValueHistogram(spark, ev())
  }

  test("histogram serving never sees the events table") {
    spark.sql(s"DROP DATABASE IF EXISTS `${TimeSeriesOps.Db}` CASCADE")
    TimeSeriesOps.buildValueHistogram(ev((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 5.0)))
    val plan = TimeSeriesOps.madFromHistogram(spark)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("events"), "serve must read only the histogram")
  }

  test("streamed histogram folds land bit-equal to the fresh summary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    spark.sql(s"DROP DATABASE IF EXISTS `${TimeSeriesOps.Db}` CASCADE")
    val full = ev(
      (1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 3.0),
      (1L, 60L, 4L, 4.0), (1L, 70L, 5L, 100.0), (1L, 80L, 6L, 2.0))
    TimeSeriesOps.buildValueHistogram(full.where(col("ts") < 50L))
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val q = graft.streaming.StreamingOps.sinkValueHistogram(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      TimeSeriesOps.Db)
    mem.addData((4L, 60L, 1L, "click", 4.0), (5L, 70L, 1L, "click", 100.0))
    q.processAllAvailable()
    mem.addData((6L, 80L, 1L, "click", 2.0))
    q.processAllAvailable()
    q.stop()
    assert(TimeSeriesOps.madFromHistogram(spark).collect().map(_.toSeq).toSeq
      === TimeSeriesOps.madOutliers(full).collect().map(_.toSeq).toSeq)
  }

  test("event transitions: hand-checked bigram counts and ppm") {
    // user 1: a->b->b->a ; user 2: a->b  => pairs: ab×2, bb×1, ba×1
    val rows = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "b"), (3L, 30L, 1L, "b"),
      (4L, 40L, 1L, "a"), (5L, 10L, 2L, "a"), (6L, 20L, 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("evtr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // reuse the gate code path via a synthetic sf dir (ts already Long)
    val got = graft.ops.EventOps.eventTransitions(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      ("a", "b", 2L, 1000000L), // a always goes to b
      ("b", "a", 1L, 500000L),
      ("b", "b", 1L, 500000L)))
  }

  test("even-count groups use the lower median") {
    // n=4: rank (4+1) div 2 = 2 -> second smallest
    val df = TimeSeriesOps.madOutliers(ev(
      (1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0),
      (1L, 3L, 3L, 3.0), (1L, 4L, 4L, 4.0)))
    assert(df.head.getAs[Long]("med_cents") === 200L)
  }

  private def monthly(rows: (String, Long, Long)*) =
    rows.toDF("r_name", "mx", "y")

  test("OLS: exact fits, positive and negative slope (sign split)") {
    val df = TimeSeriesOps.olsFit(monthly(
      ("A", 0L, 1L), ("A", 1L, 3L), ("A", 2L, 5L), // y = 2x + 1
      ("B", 0L, 10L), ("B", 1L, 7L), ("B", 2L, 4L))) // y = -3x + 10
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(df === Array(
      ("A", 3L, 2000000L, 1000000L),
      ("B", 3L, -3000000L, 10000000L)))
  }

  test("OLS: non-exact fit truncates toward zero on both signs") {
    // (0,0),(1,1),(2,1): den=6, s_num=3 -> 500000; i_num=1 -> 166666
    // (0,1),(1,1),(2,0): s_num=-3 -> -500000; i_num=7 -> 1166666
    val df = TimeSeriesOps.olsFit(monthly(
      ("U", 0L, 0L), ("U", 1L, 1L), ("U", 2L, 1L),
      ("D", 0L, 1L), ("D", 1L, 1L), ("D", 2L, 0L)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(df === Array(("D", -500000L, 1166666L), ("U", 500000L, 166666L)))
  }

  private def daily(rows: (String, Long, Long)*) =
    rows.toDF("event_type", "day", "cnt")

  test("CUSUM: hand-traced clamped folds and the threshold alarm") {
    // counts [0,0,45,45], k = 90 div 4 = 22
    // hi: 0,0,23,46 (46 > 2k=44 -> alarm); lo: 22,44,21,0 (44 not > 44)
    val got = TimeSeriesOps.cusumStats(daily(
      ("t", 0L, 0L), ("t", 1L, 0L), ("t", 2L, 45L), ("t", 3L, 45L)))
      .orderBy("day")
      .collect().map(r => (r.getAs[Long]("cusum_hi"), r.getAs[Long]("cusum_lo"),
        r.getAs[Int]("alarm_hi"), r.getAs[Int]("alarm_lo")))
    assert(got === Array((0L, 22L, 0, 0), (0L, 44L, 0, 0),
      (23L, 21L, 0, 0), (46L, 0L, 1, 0)))
  }

  test("denseDaily: missing days land as 0-count rows, per type's own span") {
    val events = Seq(
      (1L, 0L, 1L, "x", 1.0), (2L, 2 * 86400000000000L, 1L, "x", 1.0),
      (3L, 5 * 86400000000000L, 1L, "y", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeSeriesOps.denseDaily(events).orderBy("event_type", "day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(("x", 0L, 1L), ("x", 1L, 0L), ("x", 2L, 1L),
      ("y", 5L, 1L)))
  }

  test("EWMA: seeded fold, per-step truncation, one-step-ahead residual") {
    // [10,20,40]: L1=10e6, L2=(60e6+70e6)/10=13e6, L3=(120e6+91e6)/10
    val a = TimeSeriesOps.ewmaLevels(daily(
      ("e", 0L, 10L), ("e", 1L, 20L), ("e", 2L, 40L))).orderBy("day")
      .collect().map(r => (r.getAs[Long]("level_fp"), r.getAs[Long]("resid_fp")))
    assert(a === Array((10000000L, 0L), (13000000L, 10000000L),
      (21100000L, 27000000L)))
    // truncating step: [1,2,4] -> L2=1300000, L3=(12e6+9.1e6)/10=2110000
    val b = TimeSeriesOps.ewmaLevels(daily(
      ("e", 0L, 1L), ("e", 1L, 2L), ("e", 2L, 4L))).orderBy("day")
      .collect().map(_.getAs[Long]("level_fp"))
    assert(b === Array(1000000L, 1300000L, 2110000L))
  }

  test("theil-sen: slope median equals the brute-force pairwise median") {
    val grid = TimeSeriesOps.monthlyRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = TimeSeriesOps.theilSenTrend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sc = TimeSeriesOps.OlsScale
    for ((region, rows) <- grid.groupBy(_._1)) {
      val pts = rows.map(t => (t._2, t._3))
      val slopes = (for {
        (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
      } yield {
        val s = if (y2 >= y1)
          (BigInt(y2 - y1) * sc / BigInt(x2 - x1)).toLong
        else -(BigInt(y1 - y2) * sc / BigInt(x2 - x1)).toLong
        (s, x1, x2)
      }).sorted
      val (np, fr) = got(region)
      assert(np === slopes.length.toLong)
      assert(fr === slopes(((np + 1) / 2 - 1).toInt)._1)
    }
  }

  test("rank ACF: brute-force Pearson-on-ranks agrees at every lag") {
    val grid = TimeSeriesOps.monthlyRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = TimeSeriesOps.acfLags(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    for ((region, rows) <- grid.groupBy(_._1)) {
      val ranked = rows.sortBy(t => (t._3, t._2)).zipWithIndex
        .map { case ((_, mx, _), i) => mx -> (i + 1).toLong }.toMap
      for (lag <- 1L to TimeSeriesOps.AcfMaxLag.toLong) {
        val pairs = ranked.toSeq.flatMap { case (mx, x) =>
          ranked.get(mx + lag).map(y => (x, y)) }
        if (pairs.nonEmpty) {
          val n = BigInt(pairs.length)
          val sx = BigInt(pairs.map(_._1).sum)
          val sy = BigInt(pairs.map(_._2).sum)
          val sxx = BigInt(pairs.map(p => p._1 * p._1).sum)
          val syy = BigInt(pairs.map(p => p._2 * p._2).sum)
          val sxy = BigInt(pairs.map(p => p._1 * p._2).sum)
          val num = n * sxy - sx * sy
          val dx = n * sxx - sx * sx
          val dy = n * syy - sy * sy
          val want2 = if (dx == 0 || dy == 0) BigInt(0)
            else num * num * 1000000 / (dx * dy)
          val (gn, gs, g2) = got((region, lag))
          assert(gn === pairs.length.toLong)
          assert(gs === num.signum)
          assert(g2 === want2.toLong)
        } else assert(!got.contains((region, lag)))
      }
    }
  }
}
