package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.ops.ScdOps

/** SCD Type 2 history: hand-checked run collapse, incremental maintenance
  * invariants (same-status extension, new-key start, version continuity),
  * the append-only fence, and closed-partition immutability.
  */
class ScdOpsSpec extends SparkSpec {

  import spark.implicits._

  private def feed(rows: (Long, String, Long, Long)*): DataFrame =
    rows.toDF("user_id", "status", "ts", "event_id")

  private def hist(df: DataFrame): Seq[(Long, String, Long, Option[Long], Int, Int)] =
    df.orderBy("user_id", "version")
      .select("user_id", "status", "valid_from", "valid_to", "version",
        "is_current")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getInt(4),
        r.getInt(5)))

  test("run collapse: consecutive same statuses fold into one version") {
    val f = feed(
      (1L, "free", 10L, 100L), (1L, "free", 20L, 101L),
      (1L, "paid", 30L, 102L), (1L, "paid", 40L, 103L),
      (1L, "free", 50L, 104L),
      (2L, "paid", 15L, 200L))
    assert(hist(ScdOps.history(f)) === Seq(
      (1L, "free", 10L, Some(30L), 1, 0),
      (1L, "paid", 30L, Some(50L), 2, 0),
      (1L, "free", 50L, None, 3, 1),
      (2L, "paid", 15L, None, 1, 1)))
  }

  test("intervals are half-open and contiguous per user") {
    val f = feed((1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "c", 3L, 3L))
    val h = hist(ScdOps.history(f))
    // each valid_to equals the next version's valid_from
    h.sliding(2).foreach {
      case Seq((_, _, _, Some(to), _, _), (_, _, from, _, _, _)) =>
        assert(to === from)
      case _ => ()
    }
    assert(h.last._4.isEmpty && h.last._6 === 1)
  }

  private val db = "scd2_spec"

  private def rebuilt(full: DataFrame, splitTs: Long): (DataFrame, DataFrame) =
    (full.where(col("ts") < splitTs), full.where(col("ts") >= splitTs))

  test("incremental fold is bit-equal to the fresh collapse") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val full = feed(
      (1L, "free", 10L, 100L), (1L, "paid", 30L, 102L),
      (1L, "paid", 60L, 105L), (1L, "gone", 70L, 106L), // change + extend
      (2L, "paid", 15L, 200L), (2L, "paid", 65L, 201L), // pure extension
      (3L, "free", 61L, 300L), (3L, "paid", 62L, 301L), // new user in batch
      (4L, "free", 20L, 400L)) // untouched by the batch
    val (corpus, batch) = rebuilt(full, 55L)
    ScdOps.buildScd2(corpus, db)
    ScdOps.applyScd2Batch(spark, batch, db)
    val fresh = hist(ScdOps.history(full))
    assert(hist(ScdOps.storedHistory(spark, db)) === fresh)
    // extension did NOT open a new version: user 2 has exactly one row
    assert(fresh.count(_._1 == 2L) === 1)
    // new user starts at version 1; continued user reaches version 3
    assert(fresh.filter(_._1 == 3L).map(_._5) === Seq(1, 2))
    assert(fresh.filter(_._1 == 1L).map(_._5) === Seq(1, 2, 3))
  }

  test("append-only fence: replayed and out-of-order batches refuse loudly") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val full = feed((1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "c", 30L, 3L))
    val (corpus, batch) = rebuilt(full, 25L)
    ScdOps.buildScd2(corpus, db)
    ScdOps.applyScd2Batch(spark, batch, db)
    val e = intercept[IllegalArgumentException] {
      ScdOps.applyScd2Batch(spark, batch, db) // replay
    }
    assert(e.getMessage.contains("watermark"))
    intercept[IllegalArgumentException] {
      ScdOps.applyScd2Batch(spark, feed((9L, "x", 5L, 9L)), db) // out of order
    }
    // empty batch is a no-op, not a refusal
    ScdOps.applyScd2Batch(spark, feed(), db)
  }

  test("closed partition is append-only: preexisting files stay identical") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val full = feed(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), // closed row in the build
      (1L, "c", 60L, 3L)) // batch closes another
    val (corpus, batch) = rebuilt(full, 50L)
    ScdOps.buildScd2(corpus, db)
    def closedFiles(): Map[String, (Long, Long)] = {
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$db`.`${ScdOps.HistTable}`")
        .where(col("col_name") === "Location").head.getString(1)
      val dir = new java.io.File(new java.net.URI(loc).getPath, "closed=1")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    }
    val before = closedFiles()
    assert(before.nonEmpty)
    ScdOps.applyScd2Batch(spark, batch, db)
    val after = closedFiles()
    assert(after.size > before.size, "append must add closed files")
    before.foreach { case (n, sig) => assert(after(n) === sig,
      s"preexisting closed file $n was rewritten") }
  }

  test("streaming fold lands bit-equal to a fresh full build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val full = feed(
      (1L, "free", 10L, 100L), (1L, "paid", 30L, 102L),
      (1L, "paid", 60L, 105L), (1L, "gone", 90L, 106L),
      (2L, "paid", 15L, 200L), (2L, "paid", 65L, 201L),
      (3L, "free", 61L, 300L), (3L, "paid", 95L, 301L))
    ScdOps.buildScd2(full.where(col("ts") < 50L), db)
    val mem = MemoryStream[(Long, String, Long, Long)]
    val q = graft.streaming.StreamingOps.sinkScd2(
      mem.toDF().toDF("user_id", "status", "ts", "event_id"), db)
    mem.addData((1L, "paid", 60L, 105L), (2L, "paid", 65L, 201L),
      (3L, "free", 61L, 300L))
    q.processAllAvailable()
    mem.addData((1L, "gone", 90L, 106L), (3L, "paid", 95L, 301L))
    q.processAllAvailable()
    q.stop()
    assert(hist(ScdOps.storedHistory(spark, db)) === hist(ScdOps.history(full)))
  }

  test("committed-epoch redelivery no-ops; an uncommitted crash window is loud") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    ScdOps.buildScd2(feed((1L, "a", 10L, 1L)), db)
    val batch = feed((1L, "b", 20L, 2L))
    graft.streaming.StreamingOps.processScd2Batch(batch, db, epochId = 3L)
    // committed replay of the same epoch: silently absorbed
    graft.streaming.StreamingOps.processScd2Batch(batch, db, epochId = 3L)
    assert(hist(ScdOps.storedHistory(spark, db)).size === 2)
    // crash window: the fence advanced but the epoch never committed —
    // a redelivery under a LATER epoch must refuse loudly, not re-apply
    val b2 = feed((1L, "c", 30L, 3L))
    ScdOps.applyScd2Batch(spark, b2, db) // fold landed, epoch not set
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.processScd2Batch(b2, db, epochId = 4L)
    }
    assert(e.getMessage.contains("watermark"))
  }

  test("fence advances before the writes: a crashed batch's retry refuses") {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    ScdOps.buildScd2(feed((1L, "a", 10L, 1L)), db)
    val wm0 = store.Warehouse.readTablePropLong(spark, db, ScdOps.HistTable,
      ScdOps.WmTsProp, "")
    assert(wm0 === 10L)
    ScdOps.applyScd2Batch(spark, feed((1L, "b", 20L, 2L)), db)
    assert(store.Warehouse.readTablePropLong(spark, db, ScdOps.HistTable,
      ScdOps.WmTsProp, "") === 20L)
  }
}
