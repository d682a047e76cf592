package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series regularization and robust-statistics operators over the
  * events stream — the analytics-serving legs a metrics pipeline needs
  * between raw events and a dashboard: a dense per-key hourly grid with
  * gaps filled by last observation carried forward, and robust outlier
  * detection via median absolute deviation (the estimator that survives
  * the very outliers a mean/stddev z-score is wrecked by).
  *
  * Everything is exact: hour buckets are integer division on the ns-epoch
  * Long, carried values pass through untouched (the LOCF pick is a
  * deterministic row, never an aggregate over doubles), and the MAD runs
  * on integer cents with lower-median selection by row_number — so the
  * DuckDB oracle replays both gates cell-for-cell.
  */
object TimeSeriesOps {

  val HourNs: Long = 3600L * 1000L * 1000L * 1000L

  /** Robust-flag threshold: |x − med| > [[MadK]] · MAD. */
  val MadK = 5L

  /** Dense per-user hourly grid over each user's own active range:
    * n_events per bucket and the latest value carried forward (LOCF).
    *
    * Scale shape: ONE (user, bucket)-keyed exchange carries the bucket
    * collapse (row_number pick + count in the same pass); the grid
    * explode is output-sized; the join and the LOCF window are
    * user-keyed. The grid is as large as sum of per-user spans — the
    * OUTPUT, so nothing here is superlinear in the input. At 100 TB the
    * span grid is bounded by keys × horizon, not by event volume.
    */
  def gapfillLocf(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      expr(s"ts div $HourNs").as("bucket"), col("ts"), col("event_id"),
      col("value"))
    val byBucket = Window.partitionBy("user_id", "bucket")
    val bkt = ev
      .withColumn("rn",
        row_number().over(byBucket.orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n", count(lit(1)).over(byBucket))
      .where(col("rn") === 1)
      .select(col("user_id"), col("bucket"), col("n"), col("value").as("v"))
    val grid = bkt.groupBy("user_id")
      .agg(min("bucket").as("mn"), max("bucket").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val locf = Window.partitionBy("user_id").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bkt, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(locf).as("value_filled"))
  }

  /** Gate `q_gapfill_locf`. */
  def gapfillLocfQuery(s: SparkSession, d: String): DataFrame =
    gapfillLocf(graft.Tables.t(s, d, "events"))
      .orderBy("user_id", "bucket")

  /** Per-type robust outlier summary: lower median and MAD over integer
    * cents, counting rows past [[MadK]] MADs.
    *
    * Lower-median convention: with rows ranked by (cents, event_id), the
    * median is rank (n+1) div 2 — pure integers, no interpolation, so
    * both engines land on the same cell. Two ranked passes (values, then
    * absolute deviations) + one final aggregate, all keyed on event_type.
    * Exact per-key medians sort each key group; the sketch path for
    * 100 TB-scale quantiles is the KLL gate (q_approx_percentile) — this
    * is the exact estimator for key groups that fit a sort, which is what
    * a per-metric-type robustness check is.
    */
  def madOutliers(events: DataFrame): DataFrame = {
    val cents = events.select(col("event_type"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val byType = Window.partitionBy("event_type")
      df.withColumn("rn",
          row_number().over(byType.orderBy(col(valueCol), col("event_id"))))
        .withColumn("cnt", count(lit(1)).over(byType))
        .where(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = lowerMedian(cents, "cents", "med_cents")
    val dev = cents.join(med, Seq("event_type"))
      .withColumn("dev", abs(col("cents") - col("med_cents")))
    val mad = lowerMedian(dev, "dev", "mad_cents")
    dev.join(mad, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        first(col("med_cents")).as("med_cents"),
        first(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > lit(MadK) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Gate `q_outlier_mad`. */
  def madOutliersQuery(s: SparkSession, d: String): DataFrame =
    madOutliers(graft.Tables.t(s, d, "events")).orderBy("event_type")

  // ----------------------------------------------- histogram maintenance

  /** Stored value-histogram state: per-(event_type, cents) counts are
    * ADDITIVE, so exact medians/MADs maintain incrementally — the
    * mergeable-EXACT-statistic complement of the KLL sketch gate. Serving
    * never rescans events: median = smallest cents whose cumulative count
    * reaches rank (n+1) div 2 (identical to the rank rule over raw rows —
    * the value at a rank does not depend on tie order), the deviation
    * histogram derives from the value histogram, and the outlier count is
    * one weighted sum. State is bounded by distinct (type, cents) pairs —
    * at 100 TB the events stream is unbounded but the histogram is not,
    * and each append rewrites only the histogram-sized table.
    */
  val Db = "graft_tshist"
  val HistTable = "value_hist"
  val WmTsProp = "graft.tshist.wm_ts"
  val WmEidProp = "graft.tshist.wm_event_id"

  private def fqn(db: String) = s"`$db`.`$HistTable`"

  private def centsOf(events: DataFrame): DataFrame =
    events.select(col("event_type"), col("ts"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents"))

  private def histOf(events: DataFrame): DataFrame =
    centsOf(events).groupBy("event_type", "cents")
      .agg(count(lit(1)).as("cnt"))

  private def setWm(s: SparkSession, db: String, feed: DataFrame): Unit = {
    val wm = feed.agg(max(struct(col("ts"), col("event_id")))).head
    if (!wm.isNullAt(0))
      s.sql(s"ALTER TABLE ${fqn(db)} SET TBLPROPERTIES " +
        s"('$WmTsProp'='${wm.getStruct(0).getLong(0)}', " +
        s"'$WmEidProp'='${wm.getStruct(0).getLong(1)}')")
  }

  /** Full build — the scheduled re-anchor for the append path. */
  def buildValueHistogram(events: DataFrame, db: String = Db): Unit = {
    graft.store.Warehouse.saveModel(histOf(events), db, HistTable)
    setWm(events.sparkSession, db, events)
  }

  /** Additive fold of one batch. Fence-first (the SCD2/BM25 posture): the
    * histogram rewrite is not idempotent, so a crashed batch's replay
    * refuses loudly and [[buildValueHistogram]] re-anchors.
    */
  def appendValueHistogram(s: SparkSession, batch: DataFrame,
                           db: String = Db): Unit = {
    val bWm = batch.agg(min(struct(col("ts"), col("event_id")))).head
    if (bWm.isNullAt(0)) return
    val wmTs = graft.store.Warehouse.readTablePropLong(s, db, HistTable,
      WmTsProp, "rebuild with buildValueHistogram before appending")
    val wmEid = graft.store.Warehouse.readTablePropLong(s, db, HistTable,
      WmEidProp, "rebuild with buildValueHistogram before appending")
    val (bTs, bEid) = (bWm.getStruct(0).getLong(0), bWm.getStruct(0).getLong(1))
    require(bTs > wmTs || (bTs == wmTs && bEid > wmEid),
      s"appendValueHistogram: batch min (ts=$bTs, event_id=$bEid) is not " +
        s"past the stored watermark (ts=$wmTs, event_id=$wmEid) — replayed " +
        "or out-of-order batches are refused (additive counts would " +
        "double); re-anchor with buildValueHistogram")
    setWm(s, db, batch)
    val delta = histOf(batch).localCheckpoint()
    graft.store.Warehouse.rewriteVia(s, db, HistTable)(stored =>
      stored.unionByName(delta)
        .groupBy("event_type", "cents").agg(sum("cnt").as("cnt")))
  }

  /** The [[madOutliers]] summary served from the stored histogram alone —
    * no events scan, by construction (this function never sees the
    * events table).
    */
  def madFromHistogram(s: SparkSession, db: String = Db): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    val h = s.table(fqn(db))
    val tot = h.groupBy("event_type").agg(sum("cnt").as("n"))
    val med = h
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("event_type").orderBy("cents")))
      .join(tot, Seq("event_type"))
      .where(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("event_type").agg(min("cents").as("med_cents"))
    val dev = h.join(med, Seq("event_type"))
      .groupBy(col("event_type"), col("med_cents"),
        abs(col("cents") - col("med_cents")).as("dev"))
      .agg(sum("cnt").as("dcnt"))
    val mad = dev
      .withColumn("cumd", sum("dcnt").over(
        Window.partitionBy("event_type").orderBy("dev")))
      .join(tot, Seq("event_type"))
      .where(col("cumd") >= expr("(n + 1) div 2"))
      .groupBy("event_type").agg(min("dev").as("mad_cents"))
    dev.join(mad, Seq("event_type")).join(tot, Seq("event_type"))
      .groupBy("event_type")
      .agg(first(col("n")).as("n"),
        first(col("med_cents")).as("med_cents"),
        first(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > lit(MadK) * col("mad_cents"), col("dcnt"))
          .otherwise(0L)).as("n_outliers"))
  }

  /** Gate `q_outlier_mad_incremental`: build on the first two-thirds of
    * the time range, fold the rest, serve from the histogram. The oracle
    * is the SAME fresh full replay as `q_outlier_mad`, so a green row
    * proves both the additive maintenance AND the histogram serving math
    * land bit-equal to the raw-row rank rule.
    */
  def outlierMadIncremental(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.t(s, d, "events")
    val b = ev.agg(min("ts"), max("ts")).head
    val thr = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 3 * 2
    buildValueHistogram(ev.where(col("ts") < thr))
    appendValueHistogram(s, ev.where(col("ts") >= thr))
    madFromHistogram(s).orderBy("event_type")
  }
}
