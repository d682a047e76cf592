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

  /** Interpolation fixed point: milli-cents. */
  val InterpScale = 1000L

  /** Dense hourly grid with LINEAR INTERPOLATION — the second standard
    * gap policy next to [[gapfillLocf]]'s carry-forward (a gauge that
    * RAMPS between readings interpolates; a state flag carries): at gap
    * bucket g between known points (b₀,v₀) and (b₁,v₁),
    *
    *   v(g) = v₀ + (v₁−v₀)·(g−b₀)/(b₁−b₀)
    *
    * in [[InterpScale]] milli-cents with the sign-split truncating
    * division (the slope can be negative). Known buckets emit exactly
    * v·1000; the grid spans each user's own known range, so every gap
    * has both neighbors by construction. Products stay inside Long:
    * |Δv| cents · 10³ · gap ≲ 10¹² on hourly grids (a wider value/span
    * domain would move this to DECIMAL — the OLS posture).
    *
    * Scale shape: the [[gapfillLocf]] shape plus one
    * mirrored next-known window — still ONE (user)-keyed exchange after the
    * bucket collapse. Gate `q_gapfill_interp`.
    */
  def gapfillInterp(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      expr(s"ts div $HourNs").as("bucket"), col("ts"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val byBucket = Window.partitionBy("user_id", "bucket")
    val bkt = ev
      .withColumn("rn", row_number().over(
        byBucket.orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n", count(lit(1)).over(byBucket))
      .where(col("rn") === 1)
      .select(col("user_id"), col("bucket"), col("n"), col("cents").as("v"))
    val grid = bkt.groupBy("user_id")
      .agg(min("bucket").as("mn"), max("bucket").as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"))).as("bucket"))
    val base = Window.partitionBy("user_id").orderBy("bucket")
    val wAsc = base.rowsBetween(Window.unboundedPreceding, 0)
    val wDesc = base.rowsBetween(0, Window.unboundedFollowing)
    grid.join(bkt, Seq("user_id", "bucket"), "left")
      .withColumn("v0", last(col("v"), ignoreNulls = true).over(wAsc))
      .withColumn("b0", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wAsc))
      .withColumn("v1", first(col("v"), ignoreNulls = true).over(wDesc))
      .withColumn("b1", first(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wDesc))
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        expr(s"""v0 * $InterpScale + CASE WHEN b1 = b0 THEN 0L
          | WHEN (v1 - v0) * (bucket - b0) < 0
          |   THEN -((-((v1 - v0) * $InterpScale * (bucket - b0)))
          |         div (b1 - b0))
          | ELSE ((v1 - v0) * $InterpScale * (bucket - b0)) div (b1 - b0)
          | END""".stripMargin.replace("\n", " ")).as("value_interp_mc"))
  }

  /** Gate `q_gapfill_interp`. */
  def gapfillInterpQuery(s: SparkSession, d: String): DataFrame =
    gapfillInterp(graft.Tables.t(s, d, "events"))
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
    val b = Guards.anchored(ev.agg(min("ts"), max("ts")).head,
      "outlierMadIncremental", "min(ts)")
    val thr = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 3 * 2
    buildValueHistogram(ev.where(col("ts") < thr))
    appendValueHistogram(s, ev.where(col("ts") >= thr))
    madFromHistogram(s).orderBy("event_type")
  }

  // ------------------------------------------------------- trend / drift

  /** OLS fixed-point scale: slope/intercept emitted in micro-units. */
  val OlsScale = 1000000L

  /** Closed-form least-squares trend per region over monthly revenue —
    * the metrics-pipeline "is this KPI growing" primitive, as an EXACT
    * rational: x = months since 1995-01 (integer), y = monthly revenue
    * cents (exact sum over `round(o_totalprice*100)` longs), and
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
    *
    * through DECIMAL(38) products (at 100 TB, Σy cents ≈ 10¹⁷ and the
    * cross products reach ~10²² — past Long, inside DECIMAL(38), the
    * chi-square precedent; DuckDB replays through HUGEINT). Signs are
    * SPLIT before the integral division — slope can be negative, and the
    * two engines' `div`/`//` truncation conventions are only guaranteed
    * to agree on non-negative operands — so both divide |num|·scale by
    * the (always ≥ 0) denominator and re-apply the sign.
    *
    * Scale shape: one orders⨝customer key shuffle (customer is data-sized
    * at 100 TB — no broadcast), nation/region broadcast; then ONE
    * (region, month) aggregation (map-side combined) and the OLS sums on
    * the grid-sized monthly frame. Nothing downstream of the first agg
    * sees row volume.
    */
  def olsTrend(s: SparkSession, d: String): DataFrame =
    olsFit(monthlyRevenue(s, d))

  /** Monthly revenue cents per region — the shared grid assembly of the
    * trend family ([[olsTrend]], [[periodOverPeriod]]): one
    * orders⨝customer key shuffle (customer is data-sized at 100 TB — no
    * broadcast), nation/region broadcast, ONE (region, month)
    * map-side-combined aggregation.
    */
  def monthlyRevenue(s: SparkSession, d: String): DataFrame = {
    import graft.Tables.t
    t(s, d, "orders")
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .withColumn("mx",
        ((year(col("o_orderdate")) - 1995) * 12 +
          month(col("o_orderdate")) - 1).cast("long"))
      .join(t(s, d, "customer").select(
        col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
      .join(broadcast(t(s, d, "nation").select(
        col("n_nationkey").as("c_nationkey"), col("n_regionkey"))),
        "c_nationkey")
      .join(broadcast(t(s, d, "region").select(
        col("r_regionkey").as("n_regionkey"), col("r_name"))), "n_regionkey")
      .groupBy("r_name", "mx").agg(sum("cents").as("y"))
  }

  /** Theil-Sen robust trend per region over the same monthly grid — the
    * median of all pairwise slopes (Theil 1950 / Sen 1968), the
    * outlier-resistant complement of [[olsTrend]]'s least-squares fit
    * (one anomalous month drags OLS; the slope MEDIAN shrugs it off —
    * the robust-trend primitive a metrics pipeline wants next to the
    * fitted one). Each pair slope is the exact sign-split truncation
    *
    *   slope_µ(i,j) = sign(Δy) · (|Δy| · 10⁶ div Δx),  Δx > 0
    *
    * through DECIMAL(38) (sign split because Spark's `div` truncates
    * toward zero while DuckDB's `//` floors — nonnegative operands make
    * them agree; the period-over-period precedent). The reported value
    * is the LOWER median under the total order (slope_µ, x1, x2) — a
    * deterministic rank both engines replay.
    *
    * Scale shape: the pair generator is a region-keyed self-join of the
    * MONTH GRID (months ≤ grid span — C(84,2) ≈ 3.5k pairs per region,
    * never order-volume); the median is one region-keyed window. The
    * grid assembly is [[monthlyRevenue]]'s one key shuffle.
    * Gate `q_theil_sen`.
    */
  def theilSenTrend(s: SparkSession, d: String): DataFrame = {
    val g = monthlyRevenue(s, d)
    val a = g.select(col("r_name"), col("mx").as("x1"), col("y").as("y1"))
    val b = g.select(col("r_name"), col("mx").as("x2"), col("y").as("y2"))
    val slopes = a.join(b, "r_name").where(col("x1") < col("x2"))
      .select(col("r_name"), col("x1"), col("x2"),
        expr(s"CAST(CASE WHEN y2 >= y1 THEN " +
          s"(CAST(y2 - y1 AS DECIMAL(38,0)) * $OlsScale) div (x2 - x1) " +
          s"ELSE -((CAST(y1 - y2 AS DECIMAL(38,0)) * $OlsScale) " +
          s"div (x2 - x1)) END AS BIGINT)").as("slope_micro"))
    val byRegion = Window.partitionBy("r_name")
    slopes
      .withColumn("rn", row_number().over(
        byRegion.orderBy(col("slope_micro"), col("x1"), col("x2"))))
      .withColumn("np", count(lit(1)).over(byRegion))
      .where(col("rn") === expr("(np + 1) div 2"))
      .select(col("r_name"), col("np").as("n_pairs"),
        col("slope_micro").as("theil_slope_micro"))
      .orderBy("r_name")
  }

  /** Largest lag [[acfLags]] reports. */
  val AcfMaxLag = 6

  /** Rank autocorrelation per region for lags 1..[[AcfMaxLag]] over the
    * monthly revenue grid — the seasonality screen next to [[olsTrend]]'s
    * fitted slope and [[theilSenTrend]]'s robust one (a high lag-12 rank
    * ACF is the classic annual-cycle signature; lag-1 measures momentum).
    * SPEARMAN-flavored by design: the correlation runs on each month's
    * within-region revenue RANK (row_number over (y, mx) — the mx
    * tie-break makes the rank total and both engines replay it), because
    * ranks are grid-bounded integers, so every Pearson sum stays exact
    * where raw cents products would overflow even DECIMAL(38) in the
    * r² numerator. Emitted sqrt-free as the [[graft.ops.Relational
    * .spearmanSizePrice]] pair: sign of the covariance numerator plus
    * r²·10⁶ truncated through DECIMAL(38).
    *
    * Scale shape: the grid is month-span-bounded (K× facts fold into the
    * SAME months), so the lag self-join and per-(region, lag) sums are
    * constant-size regardless of corpus scale; the only fact-volume work
    * is [[monthlyRevenue]]'s one keyed aggregation. Gate `q_acf_lags`.
    */
  /** Fixed-point scale of [[holtSmooth]]'s level/trend state (2¹⁰ —
    * dyadic so every division in the recurrence is an ARITHMETIC SHIFT,
    * which floors identically for negative trends in Spark
    * (`shiftright`, Java `>>`) and DuckDB (`>>`): the signed-floor-
    * division trap that rules out `div`/`//` here).
    */
  val HoltScale = 1L << 10

  /** Holt's linear exponential smoothing (Holt 1957) over the monthly
    * revenue grid, α = β = ½ — the level+TREND upgrade of the EWMA
    * gate (EWMA's level alone lags a trending series by a constant;
    * Holt's trend state closes the gap — the standard short-horizon
    * forecaster a metrics pipeline runs per region):
    *
    *   l_t = (x_t·S + l_{t−1} + b_{t−1}) >> 1
    *   b_t = ((l_t − l_{t−1}) + b_{t−1}) >> 1,   l_1 = x_1·S, b_1 = 0
    *
    * Exact integers: the dyadic α makes both recurrences single shifts;
    * month gaps fill with 0 revenue (the EWMA grid posture). The
    * input-magnitude require keeps x·S inside a Long without ANSI.
    *
    * Scale shape: the [[monthlyRevenue]] grid assembly (one key shuffle
    * + bounded aggregation) — everything after runs on the
    * (region × month)-bounded frame: ONE linear fold per region emits
    * the running (level, trend) state ARRAY (the round-14 verdict's
    * linearization — the previous per-row `aggregate(slice(ys, 2, i))`
    * re-fold was the only quadratic re-fold left in the tree and paid
    * T²/2 lambda evaluations per region; the fold below pays T, and the
    * accumulator-append copies are month-grid-bounded memcopies).
    * Gate `q_holt_smooth`.
    */
  def holtSmooth(s: SparkSession, d: String): DataFrame = {
    val g = monthlyRevenue(s, d)
    val mx = g.agg(max(abs(col("y")))).head()
    require(mx.isNullAt(0) ||
      mx.getLong(0) <= Long.MaxValue / (HoltScale * 4),
      "holtSmooth: monthly revenue exceeds the fixed-point headroom")
    val grid = g.groupBy("r_name").agg(min("mx").as("mn"), max("mx").as("mh"))
      .select(col("r_name"), explode(expr("sequence(mn, mh)")).as("mx"))
    val filled = grid.join(g, Seq("r_name", "mx"), "left")
      .select(col("r_name"), col("mx"), coalesce(col("y"), lit(0L)).as("y"))
    val arr = filled.groupBy("r_name")
      .agg(sort_array(collect_list(struct(col("mx"), col("y")))).as("xs"))
    // prev-state references stay inline (SQL lambdas bind no lets): the
    // duplicated element_at(acc, -1) reads are constant-factor, not O(T)
    arr.select(col("r_name"), col("xs"),
        expr(s"""aggregate(
          |  slice(transform(xs, e -> e.y), 2, size(xs) - 1),
          |  array(array(element_at(xs, 1).y * $HoltScale,
          |    CAST(0 AS BIGINT))),
          |  (acc, x) -> acc || array(array(
          |    shiftright(x * $HoltScale
          |      + element_at(element_at(acc, -1), 1)
          |      + element_at(element_at(acc, -1), 2), 1),
          |    shiftright(shiftright(x * $HoltScale
          |        + element_at(element_at(acc, -1), 1)
          |        + element_at(element_at(acc, -1), 2), 1)
          |      - element_at(element_at(acc, -1), 1)
          |      + element_at(element_at(acc, -1), 2), 1))))"""
          .stripMargin).as("st"))
      .select(col("r_name"),
        posexplode(expr("arrays_zip(xs, st)")).as(Seq("i", "z")))
      .select(col("r_name"), col("z.xs.mx").as("mx"),
        col("z.xs.y").as("revenue_cents"),
        expr("element_at(z.st, 1)").as("level_fp"),
        expr("element_at(z.st, 2)").as("trend_fp"))
      .orderBy("r_name", "mx")
  }

  def acfLags(s: SparkSession, d: String): DataFrame = {
    val rw = Window.partitionBy("r_name").orderBy("y", "mx")
    val g = monthlyRevenue(s, d)
      .withColumn("rk", row_number().over(rw).cast("long"))
    val a = g.select(col("r_name"), col("mx"), col("rk").as("x"))
    val b = g.select(col("r_name").as("r2"), col("mx").as("mx2"),
      col("rk").as("yr"))
    a.join(b, col("r2") === col("r_name") &&
        col("mx2") > col("mx") && col("mx2") <= col("mx") + AcfMaxLag)
      .withColumn("lag", col("mx2") - col("mx"))
      .groupBy("r_name", "lag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("yr").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("yr * yr")).as("syy"),
        sum(expr("x * yr")).as("sxy"))
      .select(col("r_name"), col("lag"), col("n"),
        expr("CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 " +
          "WHEN n * sxy - sx * sy > 0 THEN 1 ELSE 0 END AS INTEGER)")
          .as("acf_sign"),
        expr("CAST(CASE WHEN n * sxx - sx * sx = 0 " +
          "OR n * syy - sy * sy = 0 THEN 0 ELSE " +
          "(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) " +
          "* (n * sxy - sx * sy) * 1000000) div " +
          "(CAST(n * sxx - sx * sx AS DECIMAL(38,0)) " +
          "* (n * syy - sy * sy)) END AS BIGINT)").as("acf2_ppm"))
      .orderBy("r_name", "lag")
  }

  /** Period-over-period reporting off the same monthly grid: previous
    * month's revenue, the delta, and the exact sign-split ppm change —
    * the dashboard primitive next to [[olsTrend]]'s fitted slope. Months
    * with no preceding observed month emit NULL deltas (a gap is not a
    * 0-revenue month — the grid is observed months, the gapfill
    * convention does not apply to ratios). The lag window rides the
    * month-grid frame. Gate `q_period_over_period`.
    */
  def periodOverPeriod(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("r_name").orderBy("mx")
    monthlyRevenue(s, d)
      .withColumn("prev_mx", lag("mx", 1).over(w))
      .withColumn("prev_cents", lag("y", 1).over(w))
      .select(col("r_name"), col("mx").as("month_idx"),
        col("y").as("revenue_cents"),
        when(col("prev_mx") === col("mx") - 1, col("prev_cents"))
          .as("prev_cents"))
      .withColumn("delta_cents", col("revenue_cents") - col("prev_cents"))
      .withColumn("pct_change_ppm", expr(
        s"""CASE WHEN prev_cents IS NULL THEN NULL
           | WHEN delta_cents < 0
           |   THEN -((-delta_cents * $OlsScale) div prev_cents)
           | ELSE (delta_cents * $OlsScale) div prev_cents END"""
          .stripMargin.replace("\n", " ")))
      .orderBy("r_name", "month_idx")
  }

  /** TWAP fixed-point scale (milli-cents). */
  val TwapScale = 1000L

  /** Time-weighted average value per user (the metering/billing
    * estimator — events sampled at uneven times must weight each value
    * by how long it HELD, or burst-sampled periods dominate the mean):
    * between consecutive events the PREVIOUS value holds (LOCF), so
    *
    *   twap = Σᵢ (tᵢ₊₁ − tᵢ) · vᵢ / (tₙ − t₁)
    *
    * — exact through DECIMAL(38) (ns spans × cents pass Long), emitted
    * in [[TwapScale]] milli-cents with the non-negative-operand
    * convention (values are cents ≥ 0 on this fixture; spans ≥ 0 by
    * construction). Users with a single event have no held segment and
    * are excluded (span 0 — the honest contract, not a 0 average).
    *
    * Scale shape: ONE user-keyed exchange carries the lag window and
    * the final per-user aggregation (the SCD2 exchange-reuse posture).
    * Gate `q_time_weighted_avg`.
    */
  def timeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    graft.Tables.t(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_ts", lead("ts", 1).over(w))
      // zero-length segments (tied timestamps) contribute nothing to
      // num or span but would let a user whose events ALL tie reach the
      // aggregation with span_ns = 0 → NULL division; they are excluded
      // like single-event users (same contract: no held segment)
      .where(col("next_ts") > col("ts"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(expr("CAST(next_ts - ts AS DECIMAL(38,0)) * cents")).as("num"),
        (max("next_ts") - min("ts")).as("span_ns"))
      .select(col("user_id"), col("n_segments"), col("span_ns"),
        expr(s"CAST((num * $TwapScale) div span_ns AS BIGINT)")
          .as("twap_milli_cents"))
      .orderBy("user_id")
  }

  /** The closed-form fit over a `(r_name, mx, y)` points frame — the
    * arithmetic core of [[olsTrend]], separable so specs pin exact
    * slopes (incl. the negative-slope sign split) on crafted points.
    */
  def olsFit(monthly: DataFrame): DataFrame = {
    val sums = monthly.groupBy("r_name").agg(
      count(lit(1)).as("n"), sum("mx").as("sx"), sum("y").as("sy"),
      sum(expr("mx * mx")).as("sxx"),
      sum(expr("CAST(mx AS DECIMAL(38,0)) * y")).as("sxy"))
    sums.select(col("r_name"), col("n").as("n_months"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("s_num"),
        expr("CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy")
          .as("i_num"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("den"))
      .select(col("r_name"), col("n_months"),
        expr(s"CAST(CASE WHEN s_num < 0 THEN -((-s_num * $OlsScale) div den) " +
          s"ELSE (s_num * $OlsScale) div den END AS BIGINT)")
          .as("slope_micro_cents"),
        expr(s"CAST(CASE WHEN i_num < 0 THEN -((-i_num * $OlsScale) div den) " +
          s"ELSE (i_num * $OlsScale) div den END AS BIGINT)")
          .as("intercept_micro_cents"))
      .orderBy("r_name")
  }

  /** CUSUM drift parameters: reference = per-type mean daily count
    * (exact integer `total div days`); alarm when the one-sided sum
    * crosses [[CusumH]] × reference.
    */
  val CusumH = 2L

  /** Page's CUSUM changepoint statistic (Page 1954) over per-type daily
    * event counts — the sequential drift detector a metrics pipeline
    * runs where MAD answers "is this point an outlier" and CUSUM answers
    * "did the LEVEL shift": S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − k)) and the
    * mirrored S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (k − xᵢ)), k = the per-type mean
    * daily count. The recurrence is nonlinear (the max(0,·) clamp), so
    * it is NOT a prefix sum — both engines run the EXPLICIT day-order
    * fold (`aggregate(slice(...))` ≡ `list_reduce(list_prepend(...))`,
    * the Kaplan-Meier posture), exact integers end to end.
    *
    * Scale shape: ONE (type, day) count aggregation (map-side combined)
    * off the events scan; the grid is densified over each type's own
    * day span (gapfill posture — missing days count 0, which is exactly
    * the drift a changepoint detector must see); folds run on the
    * DAY-GRID-bounded per-type arrays, never on event rows. O(G²) slice
    * folds on a G≈days grid is grid math, not data math.
    */
  def cusumChangepoint(s: SparkSession, d: String): DataFrame =
    cusumStats(denseDaily(graft.Tables.t(s, d, "events")))
      .orderBy("event_type", "day")

  /** Per-type daily counts densified over each type's own day span
    * (missing days are 0-count rows — the drift a detector must see).
    */
  def denseDaily(events: DataFrame): DataFrame = {
    val daily0 = events
      .select(col("event_type"), expr(s"ts div ${EventOps.DayNs}").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val grid = daily0.groupBy("event_type")
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    grid.join(daily0, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** The fold core of [[cusumChangepoint]] over a dense
    * `(event_type, day, cnt)` frame.
    */
  def cusumStats(daily: DataFrame): DataFrame = {
    val ref = daily.groupBy("event_type").agg(
      expr("sum(cnt) div count(1)").as("k"))
    val wt = Window.partitionBy("event_type").orderBy("day")
    val ranked = daily.withColumn("rn", row_number().over(wt))
    val arrs = ranked.groupBy("event_type").agg(expr(
      "transform(array_sort(collect_list(struct(day, cnt))), e -> e.cnt)")
      .as("xs"))
    ranked.join(arrs, "event_type").join(broadcast(ref), "event_type")
      .withColumn("cusum_hi", expr(
        "aggregate(slice(xs, 1, rn), 0L, " +
          "(acc, x) -> greatest(0L, acc + x - k))"))
      .withColumn("cusum_lo", expr(
        "aggregate(slice(xs, 1, rn), 0L, " +
          "(acc, x) -> greatest(0L, acc + k - x))"))
      .select(col("event_type"), col("day"), col("cnt"), col("k"),
        col("cusum_hi"), col("cusum_lo"),
        (col("cusum_hi") > lit(CusumH) * col("k")).cast("int").as("alarm_hi"),
        (col("cusum_lo") > lit(CusumH) * col("k")).cast("int").as("alarm_lo"))
  }

  /** EWMA fixed-point scale and the α = [[EwmaNum]]/[[EwmaDen]] = 0.3
    * smoothing weight.
    */
  val EwmaScale = 1000000L
  val EwmaNum = 3L
  val EwmaDen = 10L

  /** Exponentially-weighted moving average over per-type daily counts,
    * in [[EwmaScale]] fixed point — the smoother/forecaster leg next to
    * CUSUM's detector: levelᵢ = (3·xᵢ·S + 7·levelᵢ₋₁) div 10, seeded at
    * level₁ = x₁·S, plus the one-step-ahead residual
    * residᵢ = xᵢ·S − levelᵢ₋₁ (the anomaly signal; 0 at the seed). Each
    * level truncates ONCE per day in day order — the same explicit
    * nonassociative fold discipline as [[cusumChangepoint]], replayed by
    * DuckDB over the identical prepended-init list_reduce. All operands
    * stay non-negative, so the two engines' truncating divisions agree.
    *
    * Scale shape: identical to CUSUM — one (type, day) count agg, dense
    * grid, per-type day-grid-bounded arrays; two slice folds per grid
    * row (level and its predecessor), still grid math.
    */
  def ewmaSmooth(s: SparkSession, d: String): DataFrame =
    ewmaLevels(denseDaily(graft.Tables.t(s, d, "events")))
      .orderBy("event_type", "day")

  /** The fold core of [[ewmaSmooth]] over a dense
    * `(event_type, day, cnt)` frame.
    */
  def ewmaLevels(daily: DataFrame): DataFrame = {
    val wt = Window.partitionBy("event_type").orderBy("day")
    val ranked = daily.withColumn("rn", row_number().over(wt))
    val arrs = ranked.groupBy("event_type").agg(expr(
      "transform(array_sort(collect_list(struct(day, cnt))), e -> e.cnt)")
      .as("xs"))
    def level(upTo: String) = // fold elements 2..upTo from the x₁ seed
      s"aggregate(slice(xs, 2, $upTo - 1), element_at(xs, 1) * $EwmaScale, " +
        s"(acc, x) -> ($EwmaNum * x * $EwmaScale + " +
        s"(${EwmaDen - EwmaNum}) * acc) div $EwmaDen)"
    ranked.join(arrs, "event_type")
      .withColumn("level_fp", expr(level("rn")))
      .withColumn("resid_fp", expr(
        s"CASE WHEN rn = 1 THEN 0L " +
          s"ELSE cnt * $EwmaScale - ${level("(rn - 1)")} END"))
      .select("event_type", "day", "cnt", "level_fp", "resid_fp")
  }
}
