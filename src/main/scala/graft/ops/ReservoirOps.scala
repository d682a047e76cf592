package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable bottom-K ROW sampling — the multiset twin of the KMV theta
  * rollup ([[ThetaOps.thetaDaily]]): where KMV samples the DISTINCT
  * universe (so it answers cardinality), bottom-K by a per-ROW hash is
  * a uniform sample of the rows themselves (so it answers value-shaped
  * questions — medians, distributions) and merges by the same law:
  *
  *   bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B))
  *
  * — every global bottom-K row is in its own day's bottom-K, so any
  * date-range sample is computable from stored K-row day samples alone,
  * the raw events never rescanned. Hashing `event_id` (unique per row)
  * makes the sample deterministic and the DuckDB replay exact; ranking
  * ties on (hv, event_id) so even a 48-bit hash collision can't make
  * the pick shuffle-order-dependent.
  */
object ReservoirOps {

  /** Per-day sample size. */
  val K = 64

  /** Merged-range gate window: epoch days [lo, hi) relative to the
    * fixture's own min day (the theta-daily convention made relative so
    * every sf lands inside its span).
    */
  val RangeLoOff = 5L
  val RangeHiOff = 15L

  private def hvOf(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1,
      ThetaOps.HashHexChars), 16, 10).cast("long") + 1

  /** Per-day medians from stored-shape bottom-K samples + the range row
    * (day = −1) answered from MERGED day samples alone.
    *
    * Scale shape: ONE (day)-keyed exchange carries both the bottom-K
    * rank and the exact day count (same key); everything downstream —
    * per-day medians, the range merge, its median — runs on K-row
    * samples (≤ K·days rows total). The merge is the shard-merge law,
    * so a stored per-day sample table answers ANY date range at serve
    * time with zero event scans.
    */
  def reservoirDaily(s: SparkSession, d: String): DataFrame = {
    val rows = graft.Tables.t(s, d, "events").select(
      expr(s"ts div ${EventOps.DayNs}").as("day"),
      col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("hv", hvOf(col("event_id")))
    val byDay = Window.partitionBy("day")
    val ranked = rows
      .withColumn("rn", row_number().over(
        byDay.orderBy(col("hv"), col("event_id"))))
      .withColumn("n_total", count(lit(1)).over(byDay))
    val samples = ranked.where(col("rn") <= K)
      .select("day", "event_id", "cents", "hv", "n_total")
    def medOf(df: DataFrame): DataFrame = {
      val byTag = Window.partitionBy("mday")
      df.withColumn("mrn", row_number().over(
          byTag.orderBy(col("cents"), col("event_id"))))
        .withColumn("mcnt", count(lit(1)).over(byTag))
        .where(col("mrn") === expr("(mcnt + 1) div 2"))
        .select(col("mday"), col("mcnt").as("n_sample"),
          col("cents").as("med_cents"))
    }
    val perDay = medOf(samples.withColumn("mday", col("day")))
      .join(samples.groupBy(col("day").as("mday"))
        .agg(first("n_total").as("n_total")), "mday")
    // merged range: bottom-K over the UNION OF DAY SAMPLES only
    val mn = rows.agg(min("day")).head.getLong(0)
    val range = samples
      .where(col("day") >= mn + RangeLoOff && col("day") < mn + RangeHiOff)
    val merged = range
      .withColumn("rrn", row_number().over(
        Window.orderBy(col("hv"), col("event_id"))))
      .where(col("rrn") <= K)
      .withColumn("mday", lit(-1L))
    // exact range row count: n_total repeats on every sample row of its
    // day — de-repeat per day, then sum
    val rangeTotal = range.groupBy("day").agg(first("n_total").as("nt"))
      .agg(coalesce(sum("nt"), lit(0L)).as("n_total"))
      .withColumn("mday", lit(-1L))
    val rangeRow = medOf(merged).join(rangeTotal, "mday")
    perDay.select(col("mday").as("day"), col("n_total"), col("n_sample"),
        col("med_cents"))
      .unionByName(rangeRow.select(col("mday").as("day"), col("n_total"),
        col("n_sample"), col("med_cents")))
      .orderBy("day")
  }
}
