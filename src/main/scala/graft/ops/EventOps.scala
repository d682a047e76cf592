package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Event-time operators over the `events` fixture (SURVEY.md §2.D streaming
  * row): JSON extraction, tumbling windows, session windows — all
  * batch-evaluable (the same expressions run under Structured Streaming; see
  * graft.streaming for the readStream path).
  *
  * `events.ts` is an exact ns-epoch Long (see graft.Tables); event-time
  * columns are derived with integer `div`, never double division, so no
  * precision is lost on 1.7e18-scale nanos.
  */
object EventOps {

  /** JSON scalar extraction + aggregation over `events.props`
    * (`{"k": <int>}`).
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("k_sum"))
      .orderBy("event_type")

  /** 1-hour tumbling event-time window (batch `window()` — identical
    * semantics under readStream with a watermark).
    */
  def eventTumblingWindow(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts_us"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .select(col("window.start").as("ws"), col("cnt"), col("value_sum"))
      .orderBy("ws")

  /** 30-minute-gap session windows per user. Output times as exact µs-epoch
    * longs so the oracle's gaps-and-islands SQL compares integers, not
    * mixed-precision timestamps.
    */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("cnt"))
      .orderBy("user_id", "session_start_us")
}
