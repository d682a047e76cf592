package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.D streaming row).
  *
  * The reference has no streaming — its closest analogue is a 2-hour cron
  * re-extract (reference: tenant.yaml:19, _tenant_factory.py:170-174). These
  * operators are the upgrade path: the *same* event-time expressions used by
  * the batch queries (graft.ops.EventOps) applied to an unbounded source
  * with watermarks and state. Batch/stream parity is tested by running both
  * over identical rows.
  */
object StreamingOps {

  /** Event row shape for the typed stateful ops. */
  final case class Ev(userId: Long, tsUs: Long, eventType: String, value: Double)

  /** Per-user running aggregate held in managed state. */
  final case class UserAgg(userId: Long, n: Long, valueSum: Double)

  /** Tumbling 1-hour count per event type with a 2-hour watermark — late
    * rows beyond the watermark are dropped, state is bounded (the property
    * that makes this runnable forever on an unbounded stream).
    * `events` must carry (ts_us TIMESTAMP, event_type STRING).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "2 hours")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** Arbitrary stateful aggregation via mapGroupsWithState: per-user running
    * (count, sum). Update-mode output; state never times out here (callers
    * with unbounded key spaces should switch to a timeout policy).
    */
  def runningUserAgg(events: Dataset[Ev]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserAgg(userId, acc.n + 1, acc.valueSum + e.value))
          state.update(next)
          next
      }
  }

  /** Session windows on a stream: 30-minute gap per user, emitting closed
    * sessions only (append mode semantics mirror EventOps.sessionWindow).
    */
  def streamingSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "2 hours")
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("cnt"))

  /** Default output mode pairings for the above (documented contract). */
  val outputModes: Map[String, OutputMode] = Map(
    "hourlyCounts" -> OutputMode.Append(),
    "runningUserAgg" -> OutputMode.Update(),
    "streamingSessions" -> OutputMode.Append())
}
