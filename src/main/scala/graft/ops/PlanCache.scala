package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-keyed single-slot persist cache for operator-internal reuse
  * (an LSH sketch or banded signature frame feeding several join branches).
  *
  * `swap(tag, df)` persists `df` and unpersists the previous occupant of
  * `(session, tag)`, so repeated invocations in one session hold at most
  * one persisted copy per tag, and one session's release can never drop
  * another session's blocks. Entries whose SparkContext has stopped are
  * evicted opportunistically on every call (a dead session's blocks are
  * already gone; this just drops the references). For short-lived-session
  * applications, [[release]] frees a session's slots deterministically.
  */
private[graft] object PlanCache {
  private val slots =
    scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  private def drop(df: DataFrame): Unit =
    try df.unpersist(blocking = false) catch { case _: Throwable => () }

  def swap(tag: String, df: DataFrame): DataFrame = synchronized {
    slots.filterInPlace { case ((sess, _), old) =>
      val dead = sess.sparkContext.isStopped
      if (dead) drop(old)
      !dead
    }
    val key = (df.sparkSession, tag)
    slots.get(key) match {
      // Spark's CacheManager keys entries by logical plan (sameResult), so
      // when the same operator runs twice the new persist() would register
      // against the OLD frame's entry and the subsequent drop(old) would
      // uncache them BOTH — the returned frame would silently recompute its
      // expensive upstream on every branch. Same plan → reuse the live entry.
      case Some(old) if old.queryExecution.analyzed
          .sameResult(df.queryExecution.analyzed) =>
        old
      case other =>
        // unpersist the previous occupant BEFORE persisting the new frame
        // (drop-after-persist hits the shared-entry hazard above when the
        // plans alias each other in CacheManager).
        other.foreach(drop)
        val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
        slots.put(key, persisted)
        persisted
    }
  }

  def release(session: SparkSession): Unit = synchronized {
    slots.filterInPlace { case ((sess, _), old) =>
      val mine = sess eq session
      if (mine) drop(old)
      !mine
    }
  }
}
