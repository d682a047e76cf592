package graft.ops

import org.apache.spark.sql.Row

/** Loud-refusal helpers for lifecycle drivers that anchor on a min/max
  * aggregate. An empty input frame yields a NULL aggregate cell; without
  * a guard the driver surfaces that as an opaque `NullPointerException`
  * deep inside `getLong`, instead of the named refusals the stored-model
  * lifecycles use everywhere else (the `buildTrending` precedent,
  * BasketOps.scala).
  */
object Guards {

  /** Require the first cell of an aggregate row to be non-NULL, naming
    * the operator and the anchor in the refusal. Returns the row so the
    * guard chains inline at the `.head` site.
    */
  def anchored(r: Row, op: String, what: String): Row = {
    require(!r.isNullAt(0),
      s"$op: $what is NULL — the input frame is empty, so there is " +
        "nothing to anchor on; ingest rows before running this driver")
    r
  }
}
