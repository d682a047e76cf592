package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Induced JOIN skew (the q_groupby_salted analogue for the join family):
  * one key owning ~80% of the fact side must trigger AQE's skew-join
  * split on the merge path, and the split must actually level per-task
  * work — asserted on per-task shuffle-read record counts (deterministic,
  * unlike wall time). The measured before/after task profile is recorded
  * in NOTES_r08.md.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Max + p99 shuffle-read records per task while running `body`. */
  private def taskReadProfile(body: => Unit): (Long, Long) = {
    val reads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) reads.synchronized {
          reads += e.taskMetrics.shuffleReadMetrics.recordsRead
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener delivery is async; wait for the event stream to go quiet
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val n = reads.synchronized(reads.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val sorted = reads.synchronized(reads.sorted.toIndexedSeq)
    if (sorted.isEmpty) (0L, 0L)
    else (sorted.last, sorted((sorted.size * 99 / 100).min(sorted.size - 1)))
  }

  // one hot key = 80% of fact rows (the verdict's "one key = 20%" is the
  // mild case; 80% makes the skew unambiguous at test scale)
  private lazy val fact: DataFrame = {
    // INCOMPRESSIBLE payload (shuffle blocks are lz4'd — a constant pad
    // would compress below the skew threshold and hide the skew)
    val rnd = new scala.util.Random(42)
    def pad() = rnd.alphanumeric.take(120).mkString
    val hot = (1 to 20000).map(_ => (7L, pad()))
    val rest = for (k <- 1 to 50 if k != 7; _ <- 1 to 100) yield (k.toLong, pad())
    (hot ++ rest).toDF("k", "payload")
  }
  private lazy val dim: DataFrame =
    (1 to 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")

  private val skewConfs = Map(
    // pin the merge path: broadcast would hide the shuffle skew entirely
    // (and IS the right fix for a dim this small — this test induces the
    // fact-fact shape where broadcast isn't available)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // fixture-scale thresholds (defaults are 256 MB-class): a partition
    // 2x the median and > 256 KB splits into ~128 KB reads
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")

  test("AQE skew-join split fires on the induced skew and levels task reads") {
    val (maxOff, p99Off) = withConfs(skewConfs +
      ("spark.sql.adaptive.skewJoin.enabled" -> "false")) {
      taskReadProfile(fact.join(dim, "k").count())
    }
    var plan = ""
    val (maxOn, p99On) = withConfs(skewConfs) {
      val joined = fact.join(dim, "k")
      // execute THIS QueryExecution (df.count() would build its own and
      // leave joined's adaptive plan un-finalized)
      val prof = taskReadProfile(joined.queryExecution.toRdd.count())
      plan = joined.queryExecution.executedPlan.toString
      prof
    }
    // the split is IN the executed plan, not inferred from timings
    assert(plan.contains("isFinalPlan=true"), plan.take(400))
    assert(plan.contains("skew=true"),
      s"AQE skew-join split did not fire:\n${plan.take(2000)}")
    // and it leveled the work: without the split one task reads the whole
    // hot key (~20k records); with it, the hot partition is divided
    assert(maxOff >= 20000L,
      s"skew fixture broken — expected a >=20k-record task, got $maxOff")
    assert(maxOn <= maxOff / 4,
      s"skew split should divide the hot task >=4x: off=$maxOff on=$maxOn")
    System.err.println(
      f"[skew-join] task shuffle-read records: split OFF max=$maxOff%d " +
        f"p99=$p99Off%d -> split ON max=$maxOn%d p99=$p99On%d")
  }

  test("fixture join family is skew-safe: AQE leaves balanced joins alone") {
    // the real fixture join (orders x lineitem at sf0.001) under the same
    // aggressive thresholds: no partition is skewed, so the plan must NOT
    // carry a skew split (the optimization is surgical, not a blanket tax)
    withConfs(skewConfs) {
      val j = graft.ops.Relational.joinEqui(spark, sf)
      j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"balanced fixture join unexpectedly split:\n${plan.take(1500)}")
    }
  }
}
