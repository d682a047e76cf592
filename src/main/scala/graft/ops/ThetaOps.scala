package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** KMV (k-minimum-values) theta sketch with SET-OPERATION estimates —
  * the distinct-count sketch family member HLL cannot provide: a KMV
  * sample is a uniform sample of the distinct-value universe, so two
  * sketches support union AND INTERSECTION estimates (Beyer et al. 2007;
  * the Apache DataSketches "theta" posture), where HLL only merges by
  * union. The 100 TB story: audience/overlap analytics ("how many
  * orders had both a returned and an accepted line") without ever
  * shuffling the corpus onto one machine — each shard keeps its K
  * smallest distinct hash values and sketches MERGE by taking the K
  * smallest of the union (law-tested in ThetaOpsSpec).
  *
  * Exact-integer rendering (the engine's cross-engine contract): the
  * hash is the leading-[[HashHexChars]] md5 fold + 1 — uniform on
  * [1, [[M]]] and identically computable in Spark (`conv(substr(md5),
  * 16, 10)`) and DuckDB (`('0x' || substr(md5))::BIGINT`) — so unlike
  * the CM/HLL gates (constant verdict columns), the ESTIMATES themselves
  * replay integer-for-integer in the oracle:
  *
  *   theta    = K-th smallest distinct hash value of the set
  *   est      = (K-1)·M div theta            (cnt < K ⇒ est = cnt, exact)
  *   union    = K smallest of the merged samples → same estimator
  *   common   = |{v ∈ S_A ∩ S_B : v ≤ theta_i}|·M div theta_i,
  *              theta_i = min(theta_A, theta_B)
  *
  * (the ≤-boundary convention is part of the contract: the K-th value is
  * IN the sample; both engines apply it identically, and the O(1/K)
  * estimator bias it carries is far inside the sketch's own noise).
  *
  * Scale shape: ONE key-volume distinct shuffle on (tag, key) feeds both
  * the sketch and the gate's exact-verdict counts; the per-tag K-min is
  * a `row_number() <= K` filter Spark compiles to WindowGroupLimit
  * (per-partition heaps — the partial limit runs map-side, never a full
  * sort); everything downstream operates on ≤ 2K rows (the lone
  * unpartitioned window in the union estimator is over the merged
  * SAMPLE, bounded by 2K by construction). The exact-count legs exist
  * for the gate's verdict columns only — a production overlap query
  * ships the sketch columns alone (the q_approx_distinct posture).
  */
object ThetaOps {

  /** Sketch size: σ ≈ 1/√(K−2) ≈ 6.3% per-set relative error. */
  val K = 256

  /** md5 hex chars folded into the hash: 12 → a 48-bit universe, so
    * (K−1)·M ≈ 7.2e16 stays far inside Long.
    */
  val HashHexChars = 12
  val M: Long = 1L << (4 * HashHexChars)

  /** Tolerance for the gate's verdict columns: ±30% (≈ 5σ per-set; the
    * intersection's effective sample ≈ K·|∩|/|∪| ≈ 150 on the fixture,
    * σ ≈ 8% — still ≥ 3.7σ of slack).
    */
  val TolNum = 3L
  val TolDen = 10L

  /** The cross-engine hash: leading 48 md5 bits of the key's decimal
    * string + 1 ∈ [1, M].
    */
  private[graft] def hvOf(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, HashHexChars),
      16, 10).cast("long") + 1

  /** K smallest distinct hash values per tag — the KMV sketch itself.
    * Input must be (tag, hv)-distinct; `rn` is the 1-based rank.
    */
  private[graft] def kMin(hvs: DataFrame): DataFrame =
    hvs.withColumn("rn",
        row_number().over(Window.partitionBy("tag").orderBy("hv")))
      .filter(col("rn") <= K)

  /** Merge two sketch samples (same schema as [[kMin]] output): the K
    * smallest of the DISTINCT union per tag — the shard-merge law:
    * kMin(S₁ ∪ S₂) = merge(kMin(S₁), kMin(S₂)) (ThetaOpsSpec).
    */
  def mergeSamples(a: DataFrame, b: DataFrame): DataFrame =
    kMin(a.select("tag", "hv").unionByName(b.select("tag", "hv")).distinct())

  /** est = (K−1)·M div theta (truncating integer division — the
    * cross-engine contract), degrading to the exact count below K.
    */
  private def estCol(cnt: String, theta: String): Column =
    when(col(cnt) < K, col(cnt))
      .otherwise(expr(s"${(K - 1).toLong * M}L div $theta"))

  /** Persisted KMV sample table ([[buildThetaSketch]]). */
  val ThetaTable = "theta_sample"

  /** (tag, hv) K-min sample of a (tag, key) batch — the mergeable unit. */
  def thetaBatchSample(keys: DataFrame): DataFrame =
    kMin(keys.select(col("tag"), hvOf(col("key")).as("hv")).distinct())
      .select("tag", "hv")

  /** Build/refresh the stored sketch from a (tag, key) frame — the ANN
    * build posture: the corpus pays one distinct shuffle, the stored
    * state is ≤ K rows per tag.
    */
  def buildThetaSketch(keys: DataFrame, db: String): Unit =
    graft.store.Warehouse.saveModel(thetaBatchSample(keys), db, ThetaTable)

  /** Exactly-once streaming growth — WITHOUT an epoch ledger: the fold
    * `stored ← kMin(stored ∪ batchSample)` is set-union + deterministic
    * K-min, so it is IDEMPOTENT — a redelivered batch folds to the
    * bit-identical table (unlike every count-model family, which needs
    * [[graft.pipeline.DeltaModelIngest]] to absorb redelivery). A crash
    * mid-rewrite is recovered by the rewriteVia temp-table protocol.
    */
  def thetaSink(db: String): (DataFrame, Long) => Unit =
    (batch, _) => {
      val s = batch.sparkSession
      val samp = thetaBatchSample(batch)
      if (!s.catalog.tableExists(s"$db.$ThetaTable"))
        graft.store.Warehouse.saveModel(samp, db, ThetaTable)
      else
        graft.store.Warehouse.rewriteVia(s, db, ThetaTable)(stored =>
          kMin(stored.select("tag", "hv").unionByName(samp).distinct())
            .select("tag", "hv"))
    }

  /** Scheduled sketch rebuild — re-anchors the sample to the full corpus
    * on the cron cadence (mirrors lmRefreshEntry; after heavy deletes the
    * K-min sample can only be shrunk by a rebuild, since a KMV sample
    * supports insert-merge but not exact deletion).
    */
  def thetaRefreshEntry(id: String, cronExpr: String, db: String,
                        keys: SparkSession => DataFrame)
      : graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildThetaSketch(keys(s), db),
      name = "theta_sketch_refresh", target = s"$db.$ThetaTable",
      tags = Map("pipeline" -> "distinct-sketch"))

  /** Serve distinct-count estimates straight off the stored sample —
    * production posture: no exact verdict legs, no corpus scan; the
    * whole plan reads ≤ K rows per tag.
    */
  def thetaEstimatesFromModel(s: SparkSession, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    s.table(s"`$db`.`$ThetaTable`")
      .groupBy("tag")
      .agg(max("hv").as("theta"), count(lit(1)).as("cnt"))
      .withColumn("est", estCol("cnt", "theta"))
      .select("tag", "cnt", "theta", "est")
      .orderBy("tag")
  }

  /** Day-range for the [[thetaDaily]] merged estimate. */
  val DailyRangeLo = 10L
  val DailyRangeHi = 20L
  private val DayNs = 86400000000000L
  private val MinuteNs = 60000000000L

  /** Time-partitioned sketch rollup — the production pattern KMV
    * mergeability exists for: per-DAY samples of a distinct universe
    * (active user-minutes) land as day rows, and an arbitrary DATE-RANGE
    * distinct estimate comes from MERGING the per-day samples alone
    * (K smallest of their union) — the events table is never rescanned
    * for the range, which at 100 TB is the difference between answering
    * "distinct actives for any date range" from day-partitioned
    * K-row samples and re-shuffling a quarter's raw events per question.
    * The range row rides with day = −1; every estimate replays exactly
    * (the cross-engine md5 fold). The per-day K-min is one
    * WindowGroupLimit over the (day, hv) distinct set; the range merge
    * touches ≤ K·days rows.
    */
  def thetaDaily(s: SparkSession, d: String): DataFrame = {
    val keys = t(s, d, "events").select(
      expr(s"ts div $DayNs").cast("string").as("tag"),
      concat_ws(":", col("user_id"),
        expr(s"(ts % $DayNs) div $MinuteNs")).as("k"))
    val hvs = PlanCache.swap(s"theta-daily-$d",
      keys.select(col("tag"), hvOf(col("k")).as("hv")).distinct())
    val samp = kMin(hvs)
    val perDay = samp.groupBy("tag")
      .agg(max("hv").as("theta"), count(lit(1)).as("cnt"))
      .withColumn("est", estCol("cnt", "theta"))
      .select(col("tag").cast("long").as("day"), col("cnt"),
        col("theta"), col("est"))
    val range = samp
      .filter(col("tag").cast("long") >= DailyRangeLo &&
        col("tag").cast("long") < DailyRangeHi)
      .select("hv").distinct()
      .withColumn("rn", row_number().over(Window.orderBy("hv")))
      .filter(col("rn") <= K)
      .agg(max("hv").as("theta"), count(lit(1)).as("cnt"))
      .withColumn("est", estCol("cnt", "theta"))
      .select(lit(-1L).as("day"), col("cnt"), col("theta"), col("est"))
    perDay.unionByName(range).orderBy("day")
  }

  /** Gate `q_theta_sketch`: KMV estimates vs exact counts for A = orders
    * with a returned line (l_returnflag 'R'), B = orders with an 'A'
    * line, their union and their intersection — one row, every column
    * (including the verdicts) replayed exactly by the oracle.
    */
  def thetaSketchOverlap(s: SparkSession, d: String): DataFrame = {
    // dk feeds the exact-verdict legs AND the sketch, and samp feeds
    // three sample-sized tails — persisted once each so no branch
    // recomputes the lineitem scan + distinct (without the cache every
    // crossJoin branch re-ran them: 8.8 s → ~1 s at sf0.1)
    val dk = PlanCache.swap(s"theta-dk-$d", t(s, d, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag").as("tag"), col("l_orderkey").as("k"))
      .distinct())
    // exact verdicts: one key-keyed aggregation (has_r/has_a per order)
    val flags = dk.groupBy("k").agg(
      max((col("tag") === "R").cast("long")).as("has_r"),
      max((col("tag") === "A").cast("long")).as("has_a"))
    val exact = flags.agg(
      sum("has_r").as("exact_r"), sum("has_a").as("exact_a"),
      count(lit(1)).as("exact_union"),
      sum(col("has_r") * col("has_a")).as("exact_common"))
    // sketch: distinct hash values per tag, K smallest
    val samp = PlanCache.swap(s"theta-samp-$d",
      kMin(dk.withColumn("hv", hvOf(col("k")))
        .select("tag", "hv").distinct()))
    val perTag = samp.groupBy("tag")
      .agg(max("hv").as("theta"), count(lit(1)).as("cnt"))
    val tags = perTag.agg(
      max(when(col("tag") === "R", col("theta"))).as("theta_r"),
      max(when(col("tag") === "R", col("cnt"))).as("cnt_r"),
      max(when(col("tag") === "A", col("theta"))).as("theta_a"),
      max(when(col("tag") === "A", col("cnt"))).as("cnt_a"))
    // union: K smallest of the merged samples (≤ 2K rows — the
    // unpartitioned window is sample-bounded)
    val uni = samp.select("hv").distinct()
      .withColumn("rn", row_number().over(Window.orderBy("hv")))
      .filter(col("rn") <= K)
      .agg(max("hv").as("theta_u"), count(lit(1)).as("cnt_u"))
    // intersection sample: hash values present in BOTH tags, inside the
    // joint theta — ≤ K rows per side
    val common = samp.filter(col("tag") === "R").select("hv")
      .join(samp.filter(col("tag") === "A").select("hv"), "hv")
    val cic = common
      .crossJoin(broadcast(tags.select(
        least(col("theta_r"), col("theta_a")).as("ti"))))
      .filter(col("hv") <= col("ti"))
      .agg(count(lit(1)).as("cnt_i"))
    val row = exact.crossJoin(broadcast(tags)).crossJoin(broadcast(uni))
      .withColumn("theta_i", least(col("theta_r"), col("theta_a")))
    def ok(est: Column, exact: Column): Column =
      (abs(est - exact) * TolDen <= exact * TolNum).cast("int")
    row.crossJoin(broadcast(cic))
      .withColumn("est_r", estCol("cnt_r", "theta_r"))
      .withColumn("est_a", estCol("cnt_a", "theta_a"))
      .withColumn("est_union", estCol("cnt_u", "theta_u"))
      .withColumn("est_common",
        when(col("cnt_r") < K && col("cnt_a") < K,
          // both sets fully sampled: the intersection count is exact
          col("cnt_i"))
          .otherwise(expr(s"cnt_i * ${M}L div theta_i")))
      .withColumn("r_ok", ok(col("est_r"), col("exact_r")))
      .withColumn("a_ok", ok(col("est_a"), col("exact_a")))
      .withColumn("union_ok", ok(col("est_union"), col("exact_union")))
      .withColumn("common_ok", ok(col("est_common"), col("exact_common")))
      .select("exact_r", "est_r", "exact_a", "est_a",
        "exact_union", "est_union", "exact_common", "est_common",
        "r_ok", "a_ok", "union_ok", "common_ok")
  }
}
