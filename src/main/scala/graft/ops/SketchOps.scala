package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Mergeable count-min sketch + heavy-hitter mining over corpus n-grams —
  * the boilerplate-phrase detector at 100 TB: exact gram counts need a
  * gram-keyed shuffle of the full token volume, but a CM sketch is a fixed
  * depth×width integer grid that every shard builds locally and merges by
  * ADDITION, so hot-phrase monitoring can ride a map-side-combined
  * aggregation whose reduce state is bounded by the grid, not the
  * vocabulary (Cormode & Muthukrishnan 2005).
  *
  * Row r of the grid hashes a gram to `xxhash64(r, g) mod width` and sums
  * counts; the point estimate is the MIN over rows, which never
  * under-counts (every cell the gram touches holds its true count plus
  * non-negative collision mass) and over-counts by at most the colliding
  * mass — expected total/width per row, taken to the min across [[Depth]]
  * independent rows.
  *
  * The registry gate mines the exact top-[[TopK]] trigrams (replayable
  * arithmetic) and ASSERTS the sketch contract on each: estimate ≥ exact,
  * and estimate − exact within [[SlackMult]]·total/width — the
  * q_approx_distinct tolerance-gate posture (a broken sketch
  * hash-mismatches the constant verdict column, loudly).
  *
  * Scale shape: gram counts are ONE token-volume shuffle (map-side
  * combined); the sketch reduces the VOCAB-sized count table onto
  * depth×width cells; the exact top-k is a TakeOrderedAndProject (never a
  * single-partition window over the full vocabulary — the k-row frame
  * gets its rank column after the cut, where single-partition is k rows
  * by construction); estimate lookups fan the k rows ×depth against the
  * grid.
  */
object SketchOps {

  val Depth = 4
  val Width = 4096L
  val TopK = 20
  val SlackMult = 8L
  val GramN = 3

  private def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("tokens", TextOps.tokensOf(col("text")))

  /** Exploded n-gram occurrences (one row per position). */
  private[graft] def gramsOf(docs: DataFrame, n: Int = GramN): DataFrame =
    withTokens(docs)
      .filter(size(col("tokens")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(tokens) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(tokens, i, $n)))")).as("g"))

  /** CM grid from a (g, cnt) frame: depth×width cells, each the sum of the
    * counts hashing into it. Addition-mergeable: the grid of a union is
    * the cell-wise sum of the shards' grids (law in SketchOpsSpec).
    */
  private[graft] def sketchOf(gramCounts: DataFrame, depth: Int = Depth,
                              width: Long = Width): DataFrame =
    gramCounts
      .select(col("g"), col("cnt"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", pmod(xxhash64(col("r"), col("g")), lit(width)))
      .groupBy("r", "bucket").agg(sum("cnt").as("bsum"))

  /** Point estimates for a (g, ...) frame against a grid: min over the
    * gram's [[Depth]] cells.
    */
  private[graft] def estimateAgainst(grams: DataFrame, sketch: DataFrame,
                                     depth: Int = Depth,
                                     width: Long = Width): DataFrame =
    grams
      .select(col("g"), explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("bucket", pmod(xxhash64(col("r"), col("g")), lit(width)))
      .join(sketch, Seq("r", "bucket"))
      .groupBy("g").agg(min("bsum").as("est"))

  /** Approximate-quantile sketch gate — completes the mergeable-sketch
    * quartet (HLL cardinality, bloom membership, count-min frequency,
    * quantiles): Spark's `percentile_approx` (a KLL-family rank sketch,
    * mergeable across partitions/shards by construction) is checked
    * against the EXACT discrete percentile derived by the
    * [[Relational.percentileByStatus]] cum/frequency arithmetic, with the
    * verdict expressed in RANK space — the sketch's actual guarantee
    * (value-space error is data-dependent; rank error is bounded by the
    * accuracy parameter). est's rank must land within max(n/100, 2) of
    * the target rank at accuracy 10⁴ (guarantee: n/10⁴) — the
    * q_approx_distinct tolerance-gate posture.
    */
  val PctAccuracy = 10000
  def approxPercentile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(s, d, "lineitem")
      .withColumn("cents",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
    val freq = li.groupBy("l_returnflag", "cents")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pc = freq
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(Window.partitionBy("l_returnflag")))
    val exact = pc.groupBy("l_returnflag").agg(
      max("n").as("n_items"),
      min(when(col("cum") > expr("(n - 1) * 5 div 10"), col("cents")))
        .as("p50_disc"),
      min(when(col("cum") > expr("(n - 1) * 9 div 10"), col("cents")))
        .as("p90_disc"))
    val approx = li.groupBy("l_returnflag")
      .agg(expr(s"percentile_approx(cents, array(0.5D, 0.9D), $PctAccuracy)")
        .as("ap"))
      .select(col("l_returnflag"), col("ap")(0).as("a50"),
        col("ap")(1).as("a90"))
    val ranks = approx
      .join(pc.select("l_returnflag", "cents", "cum"), Seq("l_returnflag"))
      .groupBy("l_returnflag", "a50", "a90")
      .agg(max(when(col("cents") <= col("a50"), col("cum"))).as("cum50"),
        max(when(col("cents") <= col("a90"), col("cum"))).as("cum90"))
    exact.join(ranks, Seq("l_returnflag"))
      .withColumn("tol", greatest(expr("n_items div 100"), lit(2L)))
      .select(col("l_returnflag"), col("n_items"), col("p50_disc"),
        col("p90_disc"),
        (abs(col("cum50") - (expr("(n_items - 1) * 5 div 10") + 1))
          <= col("tol")).cast("int").as("p50_within"),
        (abs(col("cum90") - (expr("(n_items - 1) * 9 div 10") + 1))
          <= col("tol")).cast("int").as("p90_within"))
      .orderBy("l_returnflag")
  }

  /** Registry gate: exact top-k trigrams + the sketch contract verdicts. */
  def heavyNgramsSketch(s: SparkSession, d: String): DataFrame = {
    val counts = gramsOf(t(s, d, "documents"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    val sk = sketchOf(counts)
    // global top-k via TakeOrderedAndProject; the rank column attaches
    // AFTER the k-row cut (single-partition over exactly k rows)
    val top = counts.orderBy(col("cnt").desc, col("g").asc).limit(TopK)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("cnt").desc, col("g").asc)))
    top
      .join(estimateAgainst(top, sk), Seq("g"))
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("g"), col("cnt"),
        (col("est") >= col("cnt")).cast("int").as("ge_exact"),
        (col("est") - col("cnt") <=
          expr(s"(${SlackMult}L * total) div $Width")).cast("int")
          .as("within_bound"))
      .orderBy("rnk")
  }
}
