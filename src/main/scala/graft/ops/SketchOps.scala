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
