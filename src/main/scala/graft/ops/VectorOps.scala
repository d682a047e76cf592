package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Embedding-similarity operators over `embeddings` (64-dim float vectors).
  *
  * Numeric determinism contract: every reduction is an explicit *in-order
  * left fold* in double precision (float→double widening is exact), so the
  * DuckDB oracle can reproduce the bits with the same fold. No `round()`
  * fudging needed.
  *
  * Scale posture: brute-force top-k is a broadcast-probe block join
  * (small probe set ships to executors; the corpus streams — no corpus×corpus
  * pair materialization, no driver collect). The LSH-bucketed variant for
  * corpus-scale all-neighbors runs the same expressions keyed by hash bucket
  * (see lshCosineBuckets).
  */
object VectorOps {

  /** Σ x_i² as an in-order double fold. */
  private def sumSq(v: Column): Column =
    aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm + first normalized component per vector. */
  def embedNorm(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .withColumn("l2_norm", sqrt(sumSq(col("embedding"))))
      .select(
        col("vec_id"), col("l2_norm"),
        (element_at(col("embedding"), 1).cast("double") / col("l2_norm"))
          .as("first_component_norm"))
      .orderBy("vec_id")

  /** Brute-force cosine top-k: probe set (vec_id < 5) broadcast against the
    * full corpus; rank by exact-fold cosine, ties by neighbor id. Top-1 of
    * each probe is itself (self-check invariant).
    */
  def knnCosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cand_vec"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.crossJoin(broadcast(probes))
      .withColumn("cosine",
        dot(col("probe_vec"), col("cand_vec"))
          / (sqrt(sumSq(col("probe_vec"))) * sqrt(sumSq(col("cand_vec")))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "neighbor_id", "cosine")
      .orderBy("probe_id", "rnk")
  }

  /** Sign bit of the dot product with pseudo-random hyperplane `p` —
    * plane weights in [-1, 1) derived deterministically per dimension via
    * xxhash64 (no RNG state to ship to executors).
    */
  private def planeBit(v: Column, p: Int): Column = {
    val signedDot = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") *
          (pmod(xxhash64(lit(p), i), lit(2000000L)).cast("double") / lit(1000000.0)
            - lit(1.0))),
      lit(0.0), (acc, x) => acc + x)
    when(signedDot >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Scale path for corpus×corpus near-neighbor search: random-hyperplane
    * LSH sign-bit sketch, so candidate pairs come from a bucket-keyed
    * equi-join exactly like MinHash bands. Returns (bucket, vec_id)
    * assignments; the join-side composition is nearDupCosine below.
    */
  val NumPlanes = 16
  def lshCosineBuckets(s: SparkSession, d: String): DataFrame = {
    val bits = t(s, d, "embeddings")
      .select(col("vec_id") +:
        (0 until NumPlanes).map(p => planeBit(col("embedding"), p).as(s"bit_$p")): _*)
    val bucket = (0 until NumPlanes).map(p =>
      shiftleft(col(s"bit_$p"), p)).reduce(_ + _)
    bits.select(col("vec_id"), bucket.as("bucket")).orderBy("vec_id")
  }

  /** Embedding-cosine near-dup detection, banded: 8 bands × 4 sign bits
    * generate candidate pairs through a band-keyed equi-join (OR over
    * bands boosts recall like MinHash banding), then the *exact* cosine
    * confirms ≥ threshold. Never corpus×corpus: the shuffle is keyed by
    * (band, 4-bit key), candidates are verified per bucket. Probabilistic
    * recall, deterministic output (fixed hash planes).
    */
  val DupBands = 8
  val BitsPerBand = 4
  def nearDupCosine(s: SparkSession, d: String, threshold: Double = 0.45): DataFrame =
    nearDupPairs(t(s, d, "embeddings"), threshold)

  /** Core of nearDupCosine over any (vec_id, embedding) frame. */
  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val emb = vectors.withColumn("l2", sqrt(sumSq(col("embedding"))))
    val withBits = (0 until DupBands * BitsPerBand).foldLeft(emb) { (df, p) =>
      df.withColumn(s"bit_$p", planeBit(col("embedding"), p))
    }
    val bandKeys = (0 until DupBands).map { b =>
      (0 until BitsPerBand).map(r =>
        shiftleft(col(s"bit_${b * BitsPerBand + r}"), r)).reduce(_ + _)
    }
    val banded = withBits.select(col("vec_id"), col("embedding"), col("l2"),
      posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
    val a = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("vec_a"), col("embedding").as("ea"), col("l2").as("la"))
    val b = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("vec_b"), col("embedding").as("eb"), col("l2").as("lb"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dot(col("ea"), col("eb")) / (col("la") * col("lb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy("vec_a", "vec_b").agg(first("cosine").as("cosine"))
      .orderBy("vec_a", "vec_b")
  }
}
