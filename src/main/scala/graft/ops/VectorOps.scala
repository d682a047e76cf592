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

  /** Scale path for corpus×corpus near-neighbor search: random-hyperplane
    * LSH — sign-bit sketch over `NumPlanes` pseudo-random hyperplanes
    * (deterministically derived per dimension via xxhash64, no RNG state),
    * so candidate pairs come from a bucket-keyed equi-join exactly like
    * MinHash bands. Returns (bucket, vec_id) assignments; the join-side
    * composition is exercised in tests.
    */
  val NumPlanes = 16
  def lshCosineBuckets(s: SparkSession, d: String): DataFrame = {
    // plane p, dim i weight w_pi in [-1, 1): derived from xxhash64(p, i).
    val planeExprs = (0 until NumPlanes).map { p =>
      val signedDot = aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x.cast("double") *
            (pmod(xxhash64(lit(p), i), lit(2000000L)).cast("double") / lit(1000000.0)
              - lit(1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(signedDot >= 0, lit(1L)).otherwise(lit(0L)).as(s"bit_$p")
    }
    val bits = t(s, d, "embeddings").select(col("vec_id") +: planeExprs: _*)
    val bucket = (0 until NumPlanes).map(p =>
      shiftleft(col(s"bit_$p"), p)).reduce(_ + _)
    bits.select(col("vec_id"), bucket.as("bucket")).orderBy("vec_id")
  }
}
