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

  /** Per-label embedding centroids: posexplode → groupBy(label, dim) with
    * decimal-exact sums (order-independent) → mean. The scale shape for
    * class statistics over embedding corpora — the shuffle carries
    * labels×dims partials via map-side combine, never whole vectors.
    */
  def labelCentroid(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "x")))
      // fixed-point via floor (identical IEEE op in every engine — decimal
      // casts differ in tie-rounding mode across engines): exact long sums,
      // order-independent
      .withColumn("xq", floor(col("x").cast("double") * lit(1e9)).cast("bigint"))
      .groupBy("label", "dim_idx")
      .agg(count(lit(1)).as("cnt"), sum("xq").as("xsum"))
      .select(col("label"), col("dim_idx"),
        (col("xsum").cast("double") / lit(1e9) / col("cnt")).as("centroid"))
      .orderBy("label", "dim_idx")

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

  /** Deterministic pseudo-random hyperplane weight in [-1, 1) for plane p,
    * dimension i (splitmix64 mix — computed driver-side, shipped as a tiny
    * broadcast table; no RNG state on executors).
    */
  private[graft] def planeWeight(p: Int, i: Int): Double = {
    var z = p.toLong * 0x10001L + i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
  }

  /** Sign-bit sketch over `numPlanes` hyperplanes, computed as
    * explode(dims) ⋈ broadcast(weights) → codegen'd hash aggregation with
    * DECIMAL-exact sums (order-independent → bit-deterministic across
    * shuffles). No interpreted per-element lambdas in the hot path; the
    * shuffle carries vecs×planes partials thanks to map-side combine.
    * Output: (vec_id, l2, bit_0..bit_{n-1}).
    */
  private[ops] val MaxDims = 512
  private[ops] def planeBits(vectors: DataFrame, numPlanes: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val w = (0 until MaxDims)
      .map(i => (i, (0 until numPlanes).map(p => planeWeight(p, i))))
      .toDF("dim_idx", "w")
    // Fail loudly instead of silently sketching a 512-dim prefix (the inner
    // join below would drop dimensions the weights table lacks). The assert
    // is woven into the exploded expression so column pruning can't drop it.
    val checked = when(
      assert_true(size(col("embedding")) <= MaxDims,
        lit(s"planeBits supports at most $MaxDims dims")).isNull,
      col("embedding"))
    val prods = vectors
      .select(col("vec_id"), posexplode(checked).as(Seq("dim_idx", "x")))
      .withColumn("xd", col("x").cast("double"))
      .join(broadcast(w), "dim_idx")
    // Fixed-point: scale products to 1e15 and sum as BIGINT — exact integer
    // accumulation (order-independent => bit-deterministic) on the codegen
    // long fast path; decimal(38,x) sums would fall back to per-row
    // BigDecimal (measured 10x slower across 65 agg columns).
    // Range contract: |x| <= ~95 per element (x²·1e15 < Long.Max) — holds
    // for normalized/bounded embeddings, which is the only sane input here.
    val S = 1e15
    val aggs = (0 until numPlanes).map(p =>
      sum((col("xd") * element_at(col("w"), p + 1) * S).cast("bigint"))
        .as(s"dot_$p")) :+
      sum((col("xd") * col("xd") * S).cast("bigint")).as("l2sq")
    prods.groupBy("vec_id").agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id") +: sqrt(col("l2sq").cast("double") / S).as("l2") +:
        (0 until numPlanes).map(p =>
          when(col(s"dot_$p") >= 0, 1L).otherwise(0L).as(s"bit_$p")): _*)
  }

  /** Scale path for corpus×corpus near-neighbor search: random-hyperplane
    * LSH sign-bit sketch, so candidate pairs come from a bucket-keyed
    * equi-join exactly like MinHash bands. Returns (bucket, vec_id)
    * assignments; the join-side composition is nearDupCosine below.
    */
  val NumPlanes = 16
  def lshCosineBuckets(s: SparkSession, d: String): DataFrame = {
    val bits = planeBits(t(s, d, "embeddings"), NumPlanes)
    val bucket = (0 until NumPlanes).map(p =>
      shiftleft(col(s"bit_$p"), p)).reduce(_ + _)
    bits.select(col("vec_id"), bucket.as("bucket")).orderBy("vec_id")
  }

  /** Embedding-cosine near-dup detection, banded: DupBands bands ×
    * BitsPerBand sign bits generate candidate pairs through a band-keyed
    * equi-join (OR over bands boosts recall like MinHash banding), then the
    * *exact* cosine confirms ≥ threshold. Never corpus×corpus: the shuffle
    * is keyed by (band, band_key), candidates are verified per bucket.
    * Probabilistic recall, deterministic output (fixed hash planes).
    */
  val DupBands = 8
  val BitsPerBand = 8
  def nearDupCosine(s: SparkSession, d: String, threshold: Double = 0.45): DataFrame =
    nearDupPairs(t(s, d, "embeddings"), threshold)

  /** Core of nearDupCosine over any (vec_id, embedding) frame.
    *
    * Stages (each the codegen'd, shuffle-minimal shape):
    *  1. sign-bit sketch via [[planeBits]] (one pass, decimal-exact);
    *  2. band keys → posexplode → self-equi-join on (band, key) →
    *     DISTINCT candidate pairs *before* any vector math (band overlap
    *     would otherwise recompute each pair's cosine up to DupBands×);
    *  3. exact-cosine confirm: candidates rejoin the vectors, the dot
    *     product runs as explode + element_at + decimal sum (codegen'd
    *     hash agg, order-independent, no interpreted lambdas).
    */
  /** Previous invocation's persisted sketch — released on the next call so
    * repeated runs in one session hold at most one sketch in cache.
    */
  private var lastSketch: Option[DataFrame] = None

  def nearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    // The sketch feeds three branches (band join sides + norms): persist it
    // so the plan computes it once. At cluster scale this is the "write the
    // sketch table" step of a production near-dup job.
    val bits = planeBits(vectors, DupBands * BitsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized {
      lastSketch.foreach(_.unpersist(blocking = false))
      lastSketch = Some(bits)
    }
    val bandKeys = (0 until DupBands).map { b =>
      (0 until BitsPerBand).map(r =>
        shiftleft(col(s"bit_${b * BitsPerBand + r}"), r)).reduce(_ + _)
    }
    val banded = bits.select(col("vec_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
    val cands = banded.alias("a")
      .join(banded.alias("b"), Seq("band_idx", "band_key"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
      .distinct()

    // Confirm stage: vectors exploded ONCE into (vec_id, i, x) — no array
    // duplication through the pair expansion; both joins are keyed
    // equi-joins (AQE broadcasts the small side when it fits).
    val ex = vectors
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("xd", col("x").cast("double"))
    val prods = cands
      .join(ex.select(col("vec_id").as("vec_a"), col("i"), col("xd").as("xa")), "vec_a")
      .join(ex.select(col("vec_id").as("vec_b"), col("i"), col("xd").as("xb")),
        Seq("vec_b", "i"))
      .select(col("vec_a"), col("vec_b"),
        (col("xa") * col("xb") * lit(1e15)).cast("bigint").as("prod"))
    val norms = bits.select(col("vec_id"), col("l2"))
    prods.groupBy("vec_a", "vec_b")
      .agg((sum("prod").cast("double") / lit(1e15)).as("dot"))
      .join(norms.select(col("vec_id").as("vec_a"), col("l2").as("la")), "vec_a")
      .join(norms.select(col("vec_id").as("vec_b"), col("l2").as("lb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (col("dot") / (col("la") * col("lb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
