package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dominant-direction extraction over the in-engine TF-IDF vectors: power
  * iteration against the Gram matrix G = Σ v·vᵀ, in EXACT integer fixed
  * point — the linear-algebra leg of the walk family (PageRank/HITS walk
  * the link graph; this walks feature space). The converged direction is
  * the corpus's dominant semantic axis; projecting docs onto it gives a
  * spectral ordering usable for layout, stratified sampling, or
  * diversity-aware selection.
  *
  * The iteration never materializes G (Dims² cells would be fine here,
  * but the two-pass form is the one that scales to 2^18-dim hashed
  * spaces): each round computes s_doc = ⟨v_doc, u⟩ div [[UScale]] with a
  * broadcast of the 64-entry u vector, then w = Σ_docs v_doc · s_doc, and
  * renormalizes u to L∞ = [[UScale]] by truncating division. All
  * nonnegative integers (TF-IDF components are nonnegative, so the
  * Perron direction IS the dominant one and max-norm never needs a sign):
  * the DuckDB oracle replays every round as MATERIALIZED CTE stages and
  * lands bit-identically.
  *
  * Overflow bounds: v_fp ≤ 1e6 (L1-normalized), u ≤ 1e6 ⇒ s_raw ≤
  * Dims·1e12 < 2⁶³; after the div, s ≤ Dims·1e6, so the per-term product
  * v·s ≤ Dims·1e12 and the dim sum runs through DECIMAL (HUGEINT in the
  * oracle) — exact for any corpus size up to 10³⁸⁻¹⁴ rows.
  *
  * Scale shape: per round ONE broadcast join + doc-keyed partial agg and
  * one dim-keyed agg (64 groups, map-side combined); the u vector is
  * driver-held bounded metadata (Dims entries — the Lloyd's-centroid
  * posture). Rounds are a fixed constant: convergence is geometric in
  * λ₂/λ₁ and the gate freezes [[Rounds]].
  */
object SpectralOps {

  val Rounds = 8
  val UScale = 1000000L

  /** Power-iterate over (doc_id, dim, v_fp) rows; returns the final u as
    * (dim, u_fp) for all dims in [0, [[TfidfOps.Dims]]).
    */
  def powerDirection(vecs: DataFrame): Seq[(Int, Long)] = {
    val s = vecs.sparkSession
    import s.implicits._
    var u: Seq[(Int, Long)] =
      (0 until TfidfOps.Dims).map(d => d -> UScale)
    for (_ <- 1 to Rounds) {
      val uDf = broadcast(u.toDF("dim", "u"))
      val sd = vecs.join(uDf, Seq("dim"))
        .groupBy("doc_id").agg(sum(col("v_fp") * col("u")).as("sraw"))
        .select(col("doc_id"), expr(s"sraw div $UScale").as("sd"))
      val w = vecs.join(sd, Seq("doc_id"))
        .groupBy("dim")
        .agg(sum(expr("CAST(v_fp AS DECIMAL(18,0)) * CAST(sd AS DECIMAL(18,0))"))
          .as("w"))
        .collect()
        .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
      val mx = w.values.max
      u = (0 until TfidfOps.Dims)
        .map(d => d -> (w.getOrElse(d, BigInt(0)) * UScale / mx).toLong)
    }
    u
  }

  private def vecsOf(s: SparkSession, d: String): DataFrame =
    PlanCache.swap("tfidf_vectors",
      TfidfOps.hashedVectors(graft.Tables.t(s, d, "documents")))

  /** Gate `q_power_direction`: the converged direction, one row per dim. */
  def powerDirectionQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    powerDirection(vecsOf(s, d)).toDF("dim", "u_fp").orderBy("dim")
  }

  /** Per-doc projection onto the dominant direction (sum-then-div, the
    * same truncation order as the iteration's s_doc).
    */
  def spectralProjection(vecs: DataFrame, u: Seq[(Int, Long)]): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    vecs.join(broadcast(u.toDF("dim", "u")), Seq("dim"))
      .groupBy("doc_id").agg(sum(col("v_fp") * col("u")).as("sraw"))
      .select(col("doc_id"), expr(s"sraw div $UScale").as("proj_fp"))
  }

  /** Gate `q_spectral_order`: docs ranked along the dominant axis. */
  def spectralOrderQuery(s: SparkSession, d: String): DataFrame = {
    val vecs = vecsOf(s, d)
    spectralProjection(vecs, powerDirection(vecs))
      .orderBy(col("proj_fp").desc, col("doc_id"))
  }
}
