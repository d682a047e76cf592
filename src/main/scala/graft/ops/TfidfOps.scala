package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** In-engine embedding generation: feature-hashed TF-IDF document vectors
  * (Weinberger et al. 2009's hashing trick) in EXACT integer fixed point,
  * so the embedding itself — not just its consumers — is oracle-gated.
  * The `embeddings` fixture table covers the given-vectors path (ANN
  * family); this is the path where the corpus has no vectors yet and the
  * engine must produce them.
  *
  * Exactness contract (everything engine/oracle-identical):
  *  - dim(token) = 16-bit fold of md5(token) mod [[Dims]] — the engine's
  *    established cross-engine hash (SamplingOps md5 permutations);
  *  - idf is the ratio surrogate ([[IdfScale]]·N) div df — truncating
  *    integer division, NOT ln(N/df): a float log would break bit-equality
  *    for zero modeling benefit at gate scale (documented deviation);
  *  - vectors are L1-normalized to [[NormScale]] fixed point by truncating
  *    division (all values nonnegative, so Spark `div` ≡ DuckDB `//`).
  *
  * Scale shape: tokenize → one (doc, token)-keyed shuffle for tf → a
  * token-keyed agg for df (on the already-collapsed tf frame) → one
  * (doc, dim)-keyed sum. The kNN consumer broadcasts a probe set and
  * scans the corpus once — the q_knn posture, never all-pairs.
  */
object TfidfOps {

  /** Hashed vector width. 64 keeps gate outputs readable; at 100 TB you
    * raise it (2^18 is typical) — nothing below depends on its value.
    */
  val Dims = 64

  /** idf fixed-point scale (ratio idf = IdfScale·N div df). */
  val IdfScale = 1000L

  /** L1 norm target (per-mille-of-a-million components). */
  val NormScale = 1000000L

  /** kNN gate: probe docs (doc_id < KnnProbes), top-[[TopK]] neighbors. */
  val KnnProbes = 5
  val TopK = 3

  private def hexVal(c: Column): Column =
    call_function("instr", lit("0123456789abcdef"), c) - 1

  /** Feature-hash a token to [0, Dims): leading 16 md5 bits mod Dims. */
  private[graft] def dimOf(tok: Column): Column = {
    val h = md5(tok.cast("binary"))
    ((hexVal(substring(h, 1, 1)) * 4096
      + hexVal(substring(h, 2, 1)) * 256
      + hexVal(substring(h, 3, 1)) * 16
      + hexVal(substring(h, 4, 1))) % Dims).cast("int")
  }

  /** (doc_id, dim, v_fp): L1-normalized hashed TF-IDF, sparse rows (only
    * occupied dims appear; a component may truncate to 0 and still
    * appear — the oracle replays truncation, not a drop rule).
    */
  def hashedVectors(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = tf.select(countDistinct("doc_id").as("n_docs"))
    val v = tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("w", col("tf") * expr(s"($IdfScale * n_docs) div df"))
      .withColumn("dim", dimOf(col("tok")))
      .groupBy("doc_id", "dim").agg(sum("w").as("v"))
    v.withColumn("l1", sum("v").over(Window.partitionBy("doc_id")))
      .select(col("doc_id"), col("dim"),
        expr(s"v * $NormScale div l1").as("v_fp"))
  }

  /** Gate `q_hashed_tfidf`: the embedding rows themselves. */
  def hashedTfidf(s: SparkSession, d: String): DataFrame =
    hashedVectors(t(s, d, "documents")).orderBy("doc_id", "dim")

  /** Exact kNN over the in-engine vectors: per probe (doc_id <
    * [[KnnProbes]]) the top-[[TopK]] corpus docs by integer cosine² score
    * `dot²·1e12 div (na·nb)` — monotone in |cosine| (all components
    * nonnegative ⇒ dot ≥ 0), computed through DECIMAL(38) so the 1e24-
    * range products stay exact; ties by ascending doc_id. One corpus
    * scan, probes broadcast (join fan-out ≤ |probes| per corpus row).
    */
  def tfidfKnn(vecs: DataFrame): DataFrame = {
    val norms = vecs.groupBy("doc_id")
      .agg(sum(col("v_fp") * col("v_fp")).as("nrm"))
    val probes = vecs.where(col("doc_id") < KnnProbes)
      .select(col("doc_id").as("probe_id"), col("dim"), col("v_fp").as("pv"))
    val dots = vecs.join(broadcast(probes), Seq("dim"))
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id").as("other_id"))
      .agg(sum(col("v_fp") * col("pv")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id").as("probe_id"), col("nrm").as("na")),
        Seq("probe_id"))
      .join(norms.select(col("doc_id").as("other_id"), col("nrm").as("nb")),
        Seq("other_id"))
      .withColumn("score_fp", expr(
        """CAST(CAST(dot AS DECIMAL(20,0)) * CAST(dot AS DECIMAL(20,0))
          | * 1000000000000 div
          | (CAST(na AS DECIMAL(20,0)) * CAST(nb AS DECIMAL(20,0)))
          | AS BIGINT)""".stripMargin.replace("\n", " ")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score_fp").desc, col("other_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= TopK)
      .select("probe_id", "rnk", "other_id", "score_fp")
  }

  /** Gate `q_tfidf_knn`. */
  def tfidfKnnQuery(s: SparkSession, d: String): DataFrame = {
    val vecs = PlanCache.swap("tfidf_vectors",
      hashedVectors(t(s, d, "documents")))
    tfidfKnn(vecs).orderBy("probe_id", "rnk")
  }
}
