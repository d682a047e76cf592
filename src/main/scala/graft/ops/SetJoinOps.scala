package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Exact set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008) — the EXACT
  * complement of the MinHash LSH leg: LSH gives probabilistic recall at
  * fixed cost, this gives provably-complete recall while still never
  * comparing all pairs.
  *
  * Prefix-filter principle: order every doc's shingle set by one GLOBAL
  * total order (rarest-first: ascending document frequency, shingle
  * string as tie-break). If J(A,B) ≥ t then the overlap o satisfies
  * o ≥ ceil(t·|A|) and o ≥ ceil(t·|B|); the minimum common element in the
  * global order must then sit within the first |X| − o + 1 elements of
  * BOTH sets (all earlier elements are non-common by minimality, all o−1
  * later common elements push it forward), so the prefixes of length
  * |X| − ceil(t·|X|) + 1 must intersect. Candidates = equi-join of the
  * PREFIXES only; the rarest-first order makes those prefix buckets the
  * emptiest ones. Verification then counts true overlaps on candidate
  * pairs alone.
  *
  * Scale shape: one shingle-keyed shuffle for document frequency, one
  * doc-keyed window for ranks, a prefix-bucket equi-join (shuffle keyed
  * on rare shingles — bounded buckets, never all-pairs), and a
  * candidate-keyed overlap count. Threshold arithmetic is exact integer
  * cross-multiplication (t = [[JacNum]]/[[JacDen]]) — no doubles anywhere,
  * so the DuckDB oracle can replay the BRUTE-FORCE join and a green gate
  * proves completeness (zero false negatives from the filter).
  */
object SetJoinOps {

  /** Jaccard threshold t = JacNum/JacDen. */
  val JacNum = 6
  val JacDen = 10

  /** Shingle width (3-word shingles — the MinHash leg's unit, shared so
    * the exact and approximate paths answer the same question).
    */
  val ShingleN = 3

  /** Per-doc DISTINCT shingle sets: (doc_id, sh). Docs shorter than
    * [[ShingleN]] tokens contribute nothing (Spark's `sequence(1, n)`
    * DESCENDS for n < 1 — the guard is load-bearing).
    */
  private[graft] def docShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens", split(trim(col("text")), "\\s+"))
      .where(size(col("tokens")) >= ShingleN)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, size(tokens) - ${ShingleN - 1}), " +
          s"i -> concat_ws(' ', slice(tokens, i, $ShingleN)))"))).as("sh"))

  /** The prefix frame: each doc's |d| − ceil(t·|d|) + 1 globally-rarest
    * shingles (ceil via (num·sz + den − 1) div den). Exposed for the
    * spec's pruning assertions.
    */
  private[graft] def prefixesOf(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(freq, "sh")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("sh").asc)))
      .join(sizes, "doc_id")
      .where(col("rnk") <= col("sz") -
        expr(s"($JacNum * sz + ${JacDen - 1}) div $JacDen") + lit(1))
      .select(col("doc_id"), col("sh"))
  }

  /** All pairs (doc_a < doc_b) with Jaccard(sh sets) ≥ t, exactly. */
  def jaccardPairs(sh0: DataFrame): DataFrame = {
    val sh = PlanCache.swap("setjoin_shingles", sh0)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val prefix = prefixesOf(sh)
    val cands = prefix.as("a").join(prefix.as("b"), Seq("sh"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates only: count the true overlap, then the exact
    // integer threshold test den·o ≥ num·(|a| + |b| − o)
    val withA = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
    val overlaps = withA
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("overlap"))
    overlaps
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("size_b")), Seq("doc_b"))
      .where(lit(JacDen) * col("overlap") >=
        lit(JacNum) * (col("size_a") + col("size_b") - col("overlap")))
      .select(col("doc_a"), col("doc_b"), col("size_a"), col("size_b"),
        col("overlap"),
        expr("overlap * 1000000L div (size_a + size_b - overlap)")
          .as("jac_ppm"))
  }

  /** Gate `q_jaccard_join_exact`: the oracle replays the BRUTE-FORCE
    * shingle-sharing join (every true pair shares ≥1 shingle for t > 0),
    * so hash-equality proves the prefix filter dropped no true pair.
    */
  def jaccardJoinExact(s: SparkSession, d: String): DataFrame =
    jaccardPairs(docShingles(t(s, d, "documents")))
      .orderBy("doc_a", "doc_b")
}
