package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Market-basket association mining (Agrawal & Srikant 1994's support/
  * confidence frame) over the order fixtures: which part brands co-occur
  * in one order, and which co-occurrences are RULES (directional
  * confidence) rather than popularity artifacts (lift) — the
  * collocation/PMI idea ([[TextOps]]) transplanted from token windows to
  * transaction baskets.
  *
  * Everything is an exact integer or ppm rational: supports are order
  * counts, confidence = supp(a∪b)·10⁶ div supp(a), lift =
  * supp(a∪b)·n·10⁶ div (supp(a)·supp(b)) through DECIMAL(38) (the
  * chi-square precedent: supp·n·10⁶ ≈ 10²⁶ at 100 TB — past Long,
  * inside DECIMAL(38)/HUGEINT), so the DuckDB replay is cell-exact.
  */
object BasketOps {

  /** ppm scale for confidence/lift. */
  val Ppm = 1000000L

  /** Minimum pair support (orders containing both items). */
  val MinSupp = 10L

  /** Directional association rules ante→cons over per-order brand
    * baskets.
    *
    * Scale shape: one (order, brand) DISTINCT shuffle builds the basket
    * frame; the pair generator is a SELF-JOIN ON THE ORDER KEY, so
    * candidates are C(k,2) per basket — bounded by basket width (itself
    * catalog-bounded), never a catalog×catalog or order×order product;
    * pair counts and item supports are map-side-combined aggs; supports
    * join back BROADCAST (item- and pair-vocabulary sized). The basket
    * count is a 1-row broadcast. Nothing downstream of the first
    * distinct sees lineitem volume.
    */
  def assocRules(s: SparkSession, d: String): DataFrame =
    rulesOver(t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select(
        col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
      .select(col("l_orderkey"), col("p_brand")), MinSupp)

  /** The rule mine over a raw `(l_orderkey, p_brand)` membership frame
    * (deduplicated here) — separable so specs pin hand-counted supports
    * and truncated ppm ratios.
    */
  def rulesOver(membership: DataFrame, minSupp: Long): DataFrame = {
    val baskets = membership.distinct()
    val nBaskets = baskets.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n"))
    val itemSupp = baskets.groupBy("p_brand").agg(count(lit(1)).as("supp"))
    val a = baskets.select(col("l_orderkey"), col("p_brand").as("ante"))
    val b = baskets.select(col("l_orderkey"), col("p_brand").as("cons"))
    val pairs = a.join(b, "l_orderkey")
      .where(col("ante") < col("cons"))
      .groupBy("ante", "cons").agg(count(lit(1)).as("supp_pair"))
      .where(col("supp_pair") >= minSupp)
    // both rule directions from each unordered pair
    val rules = pairs.unionByName(pairs.select(
      col("cons").as("ante"), col("ante").as("cons"), col("supp_pair")))
    rules
      .join(broadcast(itemSupp.select(col("p_brand").as("ante"),
        col("supp").as("supp_ante"))), "ante")
      .join(broadcast(itemSupp.select(col("p_brand").as("cons"),
        col("supp").as("supp_cons"))), "cons")
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("supp_pair"),
        col("supp_ante"), col("supp_cons"),
        expr(s"CAST((supp_pair * $Ppm) div supp_ante AS BIGINT)")
          .as("conf_ppm"),
        expr(s"CAST((CAST(supp_pair AS DECIMAL(38,0)) * n * $Ppm) div " +
          "(CAST(supp_ante AS DECIMAL(38,0)) * supp_cons) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy("ante", "cons")
  }
}
