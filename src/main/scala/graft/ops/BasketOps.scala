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

  /** Minimum triple support. */
  val MinSuppTriple = 5L

  /** Exponential-decay half-life (days) and the power-of-two decay
    * scale for [[trendingBrands]].
    */
  val TrendScale = 1048576L // 2^20
  val TrendMaxAge = 20L

  /** Recency-weighted brand demand ("trending"): each order contributes
    * weight 2²⁰ ≫ age_days (one halving per day old, floored at
    * [[TrendMaxAge]] days → weight 1, never 0) — exponential decay kept
    * EXACT by making the decay base 2 and the arithmetic a right shift,
    * where a float exp() would never replay cross-engine. The anchor is
    * the corpus max order date (pinned data-derived time — the engine's
    * no-wall-clock rule).
    *
    * Scale shape: one lineitem⨝orders key join (both data-sized,
    * hash-partitioned) + broadcast part brand + one brand agg; the
    * 1-row max-date anchor broadcasts. Gate `q_trending_brands`.
    */
  def trendingBrands(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders").select(
      col("o_orderkey").as("l_orderkey"),
      expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 div " +
        s"${EventOps.DayNs}").as("day"))
    val anchor = orders.agg(max("day").as("max_day"))
    val weighted = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select(
        col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
      .join(orders, "l_orderkey")
      .crossJoin(broadcast(anchor))
      .withColumn("w", expr(
        s"shiftright($TrendScale, CAST(least(max_day - day, $TrendMaxAge) " +
          "AS INT))"))
    weighted.groupBy("p_brand")
      .agg(count(lit(1)).as("n_lineitems"), sum("w").as("trend_score"))
      .orderBy(col("trend_score").desc, col("p_brand"))
  }

  /** Frequent itemsets one Apriori level past [[assocRules]]: brand
    * TRIPLES co-occurring in ≥ [[MinSuppTriple]] orders, with the
    * 3-way lift supp·n²·10⁶ div (sa·sb·sc) through DECIMAL(38)
    * (n²·supp·10⁶ ≈ 10³⁶ at corpus scale — the outermost exact product
    * this engine carries; still inside 38 digits).
    *
    * Scale shape: the candidate generator is TWO order-keyed self-joins
    * (C(k,3) per basket — basket-width-bounded like the pair join,
    * never catalog³); supports broadcast. The full Apriori would prune
    * candidate triples against frequent pairs first; at brand
    * cardinality the per-basket bound already contains the fan-out, so
    * the prune is documented, not paid. Gate `q_frequent_triples`.
    */
  def frequentTriples(s: SparkSession, d: String): DataFrame = {
    val baskets = t(s, d, "lineitem")
      .join(broadcast(t(s, d, "part").select(
        col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val nBaskets = baskets.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n"))
    val itemSupp = baskets.groupBy("p_brand").agg(count(lit(1)).as("supp"))
    def side(as: String) =
      baskets.select(col("l_orderkey"), col("p_brand").as(as))
    val triples = side("i1").join(side("i2"), "l_orderkey")
      .where(col("i1") < col("i2"))
      .join(side("i3"), "l_orderkey")
      .where(col("i2") < col("i3"))
      .groupBy("i1", "i2", "i3").agg(count(lit(1)).as("supp_triple"))
      .where(col("supp_triple") >= MinSuppTriple)
    def suppOf(item: String) = broadcast(itemSupp.select(
      col("p_brand").as(item), col("supp").as(s"supp_$item")))
    triples
      .join(suppOf("i1"), "i1").join(suppOf("i2"), "i2")
      .join(suppOf("i3"), "i3")
      .crossJoin(broadcast(nBaskets))
      .select(col("i1"), col("i2"), col("i3"), col("supp_triple"),
        expr(s"CAST((CAST(supp_triple AS DECIMAL(38,0)) * n * n * $Ppm) " +
          "div (CAST(supp_i1 AS DECIMAL(38,0)) * supp_i2 * supp_i3) " +
          "AS BIGINT)").as("lift_ppm"))
      .orderBy("i1", "i2", "i3")
  }
}
