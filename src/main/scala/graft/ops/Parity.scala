package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.model.Renderer

/** The 15 reference-parity queries (SURVEY.md §2.5, table 1) — each maps 1:1
  * to extraction-builder operators (reference:
  * mozart_etl/lib/extract/connectors/base.py:55-79) or dbt transform
  * operators (reference: code_locations/project_01/models). All are
  * deterministic: total ORDER BY, pinned timestamps, no wall clock.
  *
  * Every query keeps projection/filter adjacent to the scan so Catalyst
  * pushes them into the parquet reader (PushedFilters / ReadSchema).
  */
object Parity {

  /** B1/C1 — projection pushdown (base.py:56-58). */
  def scanProjection(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** B2/B3/C4 — conjunctive equality + range filters (base.py:63-76). */
  def filterTenantEq(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 50000.0)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  /** B4 — strict-`>` watermark predicate (base.py:71-73). Watermark is a
    * pinned ns-epoch literal (2024-01-15T00:00:00Z, mid-range of the
    * events fixture).
    */
  val watermarkNs: Long = 1705276800000000000L
  def filterIncremental(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("ts") > lit(watermarkNs))
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")

  /** B5/C17/A15 — deterministic top-k LIMIT (base.py:78-79; trino.py:55-71
    * made reproducible by total ordering).
    */
  def limitTopk(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** C2/C3/C15 — cast + rename to the product-standard shape, authored in
    * the reference's model dialect (`::VARCHAR`, mart_item_master.sql:8-16)
    * and run through the engine's [[Renderer]].
    */
  val castStandardModel: String =
    """{{ config(materialized='table', schema=var('tenant_id', 'demo')) }}
      |SELECT
      |    p_partkey::VARCHAR  AS item_id,
      |    p_name::VARCHAR     AS item_name,
      |    p_type::VARCHAR     AS item_type,
      |    p_brand::VARCHAR    AS item_group_id
      |FROM {{ source('main', 'part') }}
      |ORDER BY item_id
      |""".stripMargin

  def castStandard(s: SparkSession, d: String): DataFrame = {
    graft.Tables.registerViews(s, d, Seq("part"))
    val r = new Renderer(Map("tenant_id" -> "demo"), (_, tbl) => tbl, identity)
    s.sql(r.render(castStandardModel))
  }

  /** C6/C7 — partition-key synthesis + constant column from var
    * (stg_cfg_to_odv_demand.sql:26-28).
    */
  def concatPartitionKey(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      concat(col("o_custkey").cast("string"), lit("_"), lit("V1.0")).as("partition_key"),
      lit("V1.0").as("plan_ver"),
      col("o_orderkey"))
      .orderBy("o_orderkey")

  /** C8/C9 — COALESCE + UTF-8 prefix tag (stg_cfg_to_odv_bom_master.sql:41). */
  def coalescePrefix(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      concat(lit("[계획용] "), coalesce(col("p_name"), col("p_brand"))).as("description"))
      .orderBy("p_partkey")

  /** C10 — suffix tag (stg_cfg_to_odv_demand.sql:45). */
  def suffixTag(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"),
      concat(coalesce(col("o_orderpriority"), lit("NORMAL")), lit("_PLANNED"))
        .as("order_priority"))
      .orderBy("o_orderkey")

  /** C11 — arithmetic scaling (`* 1.1`, stg_cfg_to_odv_demand.sql:39).
    * Double arithmetic on identical inputs is bit-identical across engines.
    */
  def arithScale(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * lit(1.1)).as("scaled_price"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** C12 — timestamp replacement, pinned instead of CURRENT_TIMESTAMP
    * (stg_cfg_to_odv_bom_master.sql:44-46; pinned per SURVEY §5.2).
    */
  def timestampReplace(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey").cast("string").as("item_id"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("created_at"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("updated_at"))
      .orderBy("item_id")

  /** C5/C13 — CTE chain + conditional templated filter, authored in the
    * reference dialect (stg_cfg_to_odv_demand.sql:16-56 shape) and rendered.
    */
  val cteStageChainModel: String =
    """{{ config(materialized='table', schema=var('tenant_id', 'demo')) }}
      |WITH source AS (
      |    SELECT * FROM {{ source('main', 'orders') }}
      |    {% if var('status_filter', none) is not none %}
      |    WHERE o_orderstatus = '{{ var("status_filter") }}'
      |    {% endif %}
      |),
      |transformed AS (
      |    SELECT
      |        o_custkey::VARCHAR || '_' || '{{ var("plan_ver", "V1.0") }}' AS partition_key,
      |        '{{ var("plan_ver", "V1.0") }}' AS plan_ver,
      |        o_orderkey,
      |        o_totalprice * 1.1 AS demand_qty,
      |        COALESCE(o_orderpriority, 'NORMAL') || '_PLANNED' AS demand_type
      |    FROM source
      |)
      |SELECT * FROM transformed ORDER BY o_orderkey
      |""".stripMargin

  def cteStageChain(s: SparkSession, d: String): DataFrame = {
    graft.Tables.registerViews(s, d, Seq("orders"))
    val r = new Renderer(
      Map("tenant_id" -> "demo", "status_filter" -> "F"), (_, tbl) => tbl, identity)
    s.sql(r.render(cteStageChainModel))
  }

  /** C16 — GROUP BY + COUNT validation query
    * (docs/cfg-to-odv-transformation.md:162-164).
    */
  def groupbyCount(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** C18 — DELETE-with-predicate as the anti-filter rewrite (SURVEY §7.5):
    * rows surviving `DELETE WHERE plan_ver = 'V1.0'`. Pure-transform shape
    * (the managed-table swap variant lives in Warehouse.deleteWhere and is
    * exercised by q_mode_full_snapshot + tests).
    */
  def deletePredicate(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      when(col("o_orderkey") % 2 === 0, "V1.0").otherwise("V2.0").as("plan_ver"))
      .filter(!(col("plan_ver") === "V1.0"))
      .orderBy("o_orderkey")

  /** base.py:86-89 — zero-row result keeps the full typed schema (documented
    * divergence: the reference degrades empty results to all-VARCHAR).
    */
  def emptyResultSchema(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_quantity") < -1.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
}
