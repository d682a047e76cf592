package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Parity family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object ParityOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
    "q_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_tenant_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_incremental" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE epoch_ns(ts) > 1705276800000000000 ORDER BY event_id""".stripMargin,
    "q_limit_topk" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_cast_standard" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       CAST(p_name AS VARCHAR) AS item_name,
        |       CAST(p_type AS VARCHAR) AS item_type,
        |       CAST(p_brand AS VARCHAR) AS item_group_id
        |FROM part ORDER BY item_id""".stripMargin,
    "q_concat_partition_key" ->
      """SELECT CAST(o_custkey AS VARCHAR) || '_' || 'V1.0' AS partition_key,
        |       'V1.0' AS plan_ver, o_orderkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_coalesce_prefix" ->
      """SELECT p_partkey, '[계획용] ' || COALESCE(p_name, p_brand) AS description
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_suffix_tag" ->
      """SELECT o_orderkey,
        |       COALESCE(o_orderpriority, 'NORMAL') || '_PLANNED' AS order_priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_arith_scale" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * CAST(1.1 AS DOUBLE) AS scaled_price,
        |       l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS disc_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_timestamp_replace" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       TIMESTAMP '2026-01-01 00:00:00' AS created_at,
        |       TIMESTAMP '2026-01-01 00:00:00' AS updated_at
        |FROM part ORDER BY item_id""".stripMargin,
    "q_cte_stage_chain" ->
      """WITH source AS (
        |    SELECT * FROM orders WHERE o_orderstatus = 'F'
        |), transformed AS (
        |    SELECT CAST(o_custkey AS VARCHAR) || '_' || 'V1.0' AS partition_key,
        |           'V1.0' AS plan_ver, o_orderkey,
        |           o_totalprice * CAST(1.1 AS DOUBLE) AS demand_qty,
        |           COALESCE(o_orderpriority, 'NORMAL') || '_PLANNED' AS demand_type
        |    FROM source
        |)
        |SELECT * FROM transformed ORDER BY o_orderkey""".stripMargin,
    "q_groupby_count" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q_mode_full_snapshot" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       CAST(p_name AS VARCHAR) AS item_name,
        |       CAST(p_type AS VARCHAR) AS item_type,
        |       CAST(p_brand AS VARCHAR) AS item_group_id,
        |       'STANDARD' AS procurement_type,
        |       TIMESTAMP '2026-01-01 00:00:00' AS created_at,
        |       TIMESTAMP '2026-01-01 00:00:00' AS updated_at
        |FROM part
        |WHERE p_brand = 'Brand#4' AND p_partkey % 5 <> 0
        |ORDER BY item_id""".stripMargin,
    "q_mode_watermark_append" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_partition_backfill" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m') AS part_key
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "q_delete_predicate" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CASE WHEN o_orderkey % 2 = 0 THEN 'V1.0' ELSE 'V2.0' END AS plan_ver
        |FROM orders
        |WHERE NOT (CASE WHEN o_orderkey % 2 = 0 THEN 'V1.0' ELSE 'V2.0' END = 'V1.0')
        |ORDER BY o_orderkey""".stripMargin,
    "q_empty_result_schema" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < -1",
    // the engine runs the partition-scoped delete machinery (match scan →
    // affected partitions → drop+append of the filtered slice); the
    // oracle recomputes the surviving rows declaratively
    "q_delete_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m') AS part_key
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND NOT (strftime(o_orderdate, '%Y-%m') = '1996-02'
        |           AND o_orderkey % 3 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    // the engine runs the partition-SCOPED merge machinery (pruned
    // current-slice scan + metadata DROP PARTITION + append of only the
    // touched partition); the oracle recomputes the final state
    // declaratively over all three months
    "q_mode_merge_partitioned" ->
      """WITH base AS (
        |    SELECT o_orderkey, o_custkey, o_totalprice,
        |           strftime(o_orderdate, '%Y-%m') AS part_key
        |    FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |), mx AS (SELECT MAX(o_orderkey) + 1 AS stride FROM base)
        |SELECT o_orderkey, o_custkey,
        |       CASE WHEN part_key = '1996-02' AND o_orderkey % 10 = 3
        |            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |       CAST(CASE WHEN part_key = '1996-02' AND o_orderkey % 10 = 3
        |            THEN 2 ELSE 1 END AS BIGINT) AS v,
        |       part_key
        |FROM base
        |UNION ALL
        |SELECT o_orderkey + mx.stride AS o_orderkey, o_custkey,
        |       o_totalprice, CAST(2 AS BIGINT) AS v, part_key
        |FROM base, mx WHERE part_key = '1996-02' AND o_orderkey % 100 = 55
        |ORDER BY o_orderkey""".stripMargin,
    // the engine runs the real merge machinery (base load + latest-wins
    // window through the temp-swap); the oracle recomputes the final
    // state declaratively
    "q_mode_merge_upsert" ->
      """WITH mx AS (SELECT MAX(o_orderkey) + 1 AS stride FROM orders)
        |SELECT o_orderkey, o_custkey,
        |       CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
        |            ELSE o_totalprice END AS o_totalprice,
        |       CAST(CASE WHEN o_orderkey % 10 = 3 THEN 2 ELSE 1 END
        |            AS BIGINT) AS v
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + mx.stride AS o_orderkey, o_custkey,
        |       o_totalprice, CAST(2 AS BIGINT) AS v
        |FROM orders, mx WHERE o_orderkey % 100 = 55
        |ORDER BY o_orderkey""".stripMargin,
    // data-quality expectations: every verdict is an exact integer
    // (conditional-sum violation counts, count-distinct uniqueness,
    // NOT EXISTS referential containment, per-million rate by
    // truncating division) — replayed constraint by constraint
    "q_expectations" ->
      """WITH o AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        |           CAST(sum(CASE WHEN o_orderstatus IS NULL
        |                    OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
        |           CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                    OR o_totalprice > 1e12 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS u_distinct,
        |           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u_nulls
        |    FROM orders
        |), l AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |           CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
        |                    OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |           CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0
        |                    OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |    FROM lineitem
        |), r AS (
        |    SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
        |           CAST((SELECT count(*) FROM orders o2
        |                 WHERE o2.o_custkey IS NOT NULL AND NOT EXISTS (
        |                     SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o2.o_custkey)) AS BIGINT) AS violations
        |), v AS (
        |    SELECT 'orders.o_custkey.not_null' AS check_id, 'orders' AS tbl,
        |           n_rows, v_null AS violations FROM o
        |    UNION ALL SELECT 'orders.o_orderstatus.in_set', 'orders', n_rows, v_set FROM o
        |    UNION ALL SELECT 'orders.o_totalprice.non_negative', 'orders', n_rows, v_range FROM o
        |    UNION ALL SELECT 'orders.o_orderkey.unique', 'orders', n_rows,
        |              n_rows - u_distinct - u_nulls FROM o
        |    UNION ALL SELECT 'lineitem.l_quantity.range_1_50', 'lineitem', n_rows, v_qty FROM l
        |    UNION ALL SELECT 'lineitem.l_discount.range_0_1', 'lineitem', n_rows, v_disc FROM l
        |    UNION ALL SELECT 'orders.o_custkey.ref_customer', 'orders', n_rows, violations FROM r
        |)
        |SELECT check_id, tbl, n_rows, violations,
        |       CAST(CASE WHEN n_rows = 0 THEN 0
        |                 ELSE violations * 1000000 // n_rows END AS BIGINT) AS viol_ppm,
        |       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS ok
        |FROM v ORDER BY check_id""".stripMargin,
  )
}
