package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.TenantConfig
import graft.model.SqlModel
import graft.pipeline.TenantPipeline
import graft.source.ParquetSource
import graft.std.ProductSchema
import graft.store.Warehouse

/** The end-to-end pipeline slice as a correctness query (SURVEY.md §7.2):
  * tenant.yaml config → ParquetSource scan → Extractor (projection + tenant
  * equality filter) → Warehouse raw load (A8) → rendered staging model →
  * rendered mart model with `::VARCHAR` casts + pinned timestamps →
  * ProductSchema validation (C15) → managed-table DELETE-WHERE (C18,
  * anti-filter temp-swap) → final mart contents.
  *
  * This mirrors the reference's cfg_item_master → stg → mart_item_master
  * path (stg_cfg_item_master.sql:6-23, mart_item_master.sql:8-16,
  * _tenant_factory.py:212-326) with every network hop collapsed into one
  * Spark job DAG.
  */
object PipelineOps {

  val tenantYaml: String =
    """tenant:
      |  id: graft_demo
      |  name: "Graft demo tenant"
      |  source:
      |    type: parquet
      |    host: "${GRAFT_DEMO_HOST:localhost}"
      |  params:
      |    p_brand: "Brand#4"
      |  storage:
      |    prefix: "raw/graft_demo"
      |  schedule: "0 */2 * * *"
      |tables:
      |  - name: item_master
      |    source_table: part
      |    primary_key: [p_partkey]
      |    columns: [p_partkey, p_name, p_type, p_brand, p_size]
      |    tenant_filter: p_brand
      |    mode: full
      |""".stripMargin

  val stagingModel: SqlModel = SqlModel("graft_demo__stg_item_master",
    """{{ config(materialized='table', schema=var('tenant_id', 'graft_demo')) }}
      |SELECT p_partkey, p_name, p_type, p_brand
      |FROM {{ source('graft_demo_raw', 'item_master') }}
      |""".stripMargin)

  val martModel: SqlModel = SqlModel("graft_demo__mart_item_master",
    """{{ config(materialized='table', schema=var('tenant_id', 'graft_demo'), alias='mart_item_master') }}
      |SELECT
      |    p_partkey::VARCHAR AS item_id,
      |    p_name::VARCHAR    AS item_name,
      |    p_type::VARCHAR    AS item_type,
      |    p_brand::VARCHAR   AS item_group_id,
      |    'STANDARD'         AS procurement_type,
      |    TIMESTAMP '{{ var("run_ts", "2026-01-01 00:00:00") }}' AS created_at,
      |    TIMESTAMP '{{ var("run_ts", "2026-01-01 00:00:00") }}' AS updated_at
      |FROM {{ ref('graft_demo__stg_item_master') }}
      |""".stripMargin)

  /** Partitioned materialization + ranged backfill as a correctness query
    * (reference partition definitions + single_run policy,
    * executable_component.py:19-41): three monthly partitions of an orders
    * mart materialize in ONE ranged run, then February alone re-backfills —
    * dynamic partition overwrite must REPLACE that partition (an append-y
    * rewrite would double its rows and fail the oracle hash), leaving the
    * other months untouched. Returns the re-backfilled partition's content.
    */
  def partitionBackfill(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.{PartitionGrain, PartitionedMaterializer}
    import java.time.LocalDate
    val src = graft.Tables.t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val (db, table) = ("graft_backfill", "orders_by_month")
    PartitionedMaterializer.backfill(s, src, "o_orderdate",
      PartitionGrain.Monthly, db, table,
      LocalDate.of(1996, 1, 1), LocalDate.of(1996, 4, 1))
    PartitionedMaterializer.backfill(s, src, "o_orderdate",
      PartitionGrain.Monthly, db, table,
      LocalDate.of(1996, 2, 1), LocalDate.of(1996, 3, 1))
    PartitionedMaterializer.partition(s, db, table, "1996-02")
      .select("o_orderkey", "o_custkey", "o_totalprice", "part_key")
      .orderBy("o_orderkey")
  }

  /** The declared-but-never-executed reference semantics, end to end under
    * the oracle: watermark APPEND (LoadMode.WatermarkAppend — the upgrade
    * over the reference's effective delete-all+reinsert, SURVEY §2.A).
    * Batch 1 (events at/below a cut) creates the table; the stored
    * watermark is read back (Warehouse.currentWatermark) and batch 2
    * appends strictly-newer rows only. Final content must equal the whole
    * source exactly — a duplicate (non-strict compare) or a gap (lost
    * batch) fails the hash.
    */
  def modeWatermarkAppend(s: SparkSession, d: String): DataFrame = {
    import graft.store.LoadMode
    val (db, table) = ("graft_append", "events_log")
    // hermetic per-run: the two-batch sequence below assumes a fresh table
    s.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val ev = graft.Tables.t(s, d, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val cut = Parity.watermarkNs // the q_filter_incremental cut, by reference
    Warehouse.load(s, ev.filter(col("ts") <= cut), db, table,
      LoadMode.WatermarkAppend)
    val wm = Warehouse.currentWatermark(s, db, table, "ts")
      .getOrElse(throw new IllegalStateException(
        s"no watermark: batch 1 loaded zero rows at/below ns cut $cut"))
      .asInstanceOf[Long]
    Warehouse.load(s, ev.filter(col("ts") > wm), db, table,
      LoadMode.WatermarkAppend)
    s.table(s"`$db`.`$table`")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
  }

  /** Keyed merge-upsert materialization (the CDC-shaped mode the
    * reference's full-refresh/append pair lacks): land a base snapshot,
    * then merge a later batch of updates (doubled price on every 10th
    * key, version 2) + inserts (key-shifted copies of every 100th-ish
    * key). Latest-wins per key through Warehouse.mergeUpsert's single
    * window over union(current, batch) — no point updates, layout
    * preserved. The oracle recomputes the final state declaratively.
    */
  def modeMergeUpsert(s: SparkSession, d: String): DataFrame = {
    import graft.store.LoadMode
    val (db, table) = ("graft_merge", "orders_current")
    s.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    s.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val orders = graft.Tables.t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val base = orders.withColumn("v", lit(1L))
    Warehouse.load(s, base, db, table, LoadMode.FullRefresh)
    // empty-source guard: max() over zero rows is NULL (same hole the
    // dedupClusters empty-corpus fix closed) — an empty orders table
    // makes both merge batches empty, so any stride works
    val mx = orders.agg(max("o_orderkey")).head
    val stride = if (mx.isNullAt(0)) 0L else mx.getLong(0) + 1
    val updates = orders.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("v", lit(2L))
    val inserts = orders.filter(col("o_orderkey") % 100 === 55)
      .withColumn("o_orderkey", col("o_orderkey") + stride)
      .withColumn("v", lit(2L))
    Warehouse.mergeUpsert(s, updates.unionByName(inserts), db, table,
      keys = Seq("o_orderkey"), versionCol = "v")
    s.table(s"`$db`.`$table`")
      .select("o_orderkey", "o_custkey", "o_totalprice", "v")
      .orderBy("o_orderkey")
  }

  /** Partition-SCOPED merge-upsert (the 100 TB CDC shape): a monthly-
    * partitioned orders snapshot takes a batch of February-only updates
    * (doubled price on every 10th key, v=2) plus February inserts
    * (key-shifted copies of every 100th-ish key). Warehouse.mergeUpsert
    * detects the partitioned target and rewrites ONLY the 1996-02
    * partition — January and March files are untouched on disk
    * (file-level asserted in ExtractWarehouseSpec); the oracle recomputes
    * the final three-month state declaratively.
    */
  def modeMergePartitioned(s: SparkSession, d: String): DataFrame = {
    val (db, table) = ("graft_merge_part", "orders_by_month_cur")
    s.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    s.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val base = graft.Tables.t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit(1L).as("v"),
        date_format(col("o_orderdate"), "yyyy-MM").as("part_key"))
    Warehouse.saveModel(base, db, table, Seq("part_key"))
    val feb = base.filter(col("part_key") === "1996-02")
    // empty-source guard: same hole as modeMergeUpsert — no base rows
    // makes both batch legs empty, any stride works
    val mx = base.agg(max("o_orderkey")).head
    val stride = if (mx.isNullAt(0)) 0L else mx.getLong(0) + 1
    val updates = feb.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("v", lit(2L))
    val inserts = feb.filter(col("o_orderkey") % 100 === 55)
      .withColumn("o_orderkey", col("o_orderkey") + stride)
      .withColumn("v", lit(2L))
    Warehouse.mergeUpsert(s, updates.unionByName(inserts), db, table,
      keys = Seq("o_orderkey"), versionCol = "v")
    s.table(s"`$db`.`$table`")
      .select("o_orderkey", "o_custkey", "o_totalprice", "v", "part_key")
      .orderBy("o_orderkey")
  }

  /** Partition-SCOPED DELETE (C18 at the 100 TB shape): a monthly-
    * partitioned orders snapshot deletes every 3rd key of February only —
    * Warehouse.deleteWhere finds the partitions CONTAINING matches (one
    * column-pruned scan) and rewrites only 1996-02; January and March
    * files are untouched (file-level asserted in ExtractWarehouseSpec).
    */
  def deletePartitioned(s: SparkSession, d: String): DataFrame = {
    val (db, table) = ("graft_del_part", "orders_by_month_del")
    s.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    s.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val base = graft.Tables.t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("part_key"))
    Warehouse.saveModel(base, db, table, Seq("part_key"))
    Warehouse.deleteWhere(s, db, table,
      expr("part_key = '1996-02' AND o_orderkey % 3 = 0"))
    s.table(s"`$db`.`$table`")
      .select("o_orderkey", "o_custkey", "o_totalprice", "part_key")
      .orderBy("o_orderkey")
  }

  def modeFullSnapshot(s: SparkSession, d: String): DataFrame = {
    val tenant = TenantConfig.parse(tenantYaml)
    val pipeline = new TenantPipeline(tenant, new ParquetSource(d),
      Seq(stagingModel, martModel))
    pipeline.run(s)
    // C18: partition-key hygiene delete on the managed mart table.
    Warehouse.deleteWhere(s, tenant.database, "mart_item_master",
      expr("CAST(item_id AS BIGINT) % 5 = 0"))
    val mart = s.table("`graft_demo`.`mart_item_master`")
    ProductSchema.requireConformant(mart, ProductSchema.martItemMaster)
    mart.orderBy("item_id")
  }
}
