package graft

import org.apache.spark.sql.functions._
import graft.config.TenantConfig
import graft.ops.PipelineOps
import graft.pipeline.TenantPipeline
import graft.source.ParquetSource

/** End-to-end pipeline slice (SURVEY §7.2): fixtures → raw → staging → mart
  * with schema validation — asserting contents, not just counts.
  */
class PipelineSpec extends SparkSpec {

  test("tenant pipeline lands raw, staging and mart tables with correct content") {
    val tenant = TenantConfig.parse(PipelineOps.tenantYaml, Map.empty)
    val p = new TenantPipeline(tenant, new ParquetSource(sf),
      Seq(PipelineOps.stagingModel, PipelineOps.martModel))
    val counts = p.run(spark)

    val raw = spark.table("graft_demo_raw.item_master")
    // extractor applied the tenant filter and projection
    assert(raw.columns.toSeq == Seq("p_partkey", "p_name", "p_type", "p_brand", "p_size"))
    assert(raw.filter(col("p_brand") =!= "Brand#4").count() == 0)
    assert(counts("item_master") == raw.count())

    val mart = spark.table("graft_demo.mart_item_master")
    assert(mart.columns.toSeq == Seq("item_id", "item_name", "item_type",
      "item_group_id", "procurement_type", "created_at", "updated_at"))
    // ::VARCHAR rewrite produced string ids; pinned timestamp honored
    assert(mart.schema("item_id").dataType.typeName == "string")
    val ts = mart.select("created_at").distinct().collect()
    assert(ts.length == 1 &&
      ts(0).getTimestamp(0) == java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    // staging and mart agree on row count (1:1 transform)
    assert(mart.count() == spark.table("graft_demo.graft_demo__stg_item_master").count())
  }

  test("renderAll resolves refs to qualified physical names") {
    val tenant = TenantConfig.parse(PipelineOps.tenantYaml, Map.empty)
    val p = new TenantPipeline(tenant, new ParquetSource(sf),
      Seq(PipelineOps.stagingModel, PipelineOps.martModel))
    val rendered = p.renderAll
    assert(rendered("graft_demo__mart_item_master")
      .contains("`graft_demo`.`graft_demo__stg_item_master`"))
    assert(rendered("graft_demo__stg_item_master")
      .contains("`graft_demo_raw`.`item_master`"))
    assert(rendered("graft_demo__mart_item_master").contains("CAST(p_partkey AS STRING)"))
  }
}
