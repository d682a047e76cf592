package graft

import java.sql.DriverManager
import graft.config.{SourceConfig, TableSpec, TenantConfig}
import graft.extract.Extractor
import graft.source.JdbcSource

/** Real JDBC round-trip over embedded Derby: the A1-A5 surface exercised
  * against an actual database — scan, schema mapping, extraction pushdown
  * (projection + equality + watermark + limit compile into the source
  * query), partitioned-read option plumbing, and the liveness probe.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby")
  private val url = s"jdbc:derby:$dbDir/testdb;create=true"

  private def cfg = SourceConfig("jdbc", "", "", url, "", "")

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE items (
      project_id VARCHAR(10), item_id BIGINT, item_name VARCHAR(50),
      qty DOUBLE, updated BIGINT)""")
    val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?, ?, ?)")
    val rows = Seq(
      ("T1", 1L, "alpha", 1.5, 100L), ("T1", 2L, "beta", 2.5, 200L),
      ("T1", 3L, "gamma", 3.5, 300L), ("T2", 4L, "delta", 4.5, 400L))
    rows.foreach { case (p, i, n, q, u) =>
      ps.setString(1, p); ps.setLong(2, i); ps.setString(3, n)
      ps.setDouble(4, q); ps.setLong(5, u); ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  private val spec = TableSpec("items", "", "items",
    primaryKey = Seq("item_id"),
    columns = Seq("project_id", "item_id", "item_name", "updated"),
    tenantFilter = Some("project_id"),
    incrementalColumn = Some("updated"),
    mode = "incremental")

  private val tenant = TenantConfig.parse(ops.PipelineOps.tenantYaml, Map.empty)
    .copy(params = Map("project_id" -> "T1"))

  test("jdbc scan reads with JDBC-reported schema (A1/A5)") {
    val df = new JdbcSource(cfg).scan(spark, spec)
    assert(df.count() == 4)
    assert(df.schema("ITEM_ID").dataType.typeName == "long")
    assert(df.schema("QTY").dataType.typeName == "double")
  }

  test("extraction predicates push into the JDBC source (B1-B5 over a real DB)") {
    val df = new JdbcSource(cfg).scan(spark, spec)
      .toDF(new JdbcSource(cfg).scan(spark, spec).columns.map(_.toLowerCase): _*)
    val out = Extractor.extract(df, spec, tenant, lastValue = Some(100L),
      rowLimit = Some(10))
    val rows = out.collect()
    assert(out.columns.toSeq == spec.columns)
    assert(rows.map(_.getAs[Long]("item_id")).sorted.toSeq == Seq(2L, 3L))
    // pushdown evidence: the physical scan carries the filters
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("UPDATED"), plan.take(800))
  }

  test("partitioned jdbc read with bounds splits into range queries (A1 parallel upgrade)") {
    val df = new JdbcSource(cfg, numPartitions = 2, bounds = Some(("100", "400")))
      .scan(spark, spec)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4) // bounds partition, never filter
  }

  test("connection probe (B6) succeeds on live DB and fails cleanly on a bad URL") {
    assert(new JdbcSource(cfg).probe(spark))
    val bad = SourceConfig("jdbc", "", "", s"jdbc:derby:$dbDir/nope", "", "")
    assert(!new JdbcSource(bad).probe(spark))
  }
}
