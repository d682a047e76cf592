package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.config.{SourceConfig, TableSpec}

/** A scan provider: spec → DataFrame. The reference funnels every input
  * through one `extract_table` surface (reference:
  * mozart_etl/lib/extract/connectors/base.py:29-93); we keep that shape but
  * return a *lazy* DataFrame so Catalyst can push projection/predicates into
  * the physical scan instead of materializing rows driver-side (the
  * reference fetches the whole table into driver memory, base.py:84 — the
  * single biggest scale defect we fix).
  */
trait Source {
  def scan(spark: SparkSession, spec: TableSpec): DataFrame

  /** Connection liveness probe (reference: base.py:95-103). */
  def probe(spark: SparkSession): Boolean
}

/** Parquet-directory source — the harness/landing-dir path (reference's
  * Hive-external-table bridge over S3 parquet, _tenant_factory.py:274-285,
  * collapsed to a direct columnar scan).
  */
final class ParquetSource(dir: String) extends Source {
  override def scan(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.parquet(s"$dir/${spec.sourceTable}.parquet")
  override def probe(spark: SparkSession): Boolean =
    new java.io.File(dir).isDirectory
}

/** ORC-directory landing source — the second self-describing columnar
  * drop format (Hive-ecosystem warehouses like the reference's land ORC
  * as readily as parquet). Same contract as [[ParquetSource]]: schema
  * travels with the files, projection prunes columns, and predicates
  * push into the scan (ORC stripe/row-group statistics — PushedFilters,
  * asserted in the round-trip spec). No schema parameter by design:
  * passing one would silently CAST drifted columns; columnar drops are
  * validated by schema comparison downstream, not re-typing.
  */
final class OrcSource(dir: String) extends Source {
  override def scan(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.orc(s"$dir/${spec.sourceTable}.orc")
  override def probe(spark: SparkSession): Boolean =
    new java.io.File(dir).isDirectory
}

/** Delimited-text landing source (CSV/TSV drops). Schema is EXPLICIT and
  * required — `inferSchema` would be a full extra pass over the data (a
  * 100 TB scan just to guess types) and is non-deterministic under dirty
  * rows. FAILFAST by default: a malformed row surfaces as an error
  * instead of silently nulling columns; pass mode="PERMISSIVE" for
  * salvage ingest.
  *
  * Two honest boundaries of that contract:
  *  - FAILFAST validates the columns a query actually READS — Spark's
  *    CSV column pruning (`spark.sql.csv.parser.columnPruning`, on by
  *    default) never parses unselected fields, so garbage hiding in a
  *    pruned column passes. Full-file validation = select every column
  *    once at ingest (the load path does; ad-hoc projections don't).
  *  - RFC-4180 text with embedded newlines needs `multiLine = true`,
  *    which makes files NON-SPLITTABLE (one task per file — a real cost
  *    at corpus scale; prefer newline-escaped or JSONL drops for
  *    multi-line text).
  */
final class CsvSource(dir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      delimiter: String = ",",
                      header: Boolean = true,
                      mode: String = "FAILFAST",
                      multiLine: Boolean = false) extends Source {
  override def scan(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", mode)
      .option("multiLine", multiLine.toString)
      .csv(s"$dir/${spec.sourceTable}.csv")
  override def probe(spark: SparkSession): Boolean =
    new java.io.File(dir).isDirectory
}

/** JSON-Lines corpus source — the de-facto interchange format training
  * corpora arrive in. Same explicit-schema + FAILFAST contract as
  * [[CsvSource]] (schema inference over JSONL is an extra full scan AND
  * widens types by whatever the dirtiest line contains).
  */
final class JsonlSource(dir: String,
                        schema: org.apache.spark.sql.types.StructType,
                        mode: String = "FAILFAST") extends Source {
  override def scan(spark: SparkSession, spec: TableSpec): DataFrame =
    spark.read.schema(schema)
      .option("mode", mode)
      .json(s"$dir/${spec.sourceTable}.jsonl")
  override def probe(spark: SparkSession): Boolean =
    new java.io.File(dir).isDirectory
}

/** JDBC source (reference connectors: postgresql.py:6-14, mysql.py:6-14,
  * oracle.py:6-25 + factory __init__.py:7-23). Reads are *partitioned* when
  * the spec names a usable split column — N concurrent range queries instead
  * of the reference's single-threaded fetchall.
  *
  * Not exercised by the offline harness (zero egress); URL construction and
  * option plumbing are unit-tested.
  */
final class JdbcSource(cfg: SourceConfig, numPartitions: Int = 8,
                       bounds: Option[(String, String)] = None) extends Source {

  def connectionUrl: String = cfg.sourceType match {
    case "postgresql" => s"jdbc:postgresql://${cfg.host}:${cfg.port}/${cfg.database}"
    case "mysql"      => s"jdbc:mysql://${cfg.host}:${cfg.port}/${cfg.database}"
    case "oracle" =>
      // DSN by service name, else SID, else database field (oracle.py:14-25).
      cfg.serviceName
        .map(sn => s"jdbc:oracle:thin:@//${cfg.host}:${cfg.port}/$sn")
        .orElse(cfg.sid.map(sid => s"jdbc:oracle:thin:@${cfg.host}:${cfg.port}:$sid"))
        .getOrElse(s"jdbc:oracle:thin:@//${cfg.host}:${cfg.port}/${cfg.database}")
    // Escape hatch for embedded/other engines: `database` carries the full
    // JDBC URL verbatim (used by the integration tests via embedded Derby).
    case "jdbc" => cfg.database
    case other => throw new IllegalArgumentException(
      s"Unknown source type: $other") // factory contract, __init__.py:20-23
  }

  override def scan(spark: SparkSession, spec: TableSpec): DataFrame = {
    val qualified =
      if (spec.sourceSchema.nonEmpty) s"${spec.sourceSchema}.${spec.sourceTable}"
      else spec.sourceTable
    val reader = spark.read.format("jdbc")
      .option("url", connectionUrl)
      .option("dbtable", qualified)
      .option("user", cfg.username)
      .option("password", cfg.password)
      .option("fetchsize", "10000")
    // Partitioned read on the watermark column when present — turns the
    // extract into numPartitions parallel range scans at the source. Spark
    // requires explicit lower/upper bounds with partitionColumn; without
    // known bounds (discoverable via boundsQuery) fall back to a single
    // stream rather than fail.
    (spec.incrementalColumn, bounds) match {
      case (Some(c), Some((lo, hi))) => reader
        .option("partitionColumn", c)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", numPartitions.toString)
      case _ => reader
    }
  }.load()

  /** Bounds-discovery SQL for the partitioned read (run via option("query")
    * before the main scan; one-row result).
    */
  def boundsQuery(spec: TableSpec): String = {
    val c = spec.incrementalColumn.getOrElse(
      throw new IllegalArgumentException(s"${spec.name}: no incremental_column"))
    val qualified =
      if (spec.sourceSchema.nonEmpty) s"${spec.sourceSchema}.${spec.sourceTable}"
      else spec.sourceTable
    s"SELECT MIN($c) AS lo, MAX($c) AS hi FROM $qualified"
  }

  /** Engine-appropriate liveness statement — the reference's bare
    * `SELECT 1` (base.py:95-103) is not valid SQL on Oracle (or Derby).
    */
  def validationQuery: String = cfg.sourceType match {
    case "oracle" => "SELECT 1 FROM DUAL"
    case "jdbc" => "SELECT 1 FROM SYSIBM.SYSDUMMY1" // Derby-style embedded
    case _ => "SELECT 1"
  }

  /** Liveness probe. Tries `Connection.isValid` via DriverManager first
    * (no SQL dialect involved); when the JDBC driver lives only in Spark's
    * session classloader (e.g. shipped via --jars, where DriverManager's
    * caller-classloader check rejects it), falls back to Spark's own JDBC
    * reader with the per-engine validation query.
    */
  override def probe(spark: SparkSession): Boolean = {
    val direct =
      try {
        val conn = java.sql.DriverManager.getConnection(
          connectionUrl, cfg.username, cfg.password)
        try Some(conn.isValid(5)) finally conn.close()
      } catch {
        case _: java.sql.SQLException => None // e.g. "No suitable driver"
        case _: Throwable => Some(false)
      }
    direct.getOrElse {
      try {
        spark.read.format("jdbc")
          .option("url", connectionUrl)
          .option("query", validationQuery)
          .option("user", cfg.username)
          .option("password", cfg.password)
          .load().count() == 1L
      } catch { case _: Throwable => false }
    }
  }
}
