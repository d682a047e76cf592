package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access for the query registry (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and resolves its inputs here, so the
  * scan is always a plain parquet read that Catalyst can prune/push into
  * (column pruning + predicate pushdown reach the parquet scan — the same
  * pushdown posture the reference hand-builds into its extraction SQL,
  * mozart_etl/lib/extract/connectors/base.py:56-79).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS); Spark has no ns timestamp, so we
    // read it as a ns-epoch Long — exact (better than a lossy µs truncation):
    // ordering and arithmetic stay bit-exact vs the DuckDB oracle's ns values.
    // Normally set at session construction (Verify/Bench/spec builders); the
    // guarded set here only covers a caller session that lacks it — a table
    // accessor must not unconditionally mutate session state.
    if (name == "events" &&
        !spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register fixture tables as temp views so `spark.sql` queries (the
    * SQL-model path, SURVEY.md §3.3) can name them like the DuckDB oracle
    * does. Idempotent; callers pass only the tables they read so unused
    * files are never opened.
    */
  def registerViews(spark: SparkSession, sfDir: String,
                    names: Seq[String] = all): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
