package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing query names restrict the dump — local iteration
    // only; the driver always passes exactly (sfDir, outDir)
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    // the dumped oracle SQL's read_parquet paths must reference THIS run's
    // materialized oracle inputs (graft.OracleInputs is sf-namespaced)
    OracleInputs.oracleSfDir = sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as exact ns-epoch Long
      // (Spark has no ns timestamp type) — see graft.Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Hermetic managed-table storage: a previous run's cwd/spark-warehouse
      // would otherwise make every saveAsTable create path fail with
      // LOCATION_ALREADY_EXISTS on the second run in the same checkout.
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-verify-wh"))
      // driver-side partition listing up to 1024 paths — see Bench's
      // builder for the rationale and the deployment override
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "1024"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Freeze this run's materialized oracle inputs into the outDir and
    // point the dumped SQL at the frozen copy — a later run at the same sf
    // (bench, re-verify) can then never overwrite them between this dump
    // and the driver's DuckDB pass.
    OracleInputs.snapshotTo(sfDir, s"$outDir/${OracleInputs.snapshotDirName}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
