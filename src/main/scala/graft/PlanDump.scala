package graft

/** Writes `.explain("formatted")` output for named registry queries into
  * per-query files — the before/after plan evidence the optimization
  * rounds commit under `plans/r<N>/<query>_<tag>.txt`.
  *
  * Usage: `runMain graft.PlanDump <outDir> <tag> q_a,q_b,...`
  * (tag = `before` / `after`). Same session shape as [[PlanAudit]]
  * (local[8], full scan metadata) so pushdown lists print untruncated.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val (outDir, tag) = (args(0), args(1))
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-plandump-wh"))
      .config("spark.sql.maxMetadataStringLength", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    OracleInputs.withDurability(false) {
      for (n <- names) {
        val df = SparkEntry.queries(n)(spark, d)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), txt)
        println(s"wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
      }
    }
    spark.stop()
  }
}
