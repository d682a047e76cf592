package graft

import org.apache.spark.sql.DataFrame

/** Side-channel for oracle SQL that must consume ENGINE-produced
  * intermediates.
  *
  * Some operators have a hash-family-specific front half (minhash /
  * hyperplane-sketch candidate pairs — not reproducible in DuckDB) but a
  * fully deterministic back half (transitive closure → cluster-min canon,
  * exactly what q_dedup_clusters already proves DuckDB recomputes via
  * recursive CTE). Splitting the gate makes the back half oracle-checkable:
  * the query materializes its pair set as parquet here and then derives
  * survivors FROM THE MATERIALIZED ROWS; the dumped oracle SQL reads the
  * same rows back with read_parquet and recomputes the closure. The pairs
  * themselves stay property-tested (rows-only), the canon mapping is
  * hash-gated.
  *
  * Paths are namespaced by sf dir, so a later run at another scale (the
  * bench at sf0.1 after a verify at sf0.01) can never overwrite an earlier
  * run's oracle input.
  */
object OracleInputs {

  /** Root for materialized inputs — resolved against the process cwd once,
    * so the engine's write path and the SQL dumped by the SAME process
    * always agree.
    */
  lazy val base: String =
    new java.io.File("target/oracle_inputs").getAbsolutePath

  def dir(sfDir: String): String =
    s"$base/${sfDir.replaceAll("[^A-Za-z0-9.]+", "_")}"

  def path(sfDir: String, name: String): String = s"${dir(sfDir)}/$name"

  /** The sf dir the next [[SparkEntry.oracleSql]] evaluation should point
    * its read_parquet paths at. Verify sets this from its argument before
    * dumping; the default matches the driver's correctness-gate scale.
    */
  @volatile var oracleSfDir: String = "/root/testdata/sf0.01"

  /** When set, dumped oracle SQL reads inputs from THIS directory instead
    * of the live write location — Verify points it at a snapshot it copies
    * into its own outDir ([[snapshotTo]]), so a later run at the same sf
    * (a bench pass, a re-verify) can never overwrite the inputs between
    * the dump and the driver's DuckDB pass.
    */
  @volatile var sqlReadDir: Option[String] = None

  /** The path a dumped oracle-SQL string should reference for `name`. */
  def sqlPath(name: String): String =
    sqlReadDir.map(r => s"$r/$name").getOrElse(path(oracleSfDir, name))

  /** Copy this sf's materialized inputs into `destDir` (recursive file
    * copy) and route subsequent SQL dumps at the copy. No-op-safe when no
    * query materialized anything yet.
    */
  def snapshotTo(sfDir: String, destDir: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val src = Paths.get(dir(sfDir))
    val dst = Paths.get(destDir).toAbsolutePath
    // CLEAR the destination first: part-file names are unique per run, so
    // copying over a previous snapshot would ACCUMULATE files and the
    // oracle's glob would read both runs' rows (observed: doubled oracle
    // row counts on the second verify into the same outDir)
    if (Files.exists(dst)) {
      Files.walk(dst).sorted(java.util.Comparator.reverseOrder())
        .forEach((p: Path) => Files.delete(p))
    }
    if (Files.exists(src)) {
      Files.walk(src).forEach { p: Path =>
        val target = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    sqlReadDir = Some(dst.toString)
  }

  /** Write-then-read checkpoint: downstream engine derivation and the
    * oracle consume the SAME materialized rows (also flattens the logical
    * plan before the iterative component rounds, like a localCheckpoint
    * with a durable, oracle-readable location).
    */
  def checkpoint(df: DataFrame, sfDir: String, name: String): DataFrame = {
    val p = path(sfDir, name)
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }
}
