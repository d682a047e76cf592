package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-run temp directories that clean themselves up on JVM exit — the
  * Verify/Bench/PlanAudit warehouse dirs hold full copies of every
  * materialized table and would otherwise accumulate in /tmp per run.
  */
object TempDirs {
  private val owned = scala.collection.mutable.Set[Path]()

  /** Shutdown hooks don't run for killed JVMs (timeouts, OOM-kills), so
    * stale graft temp dirs accumulate across runs. Every create() sweeps
    * sibling `graft-*` dirs untouched for this long — far beyond any live
    * run's write cadence, so a concurrent process's dirs are never hit.
    */
  private val StaleAfterMs = 2L * 60 * 60 * 1000

  def create(prefix: String): String = {
    sweepStale()
    require(prefix.startsWith("graft-"),
      s"temp dir prefixes must carry the graft- sweep marker: $prefix")
    val dir = Files.createTempDirectory(prefix)
    synchronized { owned += dir.toAbsolutePath.normalize }
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private def sweepStale(): Unit =
    try {
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp"))
      val cutoff = System.currentTimeMillis() - StaleAfterMs
      val listing = Files.list(tmp)
      try listing.forEach { p =>
        val mine = synchronized(owned.contains(p.toAbsolutePath.normalize))
        if (!mine && p.getFileName.toString.startsWith("graft-") &&
          Files.isDirectory(p) &&
          Files.getLastModifiedTime(p).toMillis < cutoff)
          deleteRecursively(p)
      } finally listing.close()
    } catch { case _: Throwable => () } // hygiene must never fail a run

  /** True when `path` lives under a temp dir THIS process created — the
    * ownership check destructive cleanup paths (Warehouse stale-location
    * clearing) require before deleting anything recursively.
    */
  def ownsPath(path: String): Boolean = {
    val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    synchronized { owned.exists(p.startsWith) }
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
      finally walk.close()
    } catch { case _: Throwable => () } // best effort at exit
}
