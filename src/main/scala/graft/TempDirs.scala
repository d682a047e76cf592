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
    * stale graft temp dirs accumulate across runs. Dir names embed the
    * creating PID; every create() sweeps sibling graft dirs whose process
    * is no longer alive. Liveness — NOT age — is the criterion: a
    * directory's mtime only changes when its direct children change, so
    * nested table writes never refresh it and an age cutoff would delete a
    * long-lived concurrent run's live warehouse.
    */
  def create(prefix: String): String = {
    sweepDead()
    require(prefix.startsWith("graft-"),
      s"temp dir prefixes must carry the graft- sweep marker: $prefix")
    val dir = Files.createTempDirectory(s"$prefix-pid${ProcessHandle.current.pid}-")
    synchronized { owned += dir.toAbsolutePath.normalize }
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private val PidMarker = ".*-pid(\\d+)-.*".r

  private def sweepDead(): Unit =
    try {
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp"))
      val listing = Files.list(tmp)
      try listing.forEach { p =>
        val name = p.getFileName.toString
        val mine = synchronized(owned.contains(p.toAbsolutePath.normalize))
        if (!mine && name.startsWith("graft-") && Files.isDirectory(p))
          name match {
            // only pid-marked dirs are swept — an unmarked graft dir might
            // belong to a build running older code, and liveness can't be
            // established for it
            case PidMarker(pid) if ProcessHandle.of(pid.toLong).isEmpty =>
              deleteRecursively(p)
            case _ => ()
          }
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
