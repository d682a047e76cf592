package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-run temp directories that clean themselves up on JVM exit — the
  * Verify/Bench/PlanAudit warehouse dirs hold full copies of every
  * materialized table and would otherwise accumulate in /tmp per run.
  */
object TempDirs {
  private val owned = scala.collection.mutable.Set[Path]()

  def create(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    synchronized { owned += dir.toAbsolutePath.normalize }
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

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
