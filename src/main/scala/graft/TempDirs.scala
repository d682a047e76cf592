package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-run temp directories that clean themselves up on JVM exit — the
  * Verify/Bench/PlanAudit warehouse dirs hold full copies of every
  * materialized table and would otherwise accumulate in /tmp per run.
  */
object TempDirs {
  def create(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
      finally walk.close()
    } catch { case _: Throwable => () } // best effort at exit
}
