package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** JVM-scoped temp-dir registry for gate entries that materialize
  * intermediate files (format round-trips, streaming replays, bucketed
  * tables).  Every directory handed out here is recursively deleted by
  * a single shutdown hook, so repeated Verify/Bench runs inside one
  * session never accumulate /tmp data beyond the session lifetime.
  */
object TmpCleanup {
  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = dirs.poll()
    while (p != null) {
      deleteRecursively(p)
      p = dirs.poll()
    }
  }, "graft-tmp-cleanup"))

  /** Create a temp directory that will be removed at JVM shutdown. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Best-effort recursive delete for stale paths a previous JVM left
    * behind (e.g. managed-table locations whose catalog entry died with
    * the session).
    */
  def deleteStale(p: Path): Unit = deleteRecursively(p)

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best-effort: never fail shutdown
  }
}
