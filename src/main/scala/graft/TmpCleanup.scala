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

  /** Fastest available scratch base (optimization guide §6: put
    * ephemeral I/O on the fastest local media).  `SPARK_GRAFT_TMPDIR`
    * overrides; otherwise a writable tmpfs (`/dev/shm`) is preferred
    * over the JVM default temp dir, which on this class of host is a
    * spinning-rust-or-virtio `/tmp` whose rename/fsync latency lands
    * directly in every format-roundtrip write, streaming replay and
    * checkpoint commit.  Everything created here is session-scoped
    * scratch (deleted at JVM shutdown) — durability is not part of its
    * contract, exactly like Spark's own `spark.local.dir` shuffle
    * files, so RAM-backed placement changes latency, never semantics.
    */
  private[graft] val scratchBase: Option[Path] =
    sys.env.get("SPARK_GRAFT_TMPDIR").map(java.nio.file.Paths.get(_))
      .filter(Files.isDirectory(_))
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
        else None
      }

  /** Create a temp directory that will be removed at JVM shutdown. */
  def tempDir(prefix: String): String = {
    val p = scratchBase match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None    => Files.createTempDirectory(prefix)
    }
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
