package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** JVM-scoped temp-dir registry for gate entries that materialize
  * intermediate files (format round-trips, streaming replays, bucketed
  * tables).
  *
  * Two lifetimes:
  *  - SESSION scratch ([[sessionDir]]): metastore/warehouse/local-dir —
  *    lives until the JVM exits (deleted by the shutdown hook).
  *  - GATE scratch ([[tempDir]]): per-invocation round-trip files,
  *    replay corpora, checkpoints — ALSO shutdown-deleted, but a
  *    battery runner (Bench/Verify) additionally calls
  *    [[releaseGateScratch]] between gates so a 602-entry session never
  *    accumulates every gate's debris (round-16 verdict item 2: scratch
  *    lifetime == JVM lifetime let a full battery pile up hundreds of
  *    dirs, and any OS caching of those bytes competes with the page
  *    cache the parquet scans need).
  */
object TmpCleanup {
  private val dirs = new ConcurrentLinkedQueue[Path]()
  private val gateDirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = gateDirs.poll()
    while (p != null) { deleteRecursively(p); p = gateDirs.poll() }
    p = dirs.poll()
    while (p != null) { deleteRecursively(p); p = dirs.poll() }
  }, "graft-tmp-cleanup"))

  /** Scratch base.  Default: the JVM temp dir (None here).  An
    * explicit `SPARK_GRAFT_TMPDIR` relocates all graft scratch — the
    * ONLY way to put it on a tmpfs.  Round 16 defaulted to `/dev/shm`
    * when writable and the driver's 32-core battery collapsed ~46%:
    * RAM-backed scratch (including shuffle files) competes with the
    * JVM heap and the parquet page cache for the same physical memory,
    * an in-session, core-count-scaled slowdown invisible to isolated
    * retests — and at 100 TB shuffle spill exceeds RAM outright, so a
    * tmpfs `spark.local.dir` default is a scale-killer (tmpfs fills →
    * ENOSPC), the opposite of guide §5/§6 hygiene.  Never again by
    * default; opt-in stays for operators who know their box.
    */
  private[graft] val scratchBase: Option[Path] =
    sys.env.get("SPARK_GRAFT_TMPDIR").flatMap { d =>
      val p = java.nio.file.Paths.get(d)
      if (Files.isDirectory(p)) Some(p)
      else {
        // fail loudly, not silently: a typo'd override must not fake
        // the default path's numbers (round-16 ADVICE)
        System.err.println(
          s"[tmpcleanup] SPARK_GRAFT_TMPDIR=$d is not a directory; " +
            "using the JVM default temp dir")
        None
      }
    }

  private def create(prefix: String): Path = scratchBase match {
    case Some(b) => Files.createTempDirectory(b, prefix)
    case None    => Files.createTempDirectory(prefix)
  }

  /** GATE-scoped temp dir: removed at JVM shutdown, or earlier when the
    * battery runner calls [[releaseGateScratch]] after the gate's
    * action completes.
    */
  def tempDir(prefix: String): String = {
    val p = create(prefix)
    gateDirs.add(p)
    p.toString
  }

  /** SESSION-scoped temp dir (metastore, warehouse, spark.local.dir):
    * removed only at JVM shutdown, never by [[releaseGateScratch]].
    */
  def sessionDir(prefix: String): String = {
    val p = create(prefix)
    dirs.add(p)
    p.toString
  }

  /** Delete every gate-scoped dir handed out so far.  Callers must
    * have fully consumed (actioned) any DataFrame that reads from gate
    * scratch — Bench/Verify call this strictly AFTER the gate's
    * count()/write completes, outside the timed region.
    */
  def releaseGateScratch(): Unit = {
    var p = gateDirs.poll()
    while (p != null) { deleteRecursively(p); p = gateDirs.poll() }
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
