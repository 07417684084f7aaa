package graft.lineage

import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Column lineage for RUNNING streaming queries — the layer the
  * reference cannot have at all: its lineage is an analyzer rule over
  * batch plans (`ResolveLineage.scala:29-135`) and streaming plans
  * never pass through it.  Here a running query's sink columns trace to
  * its streaming sources two ways:
  *
  *  - [[ofQuery]] walks the query's STABLE streaming plan
  *    (`MicroBatchExecution.logicalPlan`, where pre-start
  *    `StreamingRelation` leaves have been rewritten to
  *    `StreamingExecutionRelation` / `StreamingDataSourceV2ScanRelation`)
  *    — source identity is the stream itself (`FileStreamSource[path]`,
  *    `MemoryStream[…]`), constant across micro-batches.
  *  - [[ofLastBatch]] walks the latest `IncrementalExecution`'s analyzed
  *    plan — the per-micro-batch plan in which each source has been
  *    substituted by the concrete batch it served (a file source becomes
  *    a `LogicalRelation` over the exact files of that batch), so the
  *    same sink column traces to the physical data of the batch.
  *
  * [[LineageListener]] snapshots [[ofQuery]] per run via the standard
  * `StreamingQueryListener` bus, so lineage survives the query (graphs
  * are kept post-mortem, bounded).  Driver-side plan metadata only —
  * nothing here touches the data path or adds per-row cost.
  */
object StreamingLineage {

  /** The engine under the public handle ([[StreamingQueryWrapper]] is
    * what `DataStreamWriter.start()` returns). */
  private def unwrap(q: StreamingQuery): StreamExecution = q match {
    case w: StreamingQueryWrapper => w.streamingQuery
    case e: StreamExecution => e
    case other => throw new IllegalArgumentException(
      s"not a stream-execution-backed query: ${other.getClass.getName}")
  }

  /** The running plan is wrapped in sink nodes (`WriteToStream`,
    * `WriteToMicroBatchDataSource`, `WriteToDataSourceV2`, …) whose own
    * output is Nil — the SINK COLUMNS are the output of the unary chain
    * underneath.  Strip down to the first node that exposes output.
    */
  private def stripSink(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan match {
    case w if (w.output.isEmpty || w.nodeName.startsWith("WriteTo")) &&
        w.children.sizeIs == 1 =>
      stripSink(w.children.head)
    case other => other
  }

  /** Sink-column lineage of a running (or stopped-but-started) query's
    * stable streaming plan.  Must not be called before the query thread
    * has initialized the plan — i.e. call after `processAllAvailable()`
    * / the first progress event (the listener below handles the
    * general case).
    */
  def ofQuery(q: StreamingQuery): ColumnLineage.LineageGraph =
    ColumnLineage.ofPlan(stripSink(unwrap(q).logicalPlan))

  /** Sink-column lineage of the LATEST micro-batch: the
    * `IncrementalExecution` analyzed plan, where each source leaf is the
    * concrete batch relation it served this trigger.  None before the
    * first batch has planned.
    */
  def ofLastBatch(q: StreamingQuery): Option[ColumnLineage.LineageGraph] =
    Option(unwrap(q).lastExecution)
      .map(ie => ColumnLineage.ofPlan(stripSink(ie.analyzed)))

  /** EXECUTED physical plan of the latest micro-batch — the
    * `IncrementalExecution` tree with its state-store operators
    * (StateStoreSave, StreamingSymmetricHashJoin, TransformWithState…),
    * for the streaming plan audit (`PlanAudit`). */
  def lastBatchPhysicalPlan(q: StreamingQuery): Option[String] =
    Option(unwrap(q).lastExecution).map(_.executedPlan.toString)

  /** HOP-level derivation trees of a RUNNING query's sink columns —
    * the [[ColumnLineage.hopsOf]] view over the same stable streaming
    * plan [[ofQuery]] walks: every intermediate named derivation kept,
    * stream-source leaves named by their live source identity.
    */
  def hopsOfQuery(q: StreamingQuery): Seq[(String, ColumnLineage.HopNode)] =
    ColumnLineage.hopsOfPlan(stripSink(unwrap(q).logicalPlan))

  /** Captures [[ofQuery]] per run id as the query progresses.  Register
    * with `spark.streams.addListener(new LineageListener(spark))`; read
    * with [[LineageListener.graphOf]].  Events are delivered on the
    * async listener bus, so a just-started query's graph appears after
    * its start/first-progress event drains; graphs are kept after
    * termination (bounded at [[LineageListener.MaxRuns]]; on overflow
    * the OLDEST terminated runs are evicted first — a still-active
    * run's graph is never dropped, and one overflow never wipes the
    * whole post-mortem map).
    */
  final class LineageListener(spark: SparkSession,
      maxRuns: Int = LineageListener.MaxRuns)
      extends StreamingQueryListener {
    import StreamingQueryListener._

    private val graphs = new java.util.concurrent.ConcurrentHashMap[
      UUID, ColumnLineage.LineageGraph]()
    // insertion order of first capture per run — the eviction queue
    // (a deque: still-active runs skipped during an overflow scan are
    // re-inserted at the HEAD so they keep their first-capture age and
    // are evicted oldest-terminated-first once they stop)
    private val order =
      new java.util.concurrent.ConcurrentLinkedDeque[UUID]()

    /** Last captured lineage of the given run, if any event for it has
      * been processed yet. */
    def graphOf(runId: UUID): Option[ColumnLineage.LineageGraph] =
      Option(graphs.get(runId))

    /** Oldest-first eviction of runs that are no longer active; a run
      * still in `spark.streams.active` is re-queued (skipped), so live
      * lineage survives any overflow. */
    private def evictOldest(): Unit = {
      val active = spark.streams.active.map(_.runId).toSet
      val skippedActive = mutable.ArrayBuffer.empty[UUID]
      var scanned = 0
      val bound = order.size()
      while (graphs.size() > maxRuns && scanned < bound) {
        scanned += 1
        val oldest = order.poll()
        if (oldest != null) {
          if (active.contains(oldest)) skippedActive += oldest
          else graphs.remove(oldest)
        }
      }
      // restore skipped still-active runs at the HEAD (reverse order so
      // their relative age is preserved) — they must remain the oldest
      // entries, not jump to newest, once they terminate
      skippedActive.reverseIterator.foreach(order.addFirst)
    }

    private def capture(runId: UUID): Unit =
      try {
        spark.streams.active.find(_.runId == runId).foreach { q =>
          // one plan walk per event: put() returns the previous value,
          // which doubles as the first-capture test
          val g = ofQuery(q)
          if (graphs.put(runId, g) == null) order.add(runId)
          if (graphs.size() > maxRuns) evictOldest()
        }
        // never let a lineage snapshot fail the listener bus (e.g. the
        // start event racing plan initialization) — progress events
        // will re-capture
      } catch { case scala.util.control.NonFatal(_) => }

    override def onQueryStarted(e: QueryStartedEvent): Unit =
      capture(e.runId)
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      capture(e.progress.runId)
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  object LineageListener {
    private[lineage] val MaxRuns = 256
  }
}
