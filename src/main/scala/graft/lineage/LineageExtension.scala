package graft.lineage

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Non-fork integration paths for lineage capture, mirroring the
  * reference's own extension demo
  * (`examples/src/main/scala/.../lineage/extension/Example.scala:46-52`,
  * which injects `ResolveRelation`/`ResolveExpression` via
  * `SparkSessionExtensions.injectResolutionRule`) — proof the fork was
  * unnecessary, which our rebuild takes as the architecture.
  *
  * Two hooks:
  *  - [[LineageExtension]]: `.withExtensions(new LineageExtension)` or
  *    `spark.sql.extensions=graft.lineage.LineageExtension`.  Injects a
  *    READ-ONLY resolution rule (the reference's rules mutate plan state;
  *    ours only observes — resolution still happens lazily via
  *    [[ColumnLineage.of]] so no analysis cost is added per rule-batch
  *    iteration).
  *  - [[LineageListener]]: a `QueryExecutionListener` recording the
  *    lineage of every *executed* query, for audit pipelines.
  */
class LineageExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(_ => LineageMarkerRule)
}

/** Observes analyzed plans; deliberately the identity transform. */
object LineageMarkerRule extends Rule[LogicalPlan] {
  @volatile private[lineage] var lastSeen: Option[LogicalPlan] = None
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.resolved) lastSeen = Some(plan)
    plan
  }
}

/** Records (queryName, LineageGraph) for each completed execution. */
class LineageListener extends QueryExecutionListener {
  private val log = new ConcurrentLinkedDeque[(String, ColumnLineage.LineageGraph)]()

  def recent: Seq[(String, ColumnLineage.LineageGraph)] = {
    val it = log.iterator()
    val buf = Seq.newBuilder[(String, ColumnLineage.LineageGraph)]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val graph = ColumnLineage.ofPlan(qe.analyzed)
    log.addFirst((funcName, graph))
    while (log.size > 100) log.removeLast()
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}
