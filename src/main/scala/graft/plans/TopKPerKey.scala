package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Custom whole-operator: per-key top-k WITHOUT a full sort.
  *
  * Spark plans `row_number().over(partitionBy(k).orderBy(o)) <= n` as
  * shuffle → full per-partition SORT → WindowExec → filter: O(n log n)
  * per partition and the entire partition buffers.  This operator is
  * the §2-beyond extension done the reference way (a first-class plan
  * node, like its `TakeOrderedAndProjectExec` — `execution/limit
  * .scala:124` — but grouped): hash-shuffle on the key, then ONE pass
  * with a bounded k-heap per key — O(n log k), memory O(keys·k).
  * At 100 TB the sort never happens and nothing but the winners is
  * buffered.
  *
  * Integration is the stock extension path (logical node → strategy →
  * exec), enabled per-session via `spark.experimental.extraStrategies`
  * or `SparkSessionExtensions.injectPlannerStrategy` — no fork, exactly
  * the architecture SURVEY.md §0 mandates.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      // max-heap by sort order: head = current worst of the kept k
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(order, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < k) {
          heap.enqueue(row.copy())
        } else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.order, t.k, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Keep the first k rows per key under `order` (ties broken by the
    * order itself — include a unique column for determinism).  Installs
    * [[TopKStrategy]] into the session's experimental strategies on
    * first use.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    // Resolve each column against df's analyzed plan (a custom logical
    // node's expressions aren't resolved by the analyzer's named-node
    // rules, so hand it only resolved expressions).
    def resolve(e: Expression): Expression = {
      val projected = df.select(ColumnBridge.column(e)).queryExecution.analyzed
      projected.asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
        .projectList.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case other => other
      }
    }
    // Column.desc converts lazily (ColumnNodeExpression), so pattern-
    // matching on catalyst SortOrder silently loses the direction.
    // Borrow the analyzer instead: df.sort(order) produces a resolved
    // Sort node whose order is exactly the catalyst SortOrders we need,
    // resolved against df's own attribute ids.
    val keyExprs = keys.map(c => resolve(ColumnBridge.expression(c)))
    val sortOrders = df.sort(order: _*).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort].order
    val plan = TopKPerKey(keyExprs, sortOrders, k,
      df.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, plan)
  }
}
