package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` demonstrating AGGREGATE PUSHDOWN
  * (`SupportsPushDownAggregates`) — the DSv2 contract that lets a
  * source answer `GROUP BY` queries from its own statistics instead of
  * shipping raw rows (the mechanism JDBC/Delta use to turn a 10^12-row
  * `SELECT grp, count(*), min(v), max(v), sum(v)` into
  * source-rows-per-group work).
  *
  * The table is the deterministic generated relation
  * `(id BIGINT, grp STRING, v BIGINT)` with `grp = 'g' || (id % groups)`
  * and `v = id`, for `id in [0, n)`.  When Spark offers a group-by-`grp`
  * aggregation built from COUNT(*) / MIN(v) / MAX(v) / SUM(v), the scan
  * claims COMPLETE pushdown and emits one closed-form row per group —
  * the physical plan then contains NO Aggregate node at all, and the
  * scan's row count drops from n to `groups`.  Any other shape falls
  * back to the raw-row path (Spark aggregates as usual), so semantics
  * never depend on the pushdown firing.
  *
  * Usage: `spark.read.format("graft.sources.GroupStatsV2")
  *   .option("n", 800).option("groups", 8).load()`
  */
class GroupStatsV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GroupStatsV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GroupStatsTable(
      properties.getOrDefault("n", "800").toLong,
      properties.getOrDefault("groups", "8").toInt)
}

object GroupStatsV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))
}

private class GroupStatsTable(n: Long, groups: Int) extends Table with SupportsRead {
  override def name(): String = s"group_stats(n=$n, groups=$groups)"
  override def schema(): StructType = GroupStatsV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GroupStatsScanBuilder(n, groups)
}

/** Accepts a group-by-`grp` aggregation over COUNT(*)/MIN(v)/MAX(v)/
  * SUM(v) for complete pushdown; anything else is declined and served
  * as raw rows.
  */
private class GroupStatsScanBuilder(n: Long, groups: Int) extends ScanBuilder
    with SupportsPushDownAggregates with SupportsPushDownRequiredColumns {
  private var required: StructType = GroupStatsV2.schema
  private var pushed: Option[Seq[AggregateFunc]] = None

  private def isCol(e: Expression, name: String): Boolean = e match {
    case r: NamedReference => r.fieldNames.sameElements(Array(name))
    case _ => false
  }

  private def supported(agg: Aggregation): Option[Seq[AggregateFunc]] = {
    val groupOk = agg.groupByExpressions.length == 1 &&
      isCol(agg.groupByExpressions.head, "grp")
    val funcs = agg.aggregateExpressions.toSeq
    val funcsOk = funcs.nonEmpty && funcs.forall {
      case _: CountStar => true
      case m: Min => isCol(m.column, "v")
      case m: Max => isCol(m.column, "v")
      case s: Sum => !s.isDistinct && isCol(s.column, "v")
      case _ => false
    }
    if (groupOk && funcsOk) Some(funcs) else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    supported(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    supported(agg) match {
      case Some(funcs) => pushed = Some(funcs); true
      case None => false
    }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // only meaningful on the raw path; once an aggregation is pushed the
    // output schema is the aggregate schema built in build()
    if (pushed.isEmpty) required = requiredSchema

  override def build(): Scan = pushed match {
    case Some(funcs) => new GroupStatsAggScan(n, groups, funcs)
    case None => new GroupStatsRawScan(n, groups, required)
  }
}

/** Complete-pushdown scan: one closed-form row per non-empty group,
  * columns = grp then the pushed aggregates in offer order.
  */
private class GroupStatsAggScan(n: Long, groups: Int,
    funcs: Seq[AggregateFunc]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    StructField("grp", StringType, nullable = false) +:
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", LongType, nullable = false) })
  override def toBatch: Batch = this
  override def description(): String =
    s"GroupStatsAggScan PushedAggregates: [${funcs.mkString(", ")}], " +
      "GroupBy: [grp]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GroupStatsAggPartition(n, groups, funcs.toArray))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val gp = p.asInstanceOf[GroupStatsAggPartition]
        new PartitionReader[InternalRow] {
          private var g = -1
          override def next(): Boolean = { g += 1; g < gp.groups && g < gp.n }
          override def get(): InternalRow = {
            // ids in group g: g, g+groups, g+2*groups, ... < n
            val cnt = (gp.n - 1 - g) / gp.groups + 1
            val min = g.toLong
            val max = g + (cnt - 1) * gp.groups
            val sum = cnt * (min + max) / 2 // arithmetic series
            val aggs = gp.funcs.map {
              case _: CountStar => cnt
              case _: Min => min
              case _: Max => max
              case _: Sum => sum
            }
            InternalRow.fromSeq(
              UTF8String.fromString(s"g$g") +: aggs.toIndexedSeq)
          }
          override def close(): Unit = ()
        }
      }
    }
}

private case class GroupStatsAggPartition(n: Long, groups: Int,
    funcs: Array[AggregateFunc]) extends InputPartition

/** Raw-row fallback (and the semantics reference for the pushdown):
  * emits `(id, grp, v)` with the projected columns only.
  */
private class GroupStatsRawScan(n: Long, groups: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val slices = 4
    val per = math.max(1L, (n + slices - 1) / slices)
    (0L until n by per)
      .map(s => GroupStatsRawPartition(s, math.min(s + per, n), groups))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val gp = p.asInstanceOf[GroupStatsRawPartition]
        new PartitionReader[InternalRow] {
          private var cur = gp.start - 1
          override def next(): Boolean = { cur += 1; cur < gp.end }
          override def get(): InternalRow = InternalRow.fromSeq(
            fields.toIndexedSeq.map {
              case "id" => cur
              case "grp" => UTF8String.fromString(s"g${cur % gp.groups}")
              case "v" => cur
            })
          override def close(): Unit = ()
        }
      }
    }
  }
}

private case class GroupStatsRawPartition(start: Long, end: Long,
    groups: Int) extends InputPartition
