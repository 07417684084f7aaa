package graft.sources

import java.util

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` with FULL scan-pushdown surface (the
  * extension point of the reference's `datasources/v2/`): a
  * deterministic generated table `(id BIGINT, sq BIGINT, tag STRING)`
  * of `n` rows served from `slices` independent input partitions.
  *
  * Beyond the bare read path, the scan builder implements
  *  - `SupportsPushDownFilters`: range predicates on `id` are absorbed
  *    into the generator bounds, so a `WHERE id < 100` over n=10^9
  *    plans 100 rows of work, not 10^9 scanned-then-filtered — the
  *    same contract parquet row-group pruning gives a file scan;
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the projected columns (column pruning at the source);
  *  - `SupportsPushDownLimit` / `SupportsPushDownTopN`: LIMIT and
  *    ORDER BY id [DESC] LIMIT k are absorbed into the generator
  *    bounds (COMPLETE pushdown — the plan keeps no Limit/Sort node),
  *    the contract JDBC sources use to turn a global top-k over 10^12
  *    rows into k rows of source work.
  *
  * Usage: `spark.read.format("graft.sources.SquaresV2")
  *   .option("n", 1000).option("slices", 8).load()`
  */
class SquaresV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SquaresV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SquaresTable(
      properties.getOrDefault("n", "100").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SquaresV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private class SquaresTable(n: Long, slices: Int) extends Table
    with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"squares(n=$n, slices=$slices)"
  override def schema(): StructType = SquaresV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SquaresScanBuilder(n, slices)

  /** Hidden `_slice` provenance column (the generator slice ordinal)
    * — the custom-source counterpart of the file source's `_metadata`:
    * absent from `SELECT *`, resolvable when referenced by name.
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_slice"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
    })
}

/** Absorbs `id` range predicates into [lo, hi) generator bounds and
  * prunes the output schema to the required columns.
  */
private class SquaresScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var required: StructType = SquaresV2.schema
  private var pushed: Array[Filter] = Array.empty
  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var desc: Boolean = false
  private var pushedTopN: Option[String] = None

  private def long(v: Any): Option[Long] = v match {
    case x: Long => Some(x)
    case x: Int => Some(x.toLong)
    case x: Short => Some(x.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition {
      case GreaterThan("id", v) => long(v).isDefined
      case GreaterThanOrEqual("id", v) => long(v).isDefined
      case LessThan("id", v) => long(v).isDefined
      case LessThanOrEqual("id", v) => long(v).isDefined
      case EqualTo("id", v) => long(v).isDefined
      case _ => false
    }
    sup.foreach {
      case GreaterThan("id", v) => lo = math.max(lo, long(v).get + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, long(v).get)
      case LessThan("id", v) => hi = math.min(hi, long(v).get)
      case LessThanOrEqual("id", v) => hi = math.min(hi, long(v).get + 1)
      case EqualTo("id", v) =>
        lo = math.max(lo, long(v).get); hi = math.min(hi, long(v).get + 1)
      case _ =>
    }
    pushed = sup
    unsup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT k over the ordered generator keeps the first k remaining
    * ids: `hi = lo + k`.  The scan emits exactly k rows in total, so
    * the pushdown is COMPLETE and Spark drops its Limit node.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.max(lo, 0L) + limit)
    pushedTopN = pushedTopN.orElse(Some(s"LIMIT $limit"))
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT k: ASC keeps `[lo, lo+k)` emitted
    * ascending (the scan's natural order); DESC keeps `[hi-k, hi)` and
    * flips the scan to emit descending — partitions reversed, readers
    * iterating downward — so the global output order IS the requested
    * order and Spark drops both the Sort and the Limit.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val onId = orders.length == 1 && (orders.head.expression() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    if (!onId) return false
    if (orders.head.direction() == SortDirection.DESCENDING) {
      desc = true
      lo = math.max(lo, math.max(hi, lo) - limit)
    } else {
      hi = math.min(hi, math.max(lo, 0L) + limit)
    }
    pushedTopN = Some(s"TOPN id ${orders.head.direction()} $limit")
    true
  }

  /** Both limit and top-N are absorbed exactly — never partial. */
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan =
    new SquaresScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), slices,
      required, pushed, desc, pushedTopN)
}

private class SquaresScan(lo: Long, hi: Long, slices: Int,
    required: StructType, pushed: Array[Filter], desc: Boolean = false,
    pushedTopN: Option[String] = None) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SquaresScan range=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}]" +
      pushedTopN.fold("")(t => s", Pushed$t") +
      s", ReadSchema: ${required.simpleString}"

  /** EXACT post-pushdown statistics (the generator knows its own
    * cardinality): without these a v2 relation defaults to
    * `defaultSizeInBytes` = "huge" and is NEVER auto-broadcast — with
    * them, join-side selection works off the real row count, so a
    * small scan broadcasts with no hint (asserted in `SourcesSpec`).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(0L, hi - lo) * 24L)
    override def numRows(): OptionalLong =
      OptionalLong.of(math.max(0L, hi - lo))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    val ranges = (lo until hi by per).zipWithIndex
      .map { case (start, idx) =>
        SquaresPartition(start, math.min(start + per, hi), desc, idx.toLong)
      }
    // descending top-N: global output order = requested order, so the
    // highest range must be partition 0 and readers run downward
    (if (desc) ranges.reverse else ranges).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SquaresReaderFactory(required)
}

private case class SquaresPartition(start: Long, end: Long,
    desc: Boolean = false, slice: Long = 0L) extends InputPartition

/** Emits only the pruned columns, in the required order; iterates
  * downward when the partition carries the descending top-N flag.
  */
private class SquaresReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SquaresPartition]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = if (p.desc) p.end else p.start - 1
      override def next(): Boolean =
        if (p.desc) { cur -= 1; cur >= p.start }
        else { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values: Array[Any] = fields.map {
          case "id" => cur
          case "sq" => cur * cur
          case "tag" => UTF8String.fromString(if (cur % 2 == 0) "even" else "odd")
          case "_slice" => p.slice
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
