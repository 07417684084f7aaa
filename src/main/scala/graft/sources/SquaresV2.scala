package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
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
  *    the projected columns (column pruning at the source).
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

private class SquaresTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"squares(n=$n, slices=$slices)"
  override def schema(): StructType = SquaresV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SquaresScanBuilder(n, slices)
}

/** Absorbs `id` range predicates into [lo, hi) generator bounds and
  * prunes the output schema to the required columns.
  */
private class SquaresScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = SquaresV2.schema
  private var pushed: Array[Filter] = Array.empty
  private var lo: Long = 0L
  private var hi: Long = n // exclusive

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

  override def build(): Scan =
    new SquaresScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), slices,
      required, pushed)
}

private class SquaresScan(lo: Long, hi: Long, slices: Int,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SquaresScan range=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per)
      .map(start => SquaresPartition(start, math.min(start + per, hi)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SquaresReaderFactory(required)
}

private case class SquaresPartition(start: Long, end: Long) extends InputPartition

/** Emits only the pruned columns, in the required order. */
private class SquaresReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SquaresPartition]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values: Array[Any] = fields.map {
          case "id" => cur
          case "sq" => cur * cur
          case "tag" => UTF8String.fromString(if (cur % 2 == 0) "even" else "odd")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
