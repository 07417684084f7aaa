package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 `TableProvider` (the extension surface of the
  * reference's `datasources/v2/`): a deterministic generated table
  * `(id BIGINT, sq BIGINT, tag STRING)` of `n` rows served from
  * `slices` independent input partitions, so a full scan is a genuine
  * parallel read with no driver materialization.
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
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SquaresV2.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (n + slices - 1) / slices)
        (0L until n by per)
          .map(start => SquaresPartition(start, math.min(start + per, n)))
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SquaresReaderFactory
    }
}

private case class SquaresPartition(start: Long, end: Long) extends InputPartition

private class SquaresReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SquaresPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow =
        InternalRow(cur, cur * cur,
          UTF8String.fromString(if (cur % 2 == 0) "even" else "odd"))
      override def close(): Unit = ()
    }
  }
}
