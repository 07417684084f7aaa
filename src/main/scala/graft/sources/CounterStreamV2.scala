package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 STREAMING source (`MicroBatchStream`): a
  * deterministic bounded counter emitting `(id, sq)` rows in micro-
  * batches of `rowsPerBatch`, finite at `n` total rows — the streaming
  * half of the DSv2 extension surface next to [[SquaresV2]]'s batch
  * half (reference analogue: `datasources/v2/` + the V2 streaming API
  * its 2.4 lineage only prototyped).
  *
  * Offsets are plain row counts; `planInputPartitions(start, end)`
  * serves the half-open id range, split across `slices` partitions, so
  * each micro-batch is a genuine parallel read with replayable,
  * checkpoint-serializable offsets (the `json()` round-trip below).
  *
  * Usage:
  * `spark.readStream.format("graft.sources.CounterStreamV2")
  *   .option("n", 1000).option("rowsPerBatch", 300).load()`
  */
class CounterStreamV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CounterStreamV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CounterTable(
      properties.getOrDefault("n", "100").toLong,
      properties.getOrDefault("rowsPerBatch", "10").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object CounterStreamV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))
}

private class CounterTable(n: Long, perBatch: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"counter(n=$n, perBatch=$perBatch)"
  override def schema(): StructType = CounterStreamV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = CounterStreamV2.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CounterStream(n, perBatch, slices)
    }
}

/** Row-count offset; serialized as its decimal string. */
private case class CounterOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private class CounterStream(n: Long, perBatch: Long, slices: Int)
    extends MicroBatchStream {
  // monotone high-water mark: each trigger reveals one more batch
  @volatile private var available: Long = 0L

  override def initialOffset(): Offset = CounterOffset(0L)

  override def latestOffset(): Offset = {
    available = math.min(n, available + perBatch)
    CounterOffset(available)
  }

  override def deserializeOffset(json: String): Offset = {
    // restart path: never let the high-water mark regress below an
    // offset restored from the checkpoint, or already-committed rows
    // would be re-planned (and re-emitted) by later triggers
    val v = json.toLong
    if (v > available) available = v
    CounterOffset(v)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[CounterOffset].v
    val hi = end.asInstanceOf[CounterOffset].v
    val span = math.max(0L, hi - lo)
    if (span == 0) return Array.empty
    val per = math.max(1L, (span + slices - 1) / slices)
    (lo until hi by per)
      .map(s => CounterPartition(s, math.min(s + per, hi)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CounterReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class CounterPartition(start: Long, end: Long) extends InputPartition

private class CounterReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CounterPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = InternalRow(cur, cur * cur)
      override def close(): Unit = ()
    }
  }
}
