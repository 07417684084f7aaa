package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableProvider` demonstrating RUNTIME FILTERING
  * (`SupportsRuntimeFiltering`) — the DSv2 contract behind dynamic
  * partition pruning on v2 sources: when the fact side of a broadcast
  * join declares `part` as a filter attribute, Spark ships the dim
  * side's observed join keys to the scan at EXECUTION time, and the
  * source drops whole input partitions before reading a row (the
  * mechanism that turns "scan 10^4 partitions, join, discard 99%"
  * into "read only the 3 partitions the dim actually references").
  *
  * The table is the deterministic generated relation `(part BIGINT,
  * v BIGINT)`: partition `p` holds `v = p*rowsPer + i` for
  * `i in [0, rowsPer)`.  `filter()` absorbs `In`/`EqualTo` predicates
  * on `part` by dropping non-matching partitions; every
  * `planInputPartitions` call records its partition count under the
  * `probe` option so tests can assert how much of the table the final
  * (post-runtime-filter) plan actually read.
  *
  * Usage: `spark.read.format("graft.sources.PartKvV2")
  *   .option("parts", 64).option("rowsPer", 1000).load()`
  */
class PartKvV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PartKvV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PartKvTable(
      properties.getOrDefault("parts", "64").toInt,
      properties.getOrDefault("rowsPer", "1000").toLong,
      Option(properties.get("probe")))
}

object PartKvV2 {
  val schema: StructType = StructType(Seq(
    StructField("part", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** probe name -> partition count of the most recent plan; the
    * post-runtime-filter re-plan is the last writer for an executed
    * query, so tests read the pruned partition count here.
    */
  val lastPlanned: ConcurrentHashMap[String, Integer] = new ConcurrentHashMap()
}

private class PartKvTable(parts: Int, rowsPer: Long, probe: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"part_kv(parts=$parts, rowsPer=$rowsPer)"
  override def schema(): StructType = PartKvV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PartKvScan(parts, rowsPer, probe)
    }
}

private class PartKvScan(parts: Int, rowsPer: Long, probe: Option[String])
    extends Scan with Batch with SupportsRuntimeFiltering {
  // partitions surviving runtime filters; starts as the full table
  private var kept: Array[Long] = (0L until parts.toLong).toArray

  override def readSchema(): StructType = PartKvV2.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PartKvScan parts=$parts RuntimeFilterable: [part]"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("part"))

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("part", values) =>
        val keep = values.collect {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
        }.toSet
        kept = kept.filter(keep)
      case EqualTo("part", v: java.lang.Long) => kept = kept.filter(_ == v.longValue())
      case _ => // unsupported runtime predicate: keep everything (pruning is best-effort)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    probe.foreach(p => PartKvV2.lastPlanned.put(p, kept.length))
    kept.map(p => PartKvPartition(p, rowsPer)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[PartKvPartition]
        new PartitionReader[InternalRow] {
          private var i = -1L
          override def next(): Boolean = { i += 1; i < kp.rowsPer }
          override def get(): InternalRow =
            InternalRow(kp.part, kp.part * kp.rowsPer + i)
          override def close(): Unit = ()
        }
      }
    }
}

private case class PartKvPartition(part: Long, rowsPer: Long) extends InputPartition
