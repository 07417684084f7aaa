package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableProvider` demonstrating STORAGE-PARTITIONED
  * JOINS (`SupportsReportPartitioning` + `KeyGroupedPartitioning` +
  * `HasPartitionKey`) — the Spark 3.3+/4.x contract that lets two
  * sources already laid out on the same key join with NO shuffle on
  * either side (the mechanism Iceberg/Delta use to make a
  * fact-to-fact join at 100 TB exchange-free: co-partitioned scans zip
  * partition-for-partition instead of re-hashing petabytes).
  *
  * The table is the deterministic generated relation `(k BIGINT,
  * v BIGINT)` with `parts` distinct keys; input partition `p` holds
  * exactly the rows with `k = p` (`v = mult*i + p` for
  * `i in [0, rowsPer)`), reports `partitionKey() = [p]`, and the scan
  * reports `KeyGroupedPartitioning(identity(k), parts)`.  With
  * `spark.sql.sources.v2.bucketing.enabled=true`, an equi-join of two
  * such tables on `k` plans ZERO Exchange nodes (asserted in
  * `BucketedKvV2Spec`); with the conf off the same query degrades to a
  * plain shuffled join with identical results — semantics never depend
  * on the optimization firing.
  *
  * Usage: `spark.read.format("graft.sources.BucketedKvV2")
  *   .option("parts", 8).option("rowsPer", 50).option("mult", 3).load()`
  */
class BucketedKvV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketedKvV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BucketedKvTable(
      properties.getOrDefault("parts", "8").toInt,
      properties.getOrDefault("rowsPer", "50").toLong,
      properties.getOrDefault("mult", "1").toLong)
}

object BucketedKvV2 {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))
}

private class BucketedKvTable(parts: Int, rowsPer: Long, mult: Long)
    extends Table with SupportsRead {
  override def name(): String = s"bucketed_kv(parts=$parts, rowsPer=$rowsPer, mult=$mult)"
  override def schema(): StructType = BucketedKvV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BucketedKvScan(parts, rowsPer, mult)
    }
}

/** Reports key-grouped layout on identity(k): one input partition per
  * distinct key, each carrying its key value for the SPJ matcher.
  */
private class BucketedKvScan(parts: Int, rowsPer: Long, mult: Long)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = BucketedKvV2.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"BucketedKvScan KeyGroupedPartitioning: [identity(k)], parts=$parts"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), parts)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until parts).map(p => BucketedKvPartition(p.toLong, rowsPer, mult)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[BucketedKvPartition]
        new PartitionReader[InternalRow] {
          private var i = -1L
          override def next(): Boolean = { i += 1; i < kp.rowsPer }
          override def get(): InternalRow =
            InternalRow(kp.key, kp.mult * i + kp.key)
          override def close(): Unit = ()
        }
      }
    }
}

private case class BucketedKvPartition(key: Long, rowsPer: Long, mult: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
}
