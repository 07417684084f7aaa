package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path (`SupportsWrite` + the two-phase
  * task/driver commit protocol): rows are buffered per task, shipped as
  * `WriterCommitMessage`s, and only published to the named in-memory
  * table when the DRIVER commits — a partial/aborted job publishes
  * nothing (write atomicity, the property file-format committers give
  * via temp-dir rename).
  *
  * Usage: `df.write.format("graft.sources.MemSinkV2")
  *   .option("name", "t1").mode("append").save()`
  * then read back via `MemSinkV2.rows("t1")`.
  */
class MemSinkV2 extends TableProvider {
  // write-only source: schema is whatever the writing query provides —
  // declaring external metadata makes Spark pass the query schema to
  // getTable instead of validating against the (empty) inferred one
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemSinkTable(properties.getOrDefault("name", "default"), schema)
}

object MemSinkV2 {
  private val store = new ConcurrentHashMap[String, Seq[Seq[Any]]]()

  /** Committed rows of a named sink table (field values per row). */
  def rows(name: String): Seq[Seq[Any]] = store.getOrDefault(name, Seq.empty)

  def clear(name: String): Unit = store.remove(name)

  private[sources] def publish(name: String, rows: Seq[Seq[Any]]): Unit =
    store.merge(name, rows, (a, b) => a ++ b)

  private[sources] def replace(name: String, rows: Seq[Seq[Any]]): Unit =
    store.put(name, rows)
}

private class MemSinkTable(name: String, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"memsink($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateFirst = false
      // mode("overwrite") → truncate-then-append, still atomic at commit
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(name, info.schema(), truncateFirst)
      }
    }
}

private case class RowsMessage(rows: Seq[Seq[Any]]) extends WriterCommitMessage

private class MemBatchWrite(name: String, schema: StructType,
    truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)

  // publish ONLY here: task messages become visible atomically on
  // driver commit; abort discards everything
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.toSeq.flatMap(_.asInstanceOf[RowsMessage].rows)
    if (truncateFirst) MemSinkV2.replace(name, rows)
    else MemSinkV2.publish(name, rows)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // schema-driven Catalyst→Scala conversion: decimals, dates,
      // timestamps, arrays, maps and structs all surface in external
      // form from MemSinkV2.rows(), not just strings
      private val toScala =
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(schema)
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      override def write(record: InternalRow): Unit =
        buf += toScala(record).asInstanceOf[org.apache.spark.sql.Row].toSeq
      override def commit(): WriterCommitMessage = RowsMessage(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
