package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming surfaced through the CORRECTNESS gate: the
  * events table is replayed through a MemoryStream in micro-batches,
  * the streaming aggregation runs with real state-store semantics
  * (complete output mode), and the final in-memory table must equal
  * the batch oracle — proving the incremental execution converges to
  * the relational answer.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> { (s, dir) =>
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_type"),
          col("value").cast("decimal(12,2)").as("v"))
        .as[(java.sql.Timestamp, String, java.math.BigDecimal)]
        .collect()
      val stream = MemoryStream[(java.sql.Timestamp, String, java.math.BigDecimal)]
      // replay in 3 micro-batches to exercise state merge across batches
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach(b => stream.addData(b.toSeq))
      val name = s"stream_tumbling_${runId.incrementAndGet()}"
      val agg = stream.toDS().toDF("ts", "event_type", "v")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"), col("n"), col("total").cast("double").as("total"))
        .orderBy(col("h"), col("event_type"))
    })

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS h,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)
}
