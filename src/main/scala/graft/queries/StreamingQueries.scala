package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming surfaced through the CORRECTNESS gate: the
  * events table is replayed through a file stream in micro-batches,
  * the streaming operators run with real state-store semantics, and
  * the final in-memory table must equal the batch oracle — proving the
  * incremental execution converges to the relational answer.
  *
  * Replay is file-based (write N parquet chunks, readStream with
  * maxFilesPerTrigger=1): the write is distributed and nothing is ever
  * collected to the driver, so the same gate shape works at any SF —
  * unlike a MemoryStream, which would materialize the table in the
  * driver JVM.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  /** Write the (projected) events to a temp dir as `chunks` parquet
    * files and open a file stream over them, one file per micro-batch.
    */
  private def replay(s: SparkSession, df: DataFrame, chunks: Int): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_replay").toString
    df.repartition(chunks).write.mode("overwrite").parquet(tmp)
    s.readStream
      .schema(df.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
  }

  val queries: Map[String, Q] = Map(
    // Tumbling-window aggregation: state merges across 3 micro-batches,
    // complete-mode memory sink, equals the batch GROUP BY oracle.
    "q_stream_tumbling" -> { (s, dir) =>
      val src = Tables.load(s, dir, "events")
        .select(col("ts"), col("event_type"),
          col("value").cast("decimal(12,2)").as("v"))
      val stream = replay(s, src, chunks = 3)
      val name = s"stream_tumbling_${runId.incrementAndGet()}"
      val agg = stream
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"), col("n"), col("total").cast("double").as("total"))
        .orderBy(col("h"), col("event_type"))
    },

    // Streaming deduplication: dropDuplicates state across micro-batches
    // in append mode; the emitted key set equals batch DISTINCT.  Only
    // the key is output — which concrete row survives per key depends
    // on partition order and is not part of the operator's contract.
    "q_stream_dedup" -> { (s, dir) =>
      val src = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"))
      val stream = replay(s, src, chunks = 3)
      val name = s"stream_dedup_${runId.incrementAndGet()}"
      val deduped = stream.dropDuplicates("user_id")
      val q = deduped.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table(name)
        .select(col("user_id"))
        .orderBy(col("user_id"))
    })

  val oracle: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS h,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id FROM events ORDER BY user_id""".stripMargin)
}
