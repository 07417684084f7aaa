package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Checkpoint/WAL recovery (§3.3: OffsetSeqLog + HDFSMetadataLog in the
  * reference): a file-source query is stopped and restarted against the
  * same checkpoint; already-committed input must not be reprocessed and
  * new input must be picked up exactly once.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint neither loses nor replays batches") {
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val nation = Tables.load(spark, sf, "nation")
    val schema = nation.schema

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => seen.add(r.getAs[Int]("n_nationkey").toLong))
        ()
      }
      .start()

    // phase 1: first file committed
    nation.filter(col("n_nationkey") < 10).write.mode("append").parquet(inDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterPhase1 = seen.size()
    assert(afterPhase1 == 10)

    // phase 2: new file arrives while the query is DOWN; restart
    nation.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 15)
      .write.mode("append").parquet(inDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val all = { import scala.jdk.CollectionConverters._; seen.iterator().asScala.toSeq }
    assert(all.size == 15, s"expected 15 total, got ${all.size}")
    assert(all.distinct.size == 15, "a batch was replayed after restart")
  }
}
