package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** The `statestore` / `state-metadata` batch sources: streaming state
  * at rest is a queryable table.  Covers what the gate entry
  * (q_statestore_read) does not: operator metadata fields, per-batch
  * state pinning, and that state RE-reads are stable.
  */
class StateStoreReadSpec extends SparkSpec {
  import spark.implicits._

  private def runAgg(): (String, Long) = {
    val in = graft.TmpCleanup.tempDir("graft_ssspec_in")
    (1 to 40).map(i => (i % 5L, i.toLong)).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(in)
    val ckpt = graft.TmpCleanup.tempDir("graft_ssspec_ckpt")
    val q = spark.readStream
      .schema(new StructType().add("k", "long").add("v", "long"))
      .option("maxFilesPerTrigger", 2).parquet(in)
      .groupBy("k").agg(sum("v").as("sv"))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = spark.read.format("state-metadata").load(ckpt)
      .select(max("maxBatchId")).collect().head.getLong(0)
    (ckpt, batches)
  }

  test("state-metadata describes the aggregation operator") {
    val (ckpt, maxBatch) = runAgg()
    val md = spark.read.format("state-metadata").load(ckpt).collect()
    assert(md.length == 1, s"one stateful operator expected, got ${md.toSeq}")
    val row = md.head
    val name = row.getAs[String]("operatorName")
    assert(name == "stateStoreSave", s"got $name")
    assert(row.getAs[Int]("numPartitions") == 4)
    assert(maxBatch >= 1, "AvailableNow over 4 files with maxFilesPerTrigger=2 " +
      s"should commit >= 2 batches, got maxBatchId=$maxBatch")
  }

  test("statestore reads converge to the batch aggregate and pin by batchId") {
    val (ckpt, maxBatch) = runAgg()
    def stateAt(batch: Long): Map[Long, Long] = {
      val st = spark.read.format("statestore")
        .option("batchId", batch).load(ckpt)
      // buffer fields carry internal names (`sum`), resolve by position
      val vf = st.schema("value").dataType.asInstanceOf[StructType].fieldNames
      st.select(col("key.k"), col(s"value.${vf(0)}"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val fin = stateAt(maxBatch)
    // batch answer: sum of 1..40 grouped by i % 5
    val expected = (1 to 40).groupBy(_ % 5L)
      .map { case (k, vs) => k -> vs.map(_.toLong).sum }
    assert(fin == expected, s"got $fin")
    // earlier batch holds a strict subset of the final totals
    val early = stateAt(0L)
    assert(early.nonEmpty && early.keySet.subsetOf(fin.keySet))
    assert(early.values.sum < fin.values.sum,
      s"batch-0 state should predate later merges: $early vs $fin")
    // re-read is stable (snapshot semantics, no state mutation on read)
    assert(stateAt(maxBatch) == fin)
  }

  test("statestore reads stream-stream join state per side via joinSide") {
    val inL = graft.TmpCleanup.tempDir("graft_ssspec_jl")
    val inR = graft.TmpCleanup.tempDir("graft_ssspec_jr")
    (1L to 6L).map(i => (i, s"l$i")).toDF("k", "lv")
      .coalesce(1).write.mode("overwrite").parquet(inL)
    (4L to 9L).map(i => (i, s"r$i")).toDF("k", "rv")
      .coalesce(1).write.mode("overwrite").parquet(inR)
    val ckpt = graft.TmpCleanup.tempDir("graft_ssspec_jckpt")
    val l = spark.readStream
      .schema(new StructType().add("k", "long").add("lv", "string")).parquet(inL)
    val r = spark.readStream
      .schema(new StructType().add("k", "long").add("rv", "string")).parquet(inR)
    val q = l.join(r, "k")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def sideKeys(side: String): Set[Long] =
      spark.read.format("statestore")
        .option("joinSide", side).load(ckpt)
        .select(col("key.field0")).collect().map(_.getLong(0)).toSet
    // join state buffers EVERY input row per side (inner join, no
    // watermark eviction): the full key range of each input, not just
    // the matched intersection
    assert(sideKeys("left") == (1L to 6L).toSet)
    assert(sideKeys("right") == (4L to 9L).toSet)
  }
}
