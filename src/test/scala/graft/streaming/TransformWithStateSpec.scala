package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.SparkSpec

/** Per-key running total via the Spark-4 `transformWithState` API
  * (StatefulProcessor + typed state variables over the RocksDB state
  * store) — the successor of flatMapGroupsWithState that the 2.4-era
  * reference has no counterpart for.
  */
class RunningTotalProcessor
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    val prev = if (total.exists()) total.get() else 0L
    val add = rows.map(_._2).sum
    total.update(prev + add)
    Iterator((key, add, prev + add))
  }
}

class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState keeps typed per-key state across micro-batches") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      val out = input.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningTotalProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF("k", "add", "total")
        .writeStream.format("memory").queryName("tws_sink")
        .outputMode("update").start()
      try {
        input.addData(("a", 1L), ("b", 2L))
        q.processAllAvailable()
        input.addData(("a", 10L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_sink")
        .as[(String, Long, Long)].collect().toSet
      // batch 1 emits fresh totals; batch 2's "a" accumulates state
      assert(rows == Set(("a", 1L, 1L), ("b", 2L, 2L), ("a", 10L, 11L)))
    } finally {
      saved match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
