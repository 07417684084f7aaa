package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators matching SURVEY.md §2.11: watermarked
  * windowed aggregation, streaming dedup, arbitrary-state
  * sessionization (flatMapGroupsWithState — `GroupState.scala:196`,
  * `FlatMapGroupsWithStateExec.scala:44` in the reference), and
  * stream-stream joins (`StreamingSymmetricHashJoinExec.scala:126`).
  *
  * Each helper takes/returns streaming Datasets so callers compose them
  * with `readStream`/`writeStream`; the specs drive them with
  * MemoryStream + processAllAvailable for deterministic micro-batches.
  * State scale: everything keys by user/window so state partitions by
  * groupBy key; watermarks bound state growth exactly as the
  * reference's `WatermarkTracker` (min-policy) does.
  */
/** Event row shape used by the streaming specs (events table twin). */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

case class SessionOut(user_id: Long, session_start: Long, n_events: Int,
    total_value: Double)

case class SessionState(start: Long, last: Long, n: Int, total: Double)

case class AnomalyOut(user_id: Long, event_id: Long, cents: Long,
    dev_sq: Long, bound: Long)

case class EwmaOut(user_id: Long, event_id: Long, cents: Long, ewma: Long)

case class BucketState(tokens: Long, last: Long)

case class HoltState(level: Long, trend: Long)

case class HoltOut(user_id: Long, event_id: Long, cents: Long,
    level: Long, trend: Long, forecast1: Long)

case class AdmitOut(user_id: Long, event_id: Long, admitted: Boolean,
    tokens_after: Long)

case class DocTokens(doc_id: Long, source: String, n_tok: Long)

case class BudgetTake(doc_id: Long, source: String, n_tok: Long,
    cum_tokens: Long)

/** Per-key running total via the Spark-4 `transformWithState` API
  * (StatefulProcessor + typed ValueState over the RocksDB state
  * store) — the successor of flatMapGroupsWithState that the 2.4-era
  * reference has no counterpart for.  Emits (key, batchAdd,
  * runningTotal) per key per micro-batch; with non-negative adds the
  * running total is monotone, so `max(total)` per key is the final
  * state regardless of how rows were split across batches.
  */
class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long), (String, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    val prev = if (total.exists()) total.get() else 0L
    val add = rows.map(_._2).sum
    total.update(prev + add)
    Iterator((key, add, prev + add))
  }
}

/** Per-user typed-state profile via ListState + MapState: the list
  * logs recent event ids (cleared past `logCap` — the bounded-session-
  * log pattern), the map counts events per type.  Emits
  * (user, distinct_types, total_events) per batch; both outputs are
  * MONOTONE under non-negative adds, so max() per key is the final
  * state however a replay splits rows across micro-batches — the same
  * parity contract as [[RunningTotalProcessor]].
  */
class TypedProfileProcessor(logCap: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, TimeMode, TimerValues, TTLConfig}
  @transient private var log: ListState[Long] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    log = getHandle.getListState[Long]("log",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    rows.foreach { case (_, typ, id) =>
      log.appendValue(id)
      val prev = if (counts.containsKey(typ)) counts.getValue(typ) else 0L
      counts.updateValue(typ, prev + 1)
    }
    var n = 0L
    val it = log.get()
    while (it.hasNext) { it.next(); n += 1 }
    if (n > logCap) log.clear()
    var types = 0L
    var total = 0L
    val kit = counts.iterator()
    while (kit.hasNext) { types += 1; total += kit.next()._2 }
    Iterator((key, types, total))
  }
}

object Streaming {

  /** Watermarked tumbling-window aggregate (append mode compatible). */
  def windowedCounts(events: Dataset[Event], watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total"))

  /** Streaming dedup on event_id with watermark-bounded state
    * (StreamingDeduplicateExec in the reference, `statefulOperators
    * .scala:428`).
    */
  def dedupped(events: Dataset[Event], watermark: String = "10 minutes"): Dataset[Event] =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id", "ts")

  /** Session windows via flatMapGroupsWithState with event-time timeout:
    * emits a session when `gapSeconds` of event-time silence passes the
    * watermark.  This is the §2.11 "arbitrary state" capability — the
    * only way to sessionize in the reference (no session_window in 2.4).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, s.start, s.n, s.total)).toSeq
            state.remove()
            out.iterator
          } else {
            // events within a micro-batch are not ordered: sort this chunk
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last <= gapSeconds =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming token-budget intake — the arrival-order twin of
    * [[graft.ops.PipelineOps.tokenBudgetMixture]]: documents stream
    * in, each domain greedily admits them while the tokens consumed
    * BEFORE a document stay under the domain's budget (the straddling
    * document is admitted; afterwards the domain is closed).  State is
    * ONE long per domain (the running token total) — the mixture
    * assembles incrementally with no reprocessing, the way an
    * ingestion front-end actually fills a training mix.
    *
    * Within a micro-batch a domain's documents are admitted in doc_id
    * order; fed id-ordered batches the admitted set equals the batch
    * greedy prefix in doc_id order — the parity the gate asserts.
    * Domains without a budget admit nothing.
    */
  def budgetTake(docs: Dataset[DocTokens],
      budgets: Map[String, Long]): Dataset[BudgetTake] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, BudgetTake](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dom: String, rows: Iterator[DocTokens], state: GroupState[Long]) =>
          budgets.get(dom) match {
            case None => Iterator.empty
            case Some(budget) =>
              var cum = state.getOption.getOrElse(0L)
              val out = Vector.newBuilder[BudgetTake]
              rows.toSeq.sortBy(_.doc_id).foreach { d =>
                if (cum < budget) {
                  cum += d.n_tok
                  out += BudgetTake(d.doc_id, dom, d.n_tok, cum)
                }
              }
              state.update(cum)
              out.result().iterator
          }
      }
  }

  /** Streaming twin of [[graft.ops.TimeSeries.rollingAnomalies]]: the
    * same integer-exact trailing-window z-score test, with the window
    * carried per key in GroupState — at most `n` longs per key, so
    * state is bounded without any watermark.  Micro-batch rows for a
    * key are sorted by (ts, event_id) before folding; fed time-ordered
    * batches (ordered replay / an in-order source), the flag stream is
    * IDENTICAL to the batch operator's output — the parity the gate
    * asserts.
    */
  def rollingAnomalies(events: Dataset[Event], n: Int,
      z: Int): Dataset[AnomalyOut] = {
    require(n >= 2 && z >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Seq[Long]]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var win = state.getOption.getOrElse(Seq.empty[Long])
          val out = Seq.newBuilder[AnomalyOut]
          sorted.foreach { e =>
            // HALF_UP (half away from zero), matching Spark's round()
            // in the batch twin and the DuckDB oracle — math.round is
            // floor(x+0.5), which differs at negative exact halves
            val c = BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            if (win.size == n) {
              val s1 = win.sum
              val s2 = win.iterator.map(x => x * x).sum
              val dev = (c * n - s1) * (c * n - s1)
              val bound = z.toLong * z * (s2 * n - s1 * s1)
              if (dev > bound) out += AnomalyOut(userId, e.event_id, c, dev, bound)
            }
            win = (win :+ c).takeRight(n)
          }
          state.update(win)
          out.result().iterator
      }
  }

  /** Per-key integer fixed-point EWMA trace — the live rate/level
    * monitor (α = 1/8): `e_t = (7·e_{t−1} + x_t) >> 3`, seeded
    * `e_0 = x_0`, over integer cents.  The arithmetic right shift IS
    * floor division by 8 in two's complement — well-defined on
    * negatives where truncating and floored integer division diverge;
    * the DuckDB twin replays negatives with the sign-split floored
    * form `-((-x + 7) // 8)` (DuckDB's integer `//` TRUNCATES toward
    * zero, measured, not floored), so the whole trace is bit-exact
    * cross-engine with ONE long of state per key.  Order-sensitive by
    * nature: feed it an ordered replay; within each batch rows sort
    * by (ts, event_id).
    */
  def ewmaTrace(events: Dataset[Event]): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var prev: Option[Long] = state.getOption
          val out = Seq.newBuilder[EwmaOut]
          sorted.foreach { e =>
            val c = BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val ew = prev match {
              case None => c
              case Some(p) => (7 * p + c) >> 3
            }
            out += EwmaOut(userId, e.event_id, c, ew)
            prev = Some(ew)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Per-key Holt double-exponential smoothing — [[ewmaTrace]]'s
    * level-plus-TREND sibling (a level-only monitor lags a steady
    * ramp forever; Holt's trend term closes that gap), α = β = 1/8
    * fixed point:
    *
    *   ℓ_t = (x_t + 7·(ℓ_{t−1} + b_{t−1})) >> 3
    *   b_t = (7·b_{t−1} + (ℓ_t − ℓ_{t−1})) >> 3
    *
    * seeded ℓ_1 = x_1, b_1 = 0; `forecast1 = ℓ + b` is the one-step
    * prediction.  Arithmetic shifts are floored divisions — the
    * DuckDB twin replays negatives with the sign-split floored form
    * (its integer `//` truncates), so the full trace replays bit-
    * exact as a recursive CTE.  Two longs of state per key;
    * order-sensitive over ordered replay.
    */
  def holtTrace(events: Dataset[Event]): Dataset[HoltOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[HoltState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[HoltOut]
          sorted.foreach { e =>
            val c = BigDecimal(e.value * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            st =
              if (st == null) HoltState(c, 0L)
              else {
                val l = (c + 7 * (st.level + st.trend)) >> 3
                HoltState(l, (7 * st.trend + (l - st.level)) >> 3)
              }
            out += HoltOut(userId, e.event_id, c, st.level, st.trend,
              st.level + st.trend)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Per-key token-bucket admission — the ingestion rate limiter (a
    * burst of events from one key must not flood the pipeline): a
    * bucket of `cap` tokens per key starts FULL at first sight,
    * refills one token per `refillSecs` of event time, and each event
    * costs one token; events finding an empty bucket are refused (and
    * reported — rows never vanish).  Fractional refill progress is
    * never lost: `last` advances only by CONSUMED whole periods
    * (`last += (Δ div refillSecs)·refillSecs`), the classic
    * quantization-drift fix.
    *
    * All integer arithmetic on floor-epoch seconds (non-negative
    * divisions — floored and truncating agree), two longs of state
    * per key, order-sensitive over ordered replay; within each batch
    * rows sort by (ts, event_id).
    */
  def tokenBucket(events: Dataset[Event], cap: Long,
      refillSecs: Long): Dataset[AdmitOut] = {
    require(cap >= 1 && refillSecs >= 1,
      s"cap and refillSecs must be >= 1, got $cap / $refillSecs")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, AdmitOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[BucketState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AdmitOut]
          sorted.foreach { e =>
            val sec = Math.floorDiv(e.ts.getTime, 1000L)
            val (avail, newLast) =
              if (st == null) (cap, sec)
              else {
                // clamp before dividing: a (theoretically impossible
                // under ordered replay) backwards step must refill 0,
                // not diverge between truncating and floored division
                val periods = math.max(0L, sec - st.last) / refillSecs
                (math.min(cap, st.tokens + periods),
                  st.last + periods * refillSecs)
              }
            val admitted = avail >= 1L
            val after = if (admitted) avail - 1L else avail
            out += AdmitOut(userId, e.event_id, admitted, after)
            st = BucketState(after, newLast)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Stream-stream inner join on user_id within a ±1 hour event-time
    * band (symmetric hash join with watermark-bounded buffers).
    */
  def streamStreamJoin(left: Dataset[Event], right: Dataset[Event]): DataFrame = {
    val l = left.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
      col("r_ts") >= col("l_ts") - expr("INTERVAL 1 HOUR") &&
      col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Stream-stream LEFT OUTER join on the same ±1 hour band: matched
    * rows emit immediately; an unmatched left row is held in state and
    * emitted NULL-padded only once the watermark proves no right-side
    * match can still arrive (reference `StreamingSymmetricHashJoinExec`
    * outer-row eviction).  State stays bounded by the same watermark
    * that drives the eviction.
    */
  def streamStreamLeftJoin(left: Dataset[Event], right: Dataset[Event]): DataFrame =
    bandJoin(left, right, "left_outer")

  /** Stream-stream FULL OUTER join: unmatched rows of BOTH sides are
    * held in state and null-padded out when the watermark proves their
    * band can no longer match (the most state-demanding join mode —
    * both sides evict on the same watermark).
    */
  def streamStreamFullJoin(left: Dataset[Event], right: Dataset[Event]): DataFrame =
    bandJoin(left, right, "full_outer")

  private def bandJoin(left: Dataset[Event], right: Dataset[Event],
      joinType: String): DataFrame = {
    val l = left.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
      col("r_ts") >= col("l_ts") - expr("INTERVAL 1 HOUR") &&
      col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
  }

  /** Exactly-once adapter for a `foreachBatch` side effect.
    *
    * `foreachBatch` is AT-LEAST-ONCE by contract: after a crash
    * between the user function and the micro-batch commit (WAL
    * `commits/N` is written after `addBatch` returns), the restart
    * re-delivers the SAME batchId with the same data
    * (`MicroBatchExecution` replays the offsets-log entry that has no
    * matching commit).  Exactly-once therefore lives in the sink:
    * skip batch ids whose side effect fully landed, and make the
    * side effect idempotent per batch id for the crash window between
    * the effect and its marker.
    *
    * This adapter implements both halves: `markerDir/batch-N` is
    * written AFTER `body` succeeds, so
    *  - a re-delivered batch whose marker exists is skipped entirely
    *    (the commit-torn case — effect landed, commit record did not);
    *  - a re-delivered batch whose marker is absent re-applies `body`,
    *    which must be per-batch idempotent (e.g. an overwrite into a
    *    batch-id-keyed location, or a MERGE keyed on batch id) — the
    *    effect-torn case.
    * Markers live on the sink's filesystem (HDFS/S3-compatible via the
    * Hadoop FS API), one zero-byte file per committed batch.
    */
  def exactlyOnceBatch(markerDir: String)(body: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit = { (batch: DataFrame, batchId: Long) =>
    // Resolve the filesystem from the MARKER PATH's own scheme, not the
    // default FS: with s3a:// markers over an hdfs:// default,
    // FileSystem.get(conf) would throw "Wrong FS" (or worse, probe the
    // wrong store and break the exactly-once skip).
    val markerRoot = new org.apache.hadoop.fs.Path(markerDir)
    val fs = markerRoot.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      markerRoot, f"batch-$batchId%020d")
    if (!fs.exists(marker)) {
      body(batch, batchId)
      fs.mkdirs(markerRoot)
      fs.create(marker, true).close()
    }
  }

  /** Dedup with WATERMARK-SCOPED state (`dropDuplicatesWithinWatermark`):
    * a key's dedup state is dropped once the watermark passes its event
    * time + delay, so re-deliveries beyond the lateness horizon are
    * treated as NEW events.  This is the 100 TB-viable dedup — plain
    * `dropDuplicates` on a stream keys state forever and OOMs; this
    * holds only one watermark-window of keys.
    */
  def dedupWithinWatermark(events: Dataset[Event]): DataFrame =
    events.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
}
