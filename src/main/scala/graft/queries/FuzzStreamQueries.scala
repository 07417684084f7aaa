package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Streaming replay-chunking fuzz: the fixed streaming gates replay at
  * ONE split (2 time-chunks, maxFilesPerTrigger=1), but the corners
  * where watermark/state semantics actually break are the replay
  * boundaries — a late row landing exactly on a chunk edge, a batch
  * serving two chunks at once, state carried across 4 boundaries
  * instead of 1.  Each slot here re-runs a stateful shape under a
  * SEEDED random chunking (the seed is recorded in the gate name) and
  * must still equal the batch oracle exactly.
  *
  * Two shapes:
  *  - `w` (watermarked tumbling aggregation): time-split into 3–5
  *    chunks at seeded random boundaries, then a seeded subset of rows
  *    is DISPLACED one chunk later — genuine late arrivals crossing
  *    chunk edges.  The watermark delay covers the full replay span,
  *    so Spark must MERGE every late row into its window state (an
  *    eager eviction or a missed merge breaks the hash); a far-future
  *    flush row then pushes the watermark past every real window so
  *    append mode emits them all.  Window starts are compared as epoch
  *    seconds (integer bucket edges, so flooring the oracle's epoch
  *    never crosses a boundary).
  *  - `d` (streaming dedup): dropDuplicates state across 2–5 seeded
  *    hash-split chunks and a seeded maxFilesPerTrigger — the emitted
  *    key set must equal batch DISTINCT regardless of which batch
  *    first saw a key.
  *
  * Scale shape: identical to the fixed streaming gates — the replay is
  * file-based (distributed write, nothing driver-resident), state is
  * per-key/per-window only, and the flush device adds one row.
  */
object FuzzStreamQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  private val aggSeeds: Seq[Long] = Seq(301L, 302L, 303L)
  private val dedupSeeds: Seq[Long] = Seq(311L, 312L)
  private val sessSeeds: Seq[Long] = Seq(321L, 322L)

  /** Watermarked tumbling-window aggregation under seeded chunking with
    * displaced (late) rows.  Returns (gate fn, oracle SQL).
    */
  private def aggGate(seed: Long): (Q, String) = {
    val r = new FuzzQueries.Rng(0xD1FF00D5L * seed)
    val um = r.next(4) + 2        // user-filter modulus
    val ur = r.next(um)           // user-filter residue
    val w = Seq(1800, 3600, 7200)(r.next(3)) // window seconds
    val nChunks = r.next(3) + 3   // 3..5 time chunks
    val fracs = Seq.fill(nChunks - 1)(r.next(98) + 1).sorted // % points
    val sp = r.next(3) + 3        // 1-in-sp rows displaced one chunk late
    val mft = r.next(2) + 1       // files per micro-batch
    val q: Q = (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(pmod(col("user_id"), lit(um)) === ur)
        .select(col("event_id"), col("ts"), col("event_type"),
          col("value").cast("decimal(12,2)").as("v"))
      val b = ev.agg(min(col("ts").cast("long")).as("lo"),
        max(col("ts").cast("long")).as("hi")).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val span = hi - lo + 1
      val bounds = fracs.map(f => lo + span * f / 100)
      val baseIdx = bounds.foldLeft(lit(0)) { (acc, bd) =>
        acc + when(col("ts").cast("long") > bd, 1).otherwise(0)
      }
      val displaced = pmod(col("event_id") * 2654435761L, lit(sp)) === 0
      val idx = least(
        when(displaced, baseIdx + 1).otherwise(baseIdx), lit(nChunks - 1))
      val tagged = ev.withColumn("__c", idx)
      // delay covers the whole replay span: displaced rows are LATE but
      // must never be DROPPED, so a state-merge bug is the only way the
      // stream can diverge from the batch oracle
      val delaySec = span + 7200
      val flushTs = new java.sql.Timestamp(
        (hi + delaySec + 2L * w + 7200) * 1000L)
      val flush = ev.limit(1).select(lit(-1L).as("event_id"),
        lit(flushTs).as("ts"), lit("zzz_flush").as("event_type"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(12,2)").as("v"))
      val chunks = (0 until nChunks)
        .map(i => tagged.filter(col("__c") === i).drop("__c")) :+ flush
      val stream = StreamingQueries.orderedReplay(s, chunks, mft)
      val name = s"fuzzst_w_${runId.incrementAndGet()}"
      val agg = stream
        .withWatermark("ts", s"$delaySec seconds")
        .groupBy(window(col("ts"), s"$w seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      StreamingQueries.withStatePartitions(s) {
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).filter(col("event_type") =!= "zzz_flush")
        .select(col("window.start").cast("long").as("ws"),
          col("event_type"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy(col("ws"), col("event_type"))
    }
    val oracle =
      s"""SELECT (CAST(floor(EXTRACT(EPOCH FROM ts)) AS BIGINT) // $w) * $w AS ws,
         |  event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
         |FROM events
         |WHERE user_id % $um = $ur
         |GROUP BY 1, 2
         |ORDER BY ws, event_type""".stripMargin
    (q, oracle)
  }

  /** Streaming dedup under seeded hash chunking.  Returns (gate fn,
    * oracle SQL).
    */
  private def dedupGate(seed: Long): (Q, String) = {
    val r = new FuzzQueries.Rng(0xD1FF00D5L * seed)
    val um = r.next(4) + 2
    val ur = r.next(um)
    val keys = if (r.next(2) == 0) Seq("user_id")
               else Seq("user_id", "event_type")
    val nChunks = r.next(4) + 2   // 2..5 hash chunks
    val mft = r.next(2) + 1
    val salt = r.next(997) + 7
    val q: Q = (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(pmod(col("user_id"), lit(um)) === ur)
        .select(col("event_id") +: keys.map(col): _*)
      val idx = pmod(col("event_id") * lit(salt.toLong), lit(nChunks))
      val tagged = ev.withColumn("__c", idx)
      val chunks = (0 until nChunks)
        .map(i => tagged.filter(col("__c") === i).drop("__c"))
      val stream = StreamingQueries.orderedReplay(s, chunks, mft)
      val name = s"fuzzst_d_${runId.incrementAndGet()}"
      val deduped = stream.dropDuplicates(keys)
      StreamingQueries.withStatePartitions(s) {
        val q = deduped.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).select(keys.map(col): _*)
        .orderBy(keys.map(col): _*)
    }
    val oracle =
      s"""SELECT DISTINCT ${keys.mkString(", ")}
         |FROM events WHERE user_id % $um = $ur
         |ORDER BY ${keys.mkString(", ")}""".stripMargin
    (q, oracle)
  }

  /** Gap-sessionization (flatMapGroupsWithState — the ORDER-SENSITIVE
    * stateful class) under seeded time-chunking: sessions spanning a
    * RANDOM cut point only come out right if GroupState carried them
    * across the boundary; a per-user far-future flush closes every
    * real session for append mode (the q_stream_sessionize device,
    * boundaries and gap seeded instead of fixed).  Returns (gate fn,
    * oracle SQL — the batch lag/prefix-sum sessionization replay).
    */
  private def sessionGate(seed: Long): (Q, String) = {
    val r = new FuzzQueries.Rng(0xD1FF00D5L * seed)
    val um = r.next(4) + 4        // user-filter modulus 4..7
    val ur = r.next(um)
    val gap = Seq(900, 1800, 3600)(r.next(3))
    val nChunks = r.next(3) + 3   // 3..5 time chunks
    val fracs = Seq.fill(nChunks - 1)(r.next(98) + 1).sorted
    val mft = r.next(2) + 1
    val q: Q = (s, dir) => {
      val s2 = s
      import s2.implicits._
      val ev = Tables.load(s, dir, "events")
        .filter(pmod(col("user_id"), lit(um)) === ur)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val b = ev.agg(min(col("ts").cast("long")).as("lo"),
        max(col("ts").cast("long")).as("hi")).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val span = hi - lo + 1
      val bounds = fracs.map(f => lo + span * f / 100)
      val flushTs = new java.sql.Timestamp((hi + 86400L) * 1000L)
      val flush = ev.select(col("user_id")).distinct()
        .select((col("user_id") + lit(1000000000L)).as("event_id"),
          lit(flushTs).as("ts"), col("user_id"),
          lit("flush").as("event_type"), lit(0.0).as("value"))
      val edges = (Long.MinValue +: bounds) :+ Long.MaxValue
      val chunks = edges.toList.sliding(2).collect { case List(a, z) =>
        ev.filter(col("ts").cast("long") > a && col("ts").cast("long") <= z)
      }.toSeq :+ flush
      val stream = StreamingQueries.orderedReplay(s, chunks, mft)
      val name = s"fuzzst_s_${runId.incrementAndGet()}"
      val sessions = graft.streaming.Streaming.sessionize(
        stream.as[graft.streaming.Event], gapSeconds = gap,
        watermark = "10 minutes")
      StreamingQueries.withStatePartitions(s) {
        val q = sessions.toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name)
        .select(col("user_id"), col("session_start"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }
    val oracle =
      s"""WITH e AS (
         |  SELECT user_id, ts, event_id FROM events WHERE user_id % $um = $ur),
         |marked AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |      OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
         |         - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT) > $gap
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT user_id,
         |  CAST(min(floor(epoch(CAST(ts AS TIMESTAMP)))) AS BIGINT) AS session_start,
         |  count(*) AS n_events
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin
    (q, oracle)
  }

  private val built: Map[String, (Q, String)] =
    aggSeeds.map(s => s"q_fuzzst_w$s" -> aggGate(s)).toMap ++
      dedupSeeds.map(s => s"q_fuzzst_d$s" -> dedupGate(s)).toMap ++
      sessSeeds.map(s => s"q_fuzzst_s$s" -> sessionGate(s)).toMap

  val queries: Map[String, Q] = built.map { case (n, (q, _)) => n -> q }
  val oracle: Map[String, String] = built.map { case (n, (_, o)) => n -> o }
}
