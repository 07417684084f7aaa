package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Upsert

/** MERGE/upsert semantics, time-interval RANGE windows, modern
  * aggregate functions, and bucketed no-shuffle joins — through the
  * oracle gate.
  */
object MergeQueries {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicInteger(0)

  val queries: Map[String, Q] = Map(
    // SCD-1 upsert: updates override matched keys (including the
    // doubled price), unmatched base rows persist.
    "q_upsert" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").as("p"))
      val base = ord.filter(col("k") % 2 === 0)
      val updates = ord.filter(col("k") % 4 === 0)
        .select(col("k"), lit("U").as("st"), (col("p") * 2).as("p"))
      Upsert(base, updates, Seq("k"))
        .groupBy(col("st"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("p") * 100).cast("long")).as("cents_sum"))
        .orderBy(col("st"))
    },

    // RANGE frame over event time: rolling 1-hour count + cents per
    // user (frame bounded by VALUE, not row count).
    "q_window_time_range" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT user_id, CAST(ts AS LONG) AS t,
          |  count(*) OVER w AS n_1h,
          |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
          |FROM events WHERE user_id % 25 = 0
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, t""".stripMargin)
    },

    // Modern aggregate surface: count_if, bool_and/bool_or, median.
    "q_agg_modern" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT event_type,
          |  count_if(value > 100) AS n_big,
          |  bool_and(value >= 0) AS all_nonneg,
          |  bool_or(value > 400) AS some_huge,
          |  round(median(CAST(floor(value) AS BIGINT)), 6) AS med_floor
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    },

    // Bucketed tables joined WITHOUT a shuffle: both sides written
    // bucketed+sorted by the join key, so the sort-merge join reads
    // co-located buckets directly (no Exchange — asserted in PlanSpec;
    // here the VALUES go through the oracle).
    "q_bucketed_join" -> { (s, dir) =>
      val id = runId.incrementAndGet()
      // drop the PREVIOUS run's tables (this run's lazy result still
      // needs its own) so repeated Bench/Verify runs don't accumulate
      // catalog entries; files live under TmpCleanup-managed dirs.
      s.sql(s"DROP TABLE IF EXISTS g_bk_orders_${id - 1}")
      s.sql(s"DROP TABLE IF EXISTS g_bk_lineitem_${id - 1}")
      val tmp = graft.TmpCleanup.tempDir("graft_bucket")
      val ot = s"g_bk_orders_$id"
      val lt = s"g_bk_lineitem_$id"
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/o").saveAsTable(ot)
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/l").saveAsTable(lt)
      s.table(ot).join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty_sum"))
        .orderBy(col("o_orderpriority"))
    })

  val oracle: Map[String, String] = Map(
    "q_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |upd AS (
        |  SELECT o_orderkey AS k, 'U' AS st, o_totalprice * 2 AS p
        |  FROM orders WHERE o_orderkey % 4 = 0),
        |m AS (
        |  SELECT coalesce(u.k, b.k) AS k,
        |    CASE WHEN u.k IS NOT NULL THEN u.st ELSE b.st END AS st,
        |    CASE WHEN u.k IS NOT NULL THEN u.p ELSE b.p END AS p
        |  FROM base b FULL OUTER JOIN upd u ON b.k = u.k)
        |SELECT st, count(*) AS n,
        |  CAST(sum(CAST(floor(p * 100) AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM m GROUP BY st ORDER BY st""".stripMargin,
    "q_window_time_range" ->
      """SELECT user_id, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM events WHERE user_id % 25 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t""".stripMargin,
    "q_agg_modern" ->
      """SELECT event_type,
        |  count(*) FILTER (WHERE value > 100) AS n_big,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(value > 400) AS some_huge,
        |  round(median(CAST(floor(value) AS BIGINT)), 6) AS med_floor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
