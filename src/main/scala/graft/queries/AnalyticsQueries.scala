package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{GraphOps, TimeSeries}

/** Advanced-analytics gate battery:
  *
  *  - calendar gap-fill with carry-forward                 q_gap_fill
  *  - fixed-iteration integer-exact weighted PageRank      q_pagerank
  *
  * Both operators do exact integer arithmetic end-to-end, so the DuckDB
  * twins (window LOCF / unrolled iterations) must match bit-for-bit.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Per-user daily purchase totals on a dense 30-day grid; silent
    // days carry the last observed total (0 before first purchase).
    // User slice is a MODULAR class, not a prefix: the alt-corpus fire
    // drill remaps user ids affinely, and `< 12` went empty at seed
    // 4242 (round 14) — a mod-class survives any affine remap.
    "q_gap_fill" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("user_id") % 20 === 3)
      TimeSeries.gapFillDaily(ev, "user_id", "ts", "value",
          "2024-01-01", "2024-01-30")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_str"),
          col("cents"), col("observed"))
        .orderBy(col("user_id"), col("day_str"))
    },

    // Nation-level trade-graph PageRank: edge (customer nation →
    // supplier nation) weighted by lineitem count, 3 iterations.
    "q_pagerank" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val edges = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      GraphOps.pageRank(edges, iterations = 3)
        .select(col("node").cast("int").as("node"), col("rank_micro"))
        .orderBy("node")
    })

  val oracle: Map[String, String] = Map(
    "q_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' AND user_id % 20 = 3),
        |daily AS (
        |  SELECT user_id, day, CAST(sum(v) AS BIGINT) AS day_cents
        |  FROM ev
        |  WHERE day BETWEEN DATE '2024-01-01' AND DATE '2024-01-30'
        |  GROUP BY user_id, day),
        |grid AS (
        |  SELECT k.user_id, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM ev) k
        |  CROSS JOIN (SELECT unnest(generate_series(DATE '2024-01-01',
        |    DATE '2024-01-30', INTERVAL 1 DAY)) AS day) d)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day_str,
        |  coalesce(last_value(day_cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cents,
        |  day_cents IS NOT NULL AS observed
        |FROM grid g LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day_str""".stripMargin,

    "q_pagerank" ->
      """WITH edges AS (
        |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY c_nationkey, s_nationkey),
        |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM edges UNION SELECT dst FROM edges) u),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
        |c1 AS (SELECT dst, CAST(sum(CAST(floor(rank_micro * w / w_out) AS BIGINT)) AS BIGINT) AS im
        |  FROM edges JOIN outw USING (src) JOIN r0 ON r0.node = edges.src GROUP BY dst),
        |r1 AS (SELECT node, CAST(150000 + floor(coalesce(im, 0) * 85 / 100) AS BIGINT) AS rank_micro
        |  FROM nodes LEFT JOIN c1 ON c1.dst = node),
        |c2 AS (SELECT dst, CAST(sum(CAST(floor(rank_micro * w / w_out) AS BIGINT)) AS BIGINT) AS im
        |  FROM edges JOIN outw USING (src) JOIN r1 ON r1.node = edges.src GROUP BY dst),
        |r2 AS (SELECT node, CAST(150000 + floor(coalesce(im, 0) * 85 / 100) AS BIGINT) AS rank_micro
        |  FROM nodes LEFT JOIN c2 ON c2.dst = node),
        |c3 AS (SELECT dst, CAST(sum(CAST(floor(rank_micro * w / w_out) AS BIGINT)) AS BIGINT) AS im
        |  FROM edges JOIN outw USING (src) JOIN r2 ON r2.node = edges.src GROUP BY dst),
        |r3 AS (SELECT node, CAST(150000 + floor(coalesce(im, 0) * 85 / 100) AS BIGINT) AS rank_micro
        |  FROM nodes LEFT JOIN c3 ON c3.dst = node)
        |SELECT CAST(node AS INT) AS node, rank_micro FROM r3 ORDER BY node""".stripMargin)
}
