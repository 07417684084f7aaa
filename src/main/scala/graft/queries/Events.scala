package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event/time-series battery over the `events` table: tumbling/sliding
  * time windows (the batch twin of §2.11's streaming TimeWindow —
  * `expressions/TimeWindow.scala:30` + `TimeWindowing` rule,
  * `Analyzer.scala:2732`), sessionization via lag/gap analysis, and
  * JSON property extraction.  Window starts are emitted as strings so
  * the driver's pandas compare never sees tz-aware vs naive timestamps.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour window aggregate (TimeWindow rewrite).
    "q_ev_tumbling" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("total"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("h"), col("event_type"))
    },

    // Sliding windows: 1h window every 30m — each event lands in 2 windows.
    "q_ev_sliding" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("n"))
        .orderBy(col("ws"))
    },

    // Sessionization: 30-minute inactivity gap per user via lag() —
    // the batch formulation of session windows (§2.11: absent in Spark
    // 2.4, achievable via state; here expressed relationally).
    "q_ev_sessionize" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          max(col("duration_s")).as("max_duration_s"))
        .orderBy(col("user_id"))
    },

    // Native session windows (Spark 3.2+ — a capability SUPERSET over
    // the reference, which could only sessionize via arbitrary state;
    // SURVEY.md §2.11 "Session windows: absent in 2.4").
    "q_session_window" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n"), col("total"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Top event per user-hour: dedup to latest event via row_number.
    "q_ev_latest_per_user" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },

    // Event-type transition counts (lag over event stream per user).
    "q_ev_transitions" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev_type"), col("event_type"))
    })

  val oracle: Map[String, String] = Map(
    "q_ev_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS h,
        |  event_type, count(*) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "q_ev_sliding" ->
      """WITH shifted AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS t FROM events),
        |wins AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', t) - INTERVAL 30 MINUTE AS ws FROM shifted
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', t) AS ws FROM shifted)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, count(*) AS n
        |FROM wins GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ev_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |    max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) - min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS duration_s
        |  FROM sessions GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  max(duration_s) AS max_duration_s
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_session_window" ->
      """WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |      OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        |s AS (SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM t)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_ev_latest_per_user" ->
      """SELECT user_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_ev_transitions" ->
      """SELECT prev_type, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type ORDER BY prev_type, event_type""".stripMargin)
}
