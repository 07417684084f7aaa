package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.AsOfJoin

/** As-of join surfaced through the driver contract, oracle-checked
  * against DuckDB's native ASOF JOIN: for every 'click' event, the most
  * recent 'purchase' by the same user at-or-before the click.
  */
object AsOfQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("purchase_value"),
          col("event_id").as("purchase_event"))
      AsOfJoin.asOf(clicks, purchases, "user_id", "ts",
          Seq("purchase_value", "purchase_event"))
        .select(col("user_id"), col("event_id"), col("value"),
          col("purchase_value"), col("purchase_event"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Forward direction: the NEXT purchase at-or-after each click —
    // same single-shuffle window formulation scanned in reverse time;
    // DuckDB mirrors it with ASOF ... ON l.t <= r.t.
    "q_asof_forward" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("value").as("purchase_value"),
          col("event_id").as("purchase_event"))
      AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts",
          Seq("purchase_value", "purchase_event"))
        .select(col("user_id"), col("event_id"), col("value"),
          col("purchase_value"), col("purchase_event"))
        .orderBy(col("user_id"), col("event_id"))
    })

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT l.user_id, l.event_id, l.value,
        |  r.value AS purchase_value, r.event_id AS purchase_event
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, value
        |      FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN
        |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, value
        |      FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.t >= r.t
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "q_asof_forward" ->
      """SELECT l.user_id, l.event_id, l.value,
        |  r.value AS purchase_value, r.event_id AS purchase_event
        |FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, value
        |      FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN
        |     (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, value
        |      FROM events WHERE event_type = 'purchase') r
        |ON l.user_id = r.user_id AND l.t <= r.t
        |ORDER BY l.user_id, l.event_id""".stripMargin)
}
