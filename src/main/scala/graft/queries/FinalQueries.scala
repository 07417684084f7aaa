package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 stragglers: NATURAL JOIN, the typed `reduceGroups` path, and the
  * string/NaN function tail (levenshtein / translate / repeat / nanvl).
  */
object FinalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // NATURAL JOIN resolves on the shared column name (k).
    "q_natural_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT k, n_name, r_name FROM
          |  (SELECT n_regionkey AS k, n_name FROM nation) a
          |NATURAL JOIN
          |  (SELECT r_regionkey AS k, r_name FROM region) b
          |ORDER BY k, n_name""".stripMargin)
    },

    // KeyValueGroupedDataset.reduceGroups — the typed reduction path
    // (plans as partial+final ObjectHashAggregate like any agg).
    // Integer cents keep the reduction associative-commutative-exact
    // under any partitioning/merge order.
    "q_reduce_groups" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, a._2 + b._2))
        .map { case (st, (_, cents)) => (st, cents) }
        .toDF("st", "cents_sum")
        .orderBy(col("st"))
    },

    // String-function tail + NaN handling.
    "q_fn_string_extra" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_nationkey,
          |  levenshtein(n_name, 'FRANCE') AS lev,
          |  translate(n_name, 'AEIOU', 'aeiou') AS tr,
          |  repeat(substr(n_name, 1, 2), 2) AS rep,
          |  nanvl(CASE WHEN n_nationkey % 2 = 0 THEN CAST('nan' AS DOUBLE)
          |        ELSE CAST(n_nationkey AS DOUBLE) END, -1.0D) AS nn
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_natural_join" ->
      """SELECT k, n_name, r_name FROM
        |  (SELECT n_regionkey AS k, n_name FROM nation) a
        |NATURAL JOIN
        |  (SELECT r_regionkey AS k, r_name FROM region) b
        |ORDER BY k, n_name""".stripMargin,
    "q_reduce_groups" ->
      """SELECT o_orderstatus AS st,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    "q_fn_string_extra" ->
      """SELECT n_nationkey,
        |  levenshtein(n_name, 'FRANCE') AS lev,
        |  translate(n_name, 'AEIOU', 'aeiou') AS tr,
        |  repeat(substr(n_name, 1, 2), 2) AS rep,
        |  CASE WHEN n_nationkey % 2 = 0 THEN -1.0
        |       ELSE CAST(n_nationkey AS DOUBLE) END AS nn
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
