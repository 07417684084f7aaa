package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spark-4-era SQL/Dataset surface the reference (a 2.4 fork) never
  * had — part of the "a reference user could switch and keep going,
  * then get more" story: VARIANT semi-structured values, GROUP BY ALL
  * / ORDER BY ALL, correlated LATERAL subqueries with per-row top-k,
  * and the native `Dataset.unpivot` API (reference only has the stack
  * generator, `generators.scala:137`).
  */
object ModernSql {
  type Q = (SparkSession, String) => DataFrame

  private def sql(q: String): Q = { (s, dir) =>
    graft.Tables.registerAll(s, dir)
    s.sql(q)
  }

  val queries: Map[String, Q] = Map(
    // VARIANT: parse the JSON props payload once, extract typed fields.
    "q_variant" -> sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS k_sum,
        |  CAST(min(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS k_min,
        |  CAST(max(variant_get(parse_json(props), '$.k', 'long')) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // GROUP BY ALL / ORDER BY ALL (same text runs in DuckDB).
    "q_groupby_all" -> sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    // decorrelation shape behind "top N per group" in ANSI SQL).
    "q_lateral_subquery" -> sql(
      """SELECT n_name, t.o_orderkey, t.o_totalprice
        |FROM nation, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY n_name, o_totalprice DESC, o_orderkey""".stripMargin),

    // Native Dataset.unpivot (melt) — the typed API over the stack
    // generator's semantics.
    "q_unpivot" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("c_nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal"), col("c_nationkey")), "metric", "val")
        .orderBy(col("c_custkey"), col("metric"))
    },

    // unionByName with missing-column fill.
    "q_union_by_name" -> { (s, dir) =>
      val a = Tables.load(s, dir, "nation")
        .select(lit("n").as("side"), col("n_nationkey").as("key"), col("n_name").as("name_a"))
      val b = Tables.load(s, dir, "region")
        .select(lit("r").as("side"), col("r_regionkey").as("key"), col("r_name").as("name_b"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("side"), col("key"))
    })

  val oracle: Map[String, String] = Map(
    "q_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_groupby_all" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin,
    "q_lateral_subquery" ->
      """SELECT n_name, t.o_orderkey, t.o_totalprice
        |FROM nation, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY n_name, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_unpivot" ->
      """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS val
        |FROM customer WHERE c_custkey <= 50
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS DOUBLE)
        |FROM customer WHERE c_custkey <= 50
        |ORDER BY c_custkey, metric""".stripMargin,
    "q_union_by_name" ->
      """SELECT 'n' AS side, n_nationkey AS key, n_name AS name_a, NULL AS name_b FROM nation
        |UNION ALL
        |SELECT 'r', r_regionkey, NULL, r_name FROM region
        |ORDER BY side, key""".stripMargin)
}
