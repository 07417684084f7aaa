package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Scd2

/** Warehouse-maintenance gate battery:
  *
  *  - SCD2 dimension versioning (close + open + passthrough)  q_scd2
  *  - incremental aggregate maintenance (partial-agg merge)   q_incremental_agg
  *
  * Both express the "don't reprocess history" contract: SCD2 touches
  * only the open slice + batch; incremental agg folds a delta into a
  * saved aggregate state and must equal the from-scratch aggregate.
  */
object WarehouseQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Dimension: every customer open at v1 plus pre-closed history for
    // custkey%7; batch at v2 changes custkey%5 to SEG_NEW, no-ops
    // custkey%11 (same attr), and introduces 50 brand-new keys.
    "q_scd2" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val dim = c.select(col("c_custkey").as("key"),
          col("c_mktsegment").as("attr"),
          lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"))
        .unionByName(c.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("key"),
            concat(lit("OLD_"), col("c_mktsegment")).as("attr"),
            lit(0L).as("valid_from"), lit(1L).cast("long").as("valid_to")))
      val updates = c
        .filter(col("c_custkey") % 5 === 0 || col("c_custkey") % 11 === 0)
        .select(col("c_custkey").as("key"),
          when(col("c_custkey") % 5 === 0, lit("SEG_NEW"))
            .otherwise(col("c_mktsegment")).as("attr"))
        .unionByName(c.filter(col("c_custkey") < 50)
          .select((col("c_custkey") + 10000).as("key"),
            lit("SEG_FRESH").as("attr")))
      Scd2.apply(dim, updates, version = 2L)
        .groupBy(col("valid_from"), col("valid_to").isNull.as("open"))
        .agg(count(lit(1)).as("n"), sum(col("key")).cast("long").as("key_sum"))
        .orderBy(col("valid_from"), col("open"))
    },

    // Aggregate state built from pre-1998 lineitems, then the 1998+
    // delta folded in by partial-aggregate merge (sums/counts are a
    // commutative monoid) — must equal aggregating everything at once,
    // which is exactly what the oracle does.
    "q_incremental_agg" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      def partial(df: DataFrame): DataFrame = df
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_cents"),
          count(lit(1)).as("n"))
      val state = partial(li.filter(
        col("l_shipdate") < lit("1998-01-01").cast("timestamp")))
      val delta = partial(li.filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp")))
      state.unionByName(delta)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("sum_qty")).cast("long").as("sum_qty"),
          sum(col("sum_cents")).cast("long").as("sum_cents"),
          sum(col("n")).cast("long").as("n"))
        .withColumn("avg_cents",
          round(col("sum_cents").cast("double") / col("n"), 2))
        .orderBy(col("l_returnflag"))
    })

  val oracle: Map[String, String] = Map(
    "q_scd2" ->
      """WITH dim AS (
        |  SELECT c_custkey AS key, c_mktsegment AS attr,
        |    CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, concat('OLD_', c_mktsegment),
        |    CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        |  FROM customer WHERE c_custkey % 7 = 0),
        |updates AS (
        |  SELECT c_custkey AS key,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'SEG_NEW' ELSE c_mktsegment END AS attr
        |  FROM customer WHERE c_custkey % 5 = 0 OR c_custkey % 11 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000, 'SEG_FRESH' FROM customer WHERE c_custkey < 50),
        |opened AS (SELECT * FROM dim WHERE valid_to IS NULL),
        |closed AS (SELECT * FROM dim WHERE valid_to IS NOT NULL),
        |still_open AS (
        |  SELECT o.key, o.attr, o.valid_from, o.valid_to
        |  FROM opened o LEFT JOIN updates u ON o.key = u.key
        |  WHERE u.key IS NULL OR o.attr = u.attr),
        |now_closed AS (
        |  SELECT o.key, o.attr, o.valid_from, CAST(2 AS BIGINT) AS valid_to
        |  FROM opened o JOIN updates u ON o.key = u.key AND o.attr <> u.attr),
        |new_versions AS (
        |  SELECT u.key, u.attr, CAST(2 AS BIGINT) AS valid_from,
        |    CAST(NULL AS BIGINT) AS valid_to
        |  FROM updates u LEFT JOIN opened o ON u.key = o.key
        |  WHERE o.key IS NULL OR o.attr <> u.attr),
        |result AS (
        |  SELECT * FROM closed UNION ALL SELECT * FROM still_open
        |  UNION ALL SELECT * FROM now_closed UNION ALL SELECT * FROM new_versions)
        |SELECT valid_from, valid_to IS NULL AS open, count(*) AS n,
        |  CAST(sum(key) AS BIGINT) AS key_sum
        |FROM result GROUP BY valid_from, valid_to IS NULL
        |ORDER BY valid_from, open""".stripMargin,

    // the oracle aggregates EVERYTHING at once — matching it proves the
    // state+delta merge loses nothing
    "q_incremental_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  count(*) AS n,
        |  CAST(round(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / count(*), 2) AS DOUBLE) AS avg_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
