package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate/sketch and sampling operators (SURVEY.md §2.4 sketches:
  * HyperLogLogPlusPlus, ApproximatePercentile, CountMinSketch; §2.2
  * Sample; §2.13 DataFrameStatFunctions).  Sketch outputs depend on the
  * engine's sketch implementation, so most entries are deterministic
  * rows-only checks; crosstab is exact and oracle-checked.
  */
object Approx {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // HLL++ distinct-count estimates alongside exact counts.
    "q_approx_distinct" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .withColumn("rel_err",
          round(abs(col("approx_parts") - col("exact_parts")) /
            col("exact_parts"), 4))
        .orderBy(col("l_returnflag"))
    },

    // Approximate percentiles (deterministic given the data order is
    // normalized by the aggregation's internal sort).
    "q_approx_percentile" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
          .as("pq"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("qty_median"))
        // String-serialize the array output — raw arrays crash the
        // driver's pandas compare (unhashable ndarray).
        .select(
          concat_ws(",", transform(col("pq"), x => x.cast("string")))
            .as("price_quartiles"),
          col("qty_median"))
    },

    // Deterministic sampling: seeded Bernoulli sample must be stable
    // across runs (row-count stability asserted by rows-only hash).
    "q_sample_seeded" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.sample(withReplacement = false, fraction = 0.1, seed = 42)
        .agg(count(lit(1)).as("n_sampled"),
          min(col("o_orderkey")).as("first_key"))
    },

    // Exact crosstab (DataFrameStatFunctions.crosstab) — oracle-checked.
    "q_stat_crosstab" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.stat.crosstab("o_orderstatus", "o_orderpriority")
        .orderBy(col("o_orderstatus_o_orderpriority"))
    },

    // Frequent items (deterministic single-pass algorithm).
    "q_stat_freqitems" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.stat.freqItems(Array("o_orderstatus"), 0.4)
        .select(sort_array(col("o_orderstatus_freqItems")).as("frequent_statuses"))
    },

    // approxQuantile surfaces through stat; wrap as single-row frame.
    "q_stat_quantile" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val qs = li.stat.approxQuantile("l_extendedprice",
        Array(0.1, 0.5, 0.9), 0.01)
      val s2 = s
      import s2.implicits._
      Seq((qs(0), qs(1), qs(2))).toDF("p10", "p50", "p90")
    })

  val oracle: Map[String, String] = Map(
    "q_stat_crosstab" ->
      """SELECT CAST(o_orderstatus AS VARCHAR) AS o_orderstatus_o_orderpriority,
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS "1-URGENT",
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS BIGINT) AS "2-HIGH",
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS BIGINT) AS "3-MEDIUM",
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS BIGINT) AS "4-NOT SPECIFIED",
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus_o_orderpriority""".stripMargin)
}
