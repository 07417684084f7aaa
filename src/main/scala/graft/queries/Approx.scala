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

    // Stratified sampling (DataFrameStatFunctions.sampleBy,
    // reference `DataFrameStatFunctions.scala:372`): seeded per-stratum
    // Bernoulli — deterministic, but engine-specific (rows-only).
    "q_stat_sampleby" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val fractions = Map("F" -> 0.1, "O" -> 0.05, "P" -> 0.2)
      ord.stat.sampleBy("o_orderstatus", fractions, 7L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_sampled"), min(col("o_orderkey")).as("first_key"))
        .orderBy(col("o_orderstatus"))
    },

    // Count-min sketch (reference `DataFrameStatFunctions.scala:409`):
    // seeded, and with eps=0.001 the 3-key status column cannot collide
    // across all depth rows, so the estimates equal the exact counts —
    // oracle-checked against plain GROUP BY counts.
    "q_stat_cms" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val cms = ord.stat.countMinSketch("o_orderstatus", 0.001, 0.99, 42)
      val s2 = s
      import s2.implicits._
      Seq("F", "O", "P").map(st => (st, cms.estimateCount(st)))
        .toDF("status", "est_n")
        .orderBy(col("status"))
    },

    // Bloom filter (reference `DataFrameStatFunctions.scala:492`): no
    // false negatives by construction, so every key that built the
    // filter must be found — oracle-checked; the false-positive-rate
    // bound is asserted in StatSketchSpec.
    "q_stat_bloom" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val bf = ord.stat.bloomFilter("o_custkey", 2000, 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((k: Long) => bfB.value.mightContain(k))
      ord.select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("n_keys"),
          sum(when(mightContain(col("o_custkey")), 1L).otherwise(0L)).as("n_found"))
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
    "q_stat_cms" ->
      """SELECT o_orderstatus AS status, count(*) AS est_n
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "q_stat_bloom" ->
      """SELECT count(DISTINCT o_custkey) AS n_keys,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_found
        |FROM orders""".stripMargin,
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
