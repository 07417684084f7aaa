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
    // HLL++ distinct-count estimates: the sketch VALUE is
    // engine-specific, but its accuracy contract is not — emit the
    // exact count plus an error-bound boolean (default rsd 5%; 10%
    // tolerance = 2 sigma of headroom), both hash-checked.
    "q_approx_distinct" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.10).as("within_10pct"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate percentiles: envelope oracle — each sketch estimate
    // must land within 5% of the EXACT percentile (computed in the same
    // pass), and the exact values hash against DuckDB quantile_cont.
    "q_approx_percentile" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
          .as("ap"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ep"))
        .select(
          round(element_at(col("ep"), 1), 4).as("p25_exact"),
          round(element_at(col("ep"), 2), 4).as("p50_exact"),
          round(element_at(col("ep"), 3), 4).as("p75_exact"),
          (abs(element_at(col("ap"), 1) - element_at(col("ep"), 1)) <=
            element_at(col("ep"), 1) * 0.05).as("p25_close"),
          (abs(element_at(col("ap"), 2) - element_at(col("ep"), 2)) <=
            element_at(col("ep"), 2) * 0.05).as("p50_close"),
          (abs(element_at(col("ap"), 3) - element_at(col("ep"), 3)) <=
            element_at(col("ep"), 3) * 0.05).as("p75_close"))
    },

    // Seeded Bernoulli sample: the kept SET is engine-specific, but the
    // size must sit in the binomial envelope around fraction*N — the
    // exact N and the bound boolean are hash-checked (determinism of
    // the set itself is asserted in StatSketchSpec).
    "q_sample_seeded" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val sampled = ord.sample(withReplacement = false, fraction = 0.1, seed = 42)
        .agg(count(lit(1)).as("n_sampled"))
      val total = ord.agg(count(lit(1)).as("n_total"))
      sampled.crossJoin(total)
        .select(col("n_total"),
          (col("n_sampled") >= col("n_total") * 0.08 &&
           col("n_sampled") <= col("n_total") * 0.12).as("n_in_bounds"))
    },

    // Exact crosstab (DataFrameStatFunctions.crosstab) — oracle-checked.
    "q_stat_crosstab" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      ord.stat.crosstab("o_orderstatus", "o_orderpriority")
        .orderBy(col("o_orderstatus_o_orderpriority"))
    },

    // Frequent items support ENVELOPE (oracle-checked): the freqItems
    // contract (Karp/Shenker/Papadimitriou single-pass) guarantees NO
    // FALSE NEGATIVES — every value with frequency > support must be
    // returned.  The statuses are uniform ~1/3 each, so at support 0.3
    // all three are above-support and must all be found.  The
    // above-support set is exact SQL, so its size, its
    // members and the found-count are all oracle-checkable; false
    // positives (allowed by the algorithm) are deliberately not output.
    "q_stat_freqitems" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val fi = ord.stat.freqItems(Array("o_orderstatus"), 0.3)
        .select(col("o_orderstatus_freqItems").as("items"))
      val above = ord.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .crossJoin(ord.agg(count(lit(1)).as("total")))
        .filter(col("n") > col("total") * 0.3)
        .select(col("o_orderstatus").as("status"))
      above.crossJoin(fi)
        .agg(count(lit(1)).as("n_above_support"),
          sum(when(array_contains(col("items"), col("status")), 1L)
            .otherwise(0L)).as("n_above_found"),
          concat_ws(",", sort_array(collect_list(col("status")))).as("above_csv"))
    },

    // Stratified sampling: per-stratum counts must sit within ±40% of
    // fraction * stratum size (≫ binomial noise); stratum totals exact.
    "q_stat_sampleby" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val fractions = Map("F" -> 0.1, "O" -> 0.05, "P" -> 0.2)
      val sampled = ord.stat.sampleBy("o_orderstatus", fractions, 7L)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_sampled"))
      val totals = ord.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_total"))
      val frac = typedLit(fractions)
      sampled.join(totals, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_total"),
          (col("n_sampled") >= element_at(frac, col("o_orderstatus")) * col("n_total") * 0.6 &&
           col("n_sampled") <= element_at(frac, col("o_orderstatus")) * col("n_total") * 1.4)
            .as("in_bounds"))
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
    // bound is asserted in StatSketchSpec.  Build and probe stay fully
    // distributed: `BloomFilterAggregate` constructs the filter as an
    // aggregate (partial sketches OR-merged map-side) and
    // `BloomFilterMightContain` probes it inside codegen via a scalar
    // subquery — no driver-built sketch, no per-row UDF boxing.
    "q_stat_bloom" -> { (s, dir) =>
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val ord = Tables.load(s, dir, "orders")
      // 2000 items at fpp 0.01 → n·log2(1/p)/ln2 ≈ 19.2k bits (the same
      // sizing stat.bloomFilter(2000, 0.01) derives)
      val bf = ord.agg(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("o_custkey"))),
        Literal(2000L), Literal(19200L)).toAggregateExpression()).as("bf"))
      val probe = ColumnBridge.column(BloomFilterMightContain(
        ColumnBridge.expression(bf.scalar()),
        ColumnBridge.expression(xxhash64(col("o_custkey")))))
      ord.select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("n_keys"),
          sum(when(probe, 1L).otherwise(0L)).as("n_found"))
    },

    // approxQuantile (Greenwald-Khanna, relativeError 0.01): the GK
    // contract is a RANK bound, not a value bound — each estimate must
    // lie between the exact percentiles at p ± 0.02 (2× the configured
    // rank error).  Exact percentiles hash against quantile_cont.
    "q_stat_quantile" -> { (s, dir) =>
      // the GK sketch and the exact-percentile twin each scan the same
      // single column — cache the 8-byte projection so the parquet
      // decode runs once for both actions.  Exact percentiles go
      // through the DISTRIBUTED sort-based ExactQuantiles (same
      // interpolation as Spark's percentile() and DuckDB quantile_cont)
      // instead of the single-buffer Percentile aggregate, which sorts
      // all distinct values on one thread (~2.5 s on this column and a
      // genuine bottleneck at scale).
      val li = Tables.load(s, dir, "lineitem").select(col("l_extendedprice"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qs = li.stat.approxQuantile("l_extendedprice",
        Array(0.1, 0.5, 0.9), 0.01)
      val ex = graft.ops.ExactQuantiles.percentiles(li, "l_extendedprice",
        Seq(0.08, 0.1, 0.12, 0.48, 0.5, 0.52, 0.88, 0.9, 0.92))
      li.unpersist()
      def inBand(est: Double, lo: Double, hi: Double) = est >= lo && est <= hi
      val s2 = s
      import s2.implicits._
      Seq((math.round(ex(1) * 10000) / 10000.0,
           math.round(ex(4) * 10000) / 10000.0,
           math.round(ex(7) * 10000) / 10000.0,
           inBand(qs(0), ex(0), ex(2)),
           inBand(qs(1), ex(3), ex(5)),
           inBand(qs(2), ex(6), ex(8))))
        .toDF("p10_exact", "p50_exact", "p90_exact",
          "p10_close", "p50_close", "p90_close")
    })

  val oracle: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  true AS within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_approx_percentile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_exact,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_exact,
        |  true AS p25_close, true AS p50_close, true AS p75_close
        |FROM lineitem""".stripMargin,
    "q_sample_seeded" ->
      """SELECT count(*) AS n_total, true AS n_in_bounds
        |FROM orders""".stripMargin,
    "q_stat_freqitems" ->
      """WITH a AS (
        |  SELECT o_orderstatus AS status FROM orders
        |  GROUP BY o_orderstatus
        |  HAVING count(*) > 0.3 * (SELECT count(*) FROM orders))
        |SELECT count(*) AS n_above_support,
        |  CAST(count(*) AS BIGINT) AS n_above_found,
        |  string_agg(status, ',' ORDER BY status) AS above_csv
        |FROM a""".stripMargin,
    "q_stat_sampleby" ->
      """SELECT o_orderstatus, count(*) AS n_total, true AS in_bounds
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_stat_quantile" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.1), 4) AS p10_exact,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
        |  true AS p10_close, true AS p50_close, true AS p90_close
        |FROM lineitem""".stripMargin,
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
