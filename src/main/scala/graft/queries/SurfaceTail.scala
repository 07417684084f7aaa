package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Surface-tail battery: the remaining registry families without a
  * dedicated gate — the Spark-3.4+ regexp tail (reference regex family
  * is `regexpExpressions.scala`, pre-`regexp_count`), bitwise
  * aggregates, cached-table scans (reference
  * `execution/command/cache.scala` + `InMemoryRelation`), and the
  * percent_rank window completion.
  */
object SurfaceTail {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // regexp_count / regexp_substr / regexp_extract_all — patterns kept
    // in the Java∩RE2 common subset so both engines' regex dialects
    // agree; the extract-all list is serialized (never a raw array out).
    "q_fn_regex_tail" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT p_partkey,
          |  regexp_count(p_name, '[aeiou]') AS n_vowels,
          |  regexp_substr(p_name, '[a-z]+') AS first_word,
          |  concat_ws(',', regexp_extract_all(p_name, '[a-z]+', 0)) AS words_csv
          |FROM part WHERE p_partkey <= 200
          |ORDER BY p_partkey""".stripMargin)
    },

    // bit_and / bit_or / bit_xor grouped aggregates over a bounded
    // integer domain (associative+commutative, so partial aggregation
    // is exact under any partitioning).
    "q_agg_bitwise" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  bit_and(l_partkey % 256) AS band,
          |  bit_or(l_partkey % 256) AS bor,
          |  bit_xor(l_partkey % 256) AS bxor,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // CACHE TABLE ... AS SELECT: materializes the aggregate into the
    // columnar cache (InMemoryRelation); the gate reads THROUGH the
    // cache — values must match the uncached oracle exactly.  The
    // cached relation is per-nation pre-aggregated, the 100 TB pattern
    // for a reused dimension rollup.  Rerun-safe: the view is replaced
    // each run.
    "q_cache_table" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("UNCACHE TABLE IF EXISTS graft_cached_bal")
      s.sql("DROP VIEW IF EXISTS graft_cached_bal")
      s.sql(
        """CACHE TABLE graft_cached_bal AS
          |SELECT c_nationkey, count(*) AS n_cust,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
          |FROM customer GROUP BY c_nationkey""".stripMargin)
      s.sql(
        """SELECT c_nationkey, n_cust, bal
          |FROM graft_cached_bal WHERE n_cust > 0
          |ORDER BY c_nationkey""".stripMargin)
    },

    // percent_rank + cume_dist side by side over the same ordered
    // partition (the two normalized-rank definitions differ at the
    // edges: (rank-1)/(n-1) vs rank/n).
    "q_window_percent_rank" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT s_suppkey, s_nationkey,
          |  CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
          |  CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd
          |FROM supplier
          |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
          |ORDER BY s_nationkey, s_suppkey""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_fn_regex_tail" ->
      """SELECT p_partkey,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        |  regexp_extract(p_name, '[a-z]+', 0) AS first_word,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words_csv
        |FROM part WHERE p_partkey <= 200
        |ORDER BY p_partkey""".stripMargin,
    "q_agg_bitwise" ->
      """SELECT l_returnflag,
        |  bit_and(l_partkey % 256) AS band,
        |  bit_or(l_partkey % 256) AS bor,
        |  bit_xor(l_partkey % 256) AS bxor,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_cache_table" ->
      """SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY c_nationkey
        |HAVING count(*) > 0
        |ORDER BY c_nationkey""".stripMargin,
    "q_window_percent_rank" ->
      """SELECT s_suppkey, s_nationkey,
        |  CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
        |  CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin)
}
