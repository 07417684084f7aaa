package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Spark 4 DataSketches surface: the Apache DataSketches HLL family
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) and the
  * frequent-items `approx_top_k` family including its two-phase
  * accumulate/combine/estimate form.  Sketch VALUES are engine-internal,
  * so the envelopes assert the contracts that matter at scale: accuracy
  * vs the exact answer (which the DuckDB oracle computes), MERGEABILITY
  * (union of per-group sketches ≈ global), and exactness of top-k at
  * low cardinality (5 distinct keys can't be approximated wrong).
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  private def run(text: String): Q = { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  val queries: Map[String, Q] = Map(
    // per-group HLL estimate within 5% of the exact distinct count
    "q_sketch_hll" -> run(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  (abs(hll_sketch_estimate(hll_sketch_agg(l_partkey))
        |       - count(DISTINCT l_partkey))
        |    <= 0.05 * count(DISTINCT l_partkey)) AS hll_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // MERGEABILITY: per-group sketches unioned reproduce the global
    // estimate — the property that makes the sketch partial-aggregable
    // across 1000 executors
    "q_sketch_hll_union" -> run(
      """WITH per AS (
        |  SELECT l_returnflag, hll_sketch_agg(l_partkey) AS sk
        |  FROM lineitem GROUP BY l_returnflag),
        |g AS (SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est FROM per),
        |e AS (SELECT count(DISTINCT l_partkey) AS exact_parts FROM lineitem)
        |SELECT exact_parts,
        |  (abs(est - exact_parts) <= 0.05 * exact_parts) AS union_ok
        |FROM g, e""".stripMargin),

    // approx_top_k at 5-key cardinality is EXACT — oracle-checked
    // against the plain GROUP BY counts
    "q_sketch_topk" -> run(
      """SELECT t.kv.item AS o_orderpriority, CAST(t.kv.count AS BIGINT) AS n
        |FROM (SELECT explode(approx_top_k(o_orderpriority, 5)) AS kv
        |      FROM orders) t
        |ORDER BY o_orderpriority""".stripMargin),

    // two-phase form: accumulate sketch states on disjoint halves,
    // combine, estimate — the distributed merge path, still exact at
    // this cardinality
    "q_sketch_topk_2phase" -> run(
      """WITH halves AS (
        |  SELECT approx_top_k_accumulate(o_orderpriority, 5) AS st
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT approx_top_k_accumulate(o_orderpriority, 5) AS st
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |u AS (SELECT approx_top_k_combine(st) AS st FROM halves)
        |SELECT t.kv.item AS o_orderpriority, CAST(t.kv.count AS BIGINT) AS n
        |FROM (SELECT explode(approx_top_k_estimate(st, 5)) AS kv FROM u) t
        |ORDER BY o_orderpriority""".stripMargin),

    // bitmap aggregates are EXACT distinct counting (bucket bitmaps
    // OR'd then popcounted) — full oracle equality, no envelope needed
    "q_bitmap_distinct" -> run(
      """SELECT l_returnflag, CAST(sum(cnt) AS BIGINT) AS n_distinct
        |FROM (
        |  SELECT l_returnflag,
        |    bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey))) AS cnt
        |  FROM lineitem
        |  GROUP BY l_returnflag, bitmap_bucket_number(l_partkey))
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Theta sketches support set ALGEBRA on sketches: union /
    // intersection estimates vs the exact inclusion-exclusion answers
    // (exact figures hash-checked; estimates enveloped)
    "q_sketch_theta" -> run(
      """WITH s AS (
        |  SELECT
        |    theta_sketch_agg(l_partkey) FILTER (WHERE l_returnflag = 'R') AS sr,
        |    theta_sketch_agg(l_partkey) FILTER (WHERE l_returnflag = 'N') AS sn
        |  FROM lineitem),
        |e AS (SELECT
        |  count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS er,
        |  count(DISTINCT CASE WHEN l_returnflag = 'N' THEN l_partkey END) AS en,
        |  count(DISTINCT CASE WHEN l_returnflag IN ('R','N') THEN l_partkey END) AS eu
        |  FROM lineitem)
        |SELECT er, en, eu,
        |  (abs(theta_sketch_estimate(theta_union(sr, sn)) - eu)
        |     <= 0.05 * eu) AS union_ok,
        |  (abs(theta_sketch_estimate(theta_intersection(sr, sn)) - (er + en - eu))
        |     <= greatest(0.1 * (er + en - eu), 50.0)) AS inter_ok
        |FROM s, e""".stripMargin),

    // KLL quantile sketch: the estimate must land between the exact
    // percentiles at p ± 0.02 (the sketch's rank-error contract),
    // exact p50 hash-checked
    "q_sketch_kll" -> run(
      """WITH s AS (
        |  SELECT kll_sketch_agg_double(l_extendedprice) AS sk,
        |    percentile(l_extendedprice, array(0.48, 0.5, 0.52)) AS ep
        |  FROM lineitem)
        |SELECT round(ep[1], 4) AS p50_exact,
        |  (kll_sketch_get_quantile_double(sk, 0.5)
        |     BETWEEN ep[0] AND ep[2]) AS p50_ok
        |FROM s""".stripMargin))

  val oracle: Map[String, String] = Map(
    "q_bitmap_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sketch_theta" ->
      """SELECT
        |  count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS er,
        |  count(DISTINCT CASE WHEN l_returnflag = 'N' THEN l_partkey END) AS en,
        |  count(DISTINCT CASE WHEN l_returnflag IN ('R','N') THEN l_partkey END) AS eu,
        |  true AS union_ok, true AS inter_ok
        |FROM lineitem""".stripMargin,
    "q_sketch_kll" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  true AS p50_ok
        |FROM lineitem""".stripMargin,
    "q_sketch_hll" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  true AS hll_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sketch_hll_union" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts, true AS union_ok
        |FROM lineitem""".stripMargin,
    "q_sketch_topk" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sketch_topk_2phase" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
