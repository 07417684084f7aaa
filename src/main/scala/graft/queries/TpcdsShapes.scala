package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS-SHAPE battery: the query patterns the reference exercises
  * through its 103-query TPC-DS corpus (reference
  * `sql/core/src/test/resources/tpcds/`, `TPCDSQuerySuite.scala:319`),
  * re-expressed on this repo's star schema.  Each entry names the
  * TPC-DS query whose plan shape it mirrors:
  *
  *  - multi-channel UNION-ALL fact aggregation + ROLLUP   (q5 / q77)
  *  - INTERSECT-driven cross-channel part selection        (q14)
  *  - rollup-heavy multi-join aggregate                    (q18 / q22)
  *  - window-over-aggregate deviation filter               (q47 / q57)
  *  - deep multi-way join (8 relations, nation twice)      (q64)
  *  - year-over-year self-join growth ratio                (q74 / q11)
  *  - FILTER-clause conditional aggregates + HAVING        (q17 / q50)
  *  - per-key channel-completeness (GROUP BY + HAVING)     (q38 / q87)
  *  - share-of-group window ratio                          (q89 / q98)
  *  - multi-scalar-subquery single-row time bands          (q88)
  *  - cumulative windows over full-outer channel join      (q51)
  *  - repeat-buyer frequency banding                       (q34 / q73)
  *  - channel-exclusive anti membership                    (q78 / q97)
  *
  * The SQL is written in the Spark∩DuckDB common dialect and the SAME
  * text runs on both engines — the strongest possible oracle (any
  * divergence in coercion, null handling, rollup grouping, window
  * framing or join semantics breaks the hash).  Money is aggregated as
  * integer cents (`floor(x*100)`) so sums are order-independent, and
  * every ratio divides two exact integers in double precision —
  * deterministic on both engines.  Rollup NULL keys are coalesced to
  * sentinels so null-ordering differences can't bite the final sort.
  */
object TpcdsShapes {
  type Q = (SparkSession, String) => DataFrame

  /** name -> dialect-common SQL (runs verbatim on Spark AND DuckDB). */
  private val sql: Map[String, String] = Map(
    // q5/q77 shape: three channels unioned, per-channel-year rollup with
    // grand totals.  At scale each branch is an independent scan+partial
    // agg; the union never materializes pre-aggregated rows.
    "qds_channel_rollup" ->
      """WITH sales AS (
        |  SELECT 'store' AS channel, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'catalog' AS channel, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders
        |  UNION ALL
        |  SELECT 'web' AS channel, CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS yr,
        |    CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase')
        |SELECT coalesce(channel, 'ALL') AS channel, coalesce(yr, -1) AS yr,
        |  count(*) AS n, CAST(sum(c) AS BIGINT) AS cents
        |FROM sales GROUP BY ROLLUP (channel, yr) ORDER BY channel, yr""".stripMargin,

    // q14 shape: parts sold in ALL of three consecutive years (chained
    // INTERSECT), then sales of the final year restricted to them.
    "qds_cross_channel_intersect" ->
      """WITH common_parts AS (
        |  SELECT l_partkey FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1998)
        |SELECT p_brand, count(*) AS n_sales,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
        |  AND l_partkey IN (SELECT l_partkey FROM common_parts)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q18/q22 shape: 4-relation join rolled up over two dimensions;
    // avg over floor'd quantities keeps the mean exact-integer-ratio.
    "qds_rollup_quantity" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n,
        |  round(avg(CAST(floor(l_quantity) AS BIGINT)), 6) AS avg_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY nation, priority""".stripMargin,

    // q47/q57 shape: monthly revenue per brand, deviation vs the
    // brand-year mean expressed as exact-integer cross-multiplication
    // (cents * n_months > 1.15 * year_cents) — no FP accumulation.
    "qds_window_over_agg" ->
      """WITH monthly AS (
        |  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |    CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, yr, mo),
        |w AS (
        |  SELECT p_brand, yr, mo, cents,
        |    CAST(sum(cents) OVER (PARTITION BY p_brand, yr) AS BIGINT) AS yr_cents,
        |    count(*) OVER (PARTITION BY p_brand, yr) AS n_mo
        |  FROM monthly)
        |SELECT p_brand, yr, mo, cents,
        |  round(CAST(cents AS DOUBLE) * n_mo / CAST(yr_cents AS DOUBLE), 6) AS ratio
        |FROM w
        |WHERE CAST(cents AS DOUBLE) * n_mo > 1.15 * CAST(yr_cents AS DOUBLE)
        |ORDER BY p_brand, yr, mo""".stripMargin,

    // q64 shape: 8-way join with nation playing two roles (customer's
    // and supplier's).  Dimension sides broadcast; the single fact
    // (lineitem) never shuffles before partial aggregation.
    "qds_deep_join" ->
      """SELECT r_name AS cust_region, n2.n_name AS supp_nation, p_brand,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region   ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN part     ON l_partkey = p_partkey
        |WHERE o_orderstatus = 'F' AND p_size <= 25
        |GROUP BY r_name, n2.n_name, p_brand
        |ORDER BY cust_region, supp_nation, p_brand""".stripMargin,

    // q74/q11 shape: per-customer yearly totals self-joined across two
    // years, keeping customers whose spend grew >1.5x.
    "qds_yoy_growth" ->
      """WITH yearly AS (
        |  SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate))
        |SELECT a.o_custkey AS custkey, a.cents AS cents_prev, b.cents AS cents_cur,
        |  round(CAST(b.cents AS DOUBLE) / CAST(a.cents AS DOUBLE), 6) AS growth
        |FROM yearly a JOIN yearly b ON a.o_custkey = b.o_custkey
        |WHERE a.yr = 1999 AND b.yr = 2000
        |  AND CAST(b.cents AS DOUBLE) > 1.5 * CAST(a.cents AS DOUBLE)
        |ORDER BY custkey""".stripMargin,

    // q17/q50 shape: conditional aggregates via the standard FILTER
    // clause + HAVING over a filtered count.
    "qds_returns_ratio" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS ret_cents,
        |  round(CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) / count(*), 6) AS ret_ratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |HAVING count(*) FILTER (WHERE l_returnflag = 'R') > 0
        |ORDER BY p_brand""".stripMargin,

    // q38/q87 shape: customers active in EVERY channel-year, found with
    // one aggregation + HAVING count(DISTINCT) — the scalable rewrite of
    // a 3-way INTERSECT (one shuffle instead of three).
    "qds_multi_channel_customers" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers
        |FROM customer JOIN (
        |  SELECT o_custkey FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1999, 2000, 2001)
        |  GROUP BY o_custkey
        |  HAVING count(DISTINCT EXTRACT(YEAR FROM o_orderdate)) = 3) a
        |ON c_custkey = a.o_custkey
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q89/q98 shape: each (brand, type)'s share of its brand's revenue
    // via a partitioned window sum over exact integer cents.
    "qds_brand_share" ->
      """WITH t AS (
        |  SELECT p_brand, p_type,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_type)
        |SELECT p_brand, p_type, cents,
        |  round(CAST(cents AS DOUBLE) / CAST(sum(cents) OVER (PARTITION BY p_brand) AS DOUBLE), 6) AS brand_share
        |FROM t ORDER BY p_brand, p_type""".stripMargin,

    // q88 shape: eight independent time-band counts folded into ONE
    // result row via uncorrelated scalar subqueries — at scale each
    // band is a pushed-filter scan aggregated to a scalar, and the
    // eight subplans share nothing (embarrassingly parallel).
    "qds_time_band_counts" ->
      """SELECT
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 0 AND 2) AS h0_2,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 3 AND 5) AS h3_5,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8) AS h6_8,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 9 AND 11) AS h9_11,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 12 AND 14) AS h12_14,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 15 AND 17) AS h15_17,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20) AS h18_20,
        |  (SELECT count(*) FROM events WHERE EXTRACT(HOUR FROM ts) BETWEEN 21 AND 23) AS h21_23""".stripMargin,

    // q51 shape: two channels aggregated to (year, month), FULL OUTER
    // joined, then cumulative sums over the combined axis — the window
    // runs over pre-aggregated rows (84), never the facts.
    "qds_cumulative_channels" ->
      """WITH store AS (
        |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |    CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY EXTRACT(YEAR FROM l_shipdate), EXTRACT(MONTH FROM l_shipdate)),
        |web AS (
        |  SELECT CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS yr,
        |    CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS mo,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY EXTRACT(YEAR FROM ts), EXTRACT(MONTH FROM ts)),
        |j AS (
        |  SELECT coalesce(store.yr, web.yr) AS yr, coalesce(store.mo, web.mo) AS mo,
        |    coalesce(store.cents, 0) AS store_cents, coalesce(web.cents, 0) AS web_cents
        |  FROM store FULL OUTER JOIN web ON store.yr = web.yr AND store.mo = web.mo)
        |SELECT yr, mo,
        |  CAST(sum(store_cents) OVER (ORDER BY yr, mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS store_cum,
        |  CAST(sum(web_cents) OVER (ORDER BY yr, mo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS web_cum
        |FROM j ORDER BY yr, mo""".stripMargin,

    // q34/q73 shape: per-customer-quarter order counts banded into
    // frequency classes — agg over an agg, FILTER-counted.
    "qds_repeat_buyers" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr, count(*) AS n_orders
        |  FROM orders
        |  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate), EXTRACT(QUARTER FROM o_orderdate))
        |SELECT yr, qtr,
        |  count(*) FILTER (WHERE n_orders = 2) AS n_two,
        |  count(*) FILTER (WHERE n_orders BETWEEN 3 AND 4) AS n_three_four,
        |  count(*) FILTER (WHERE n_orders >= 5) AS n_five_plus
        |FROM per GROUP BY yr, qtr ORDER BY yr, qtr""".stripMargin,

    // q78/q97 shape: membership in one channel, anti-membership in
    // another (IN + NOT IN over clean key sets → semi + anti joins).
    "qds_channel_exclusive" ->
      """SELECT p_brand, count(*) AS n_parts
        |FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N')
        |  AND p_partkey NOT IN (
        |    SELECT l_partkey FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    WHERE s_acctbal > 9000)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
