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
  *  - multi-CTE + double-IN qualification                  (q23)
  *  - rank window OVER rollup output                       (q67)
  *  - 9-way join with date logic in the predicate          (q72)
  *  - two-level correlated EXISTS chain                    (q93)
  *  - EXISTS + NOT EXISTS double existence filter          (q95)
  *  - disjunctive correlated EXISTS (OR of subqueries)     (q35)
  *  - integer-exact coefficient-of-variation filter        (q39)
  *  - grouping()-level-partitioned window rank             (q36 / q70)
  *  - pivot-date FILTER split + HAVING share               (q21)
  *  - three-role fact self-join (sale/return/rebuy)        (q25 / q29)
  *  - ratio dense_rank top band                            (q49)
  *  - anchor event then relative-month window              (q54)
  *  - balanced-periods integer band filter                 (q58)
  *  - consecutive-period growth self-join chain            (q31)
  *  - 12-way FILTER manual pivot                           (q66)
  *  - NULL-extended channel union cells                    (q76)
  *  - below-group-average semi join (agg over agg)         (q65)
  *  - correlated scalar vs per-group average               (q30 / q1)
  *  - agg-of-union-of-aggs channel tower                   (q33 / q56 / q60)
  *  - price-band × date-range COUNT DISTINCT               (q37 / q82)
  *  - dim-only DISTINCT over OR-of-ANDs tree               (q41)
  *  - opposite-direction rank join (best/worst)            (q44)
  *  - IN-subquery inside a disjunction                     (q45)
  *  - wide OR-of-ANDs band matrix                          (q48)
  *  - YoY decline diff join                                (q75)
  *  - lag-band FILTER crosstab                             (q99 / q62)
  *  - substring key ∩ INTERSECT subquery sets              (q8)
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
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q23 shape: two independent qualification CTEs (frequently-sold
    // parts by year-count; best customers by spend vs a scalar-subquery
    // threshold), then target-period sales restricted by IN over BOTH —
    // the multi-CTE + double-semi-join plan.
    "qds_q23_frequent_best" ->
      """WITH freq_parts AS (
        |  SELECT l_partkey FROM lineitem
        |  WHERE EXTRACT(YEAR FROM l_shipdate) BETWEEN 1996 AND 1999
        |  GROUP BY l_partkey HAVING count(*) >= 8),
        |best_customers AS (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  HAVING CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) >
        |    0.5 * (SELECT max(total) FROM (
        |      SELECT CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS total
        |      FROM orders GROUP BY o_custkey) m))
        |SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 2000
        |  AND l_partkey IN (SELECT l_partkey FROM freq_parts)
        |  AND o_custkey IN (SELECT o_custkey FROM best_customers)
        |GROUP BY EXTRACT(MONTH FROM l_shipdate) ORDER BY mo""".stripMargin,

    // q67 shape: ROLLUP over three dimensions, then a rank() WINDOW
    // OVER THE ROLLUP OUTPUT, keeping the top ranks per grouping —
    // window-over-grouping-sets composition.
    "qds_q67_rollup_rank" ->
      """WITH r AS (
        |  SELECT coalesce(p_brand, 'ALL') AS brand, coalesce(p_type, 'ALL') AS ptype,
        |    coalesce(CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT), -1) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY ROLLUP (p_brand, p_type, EXTRACT(YEAR FROM l_shipdate)))
        |SELECT brand, ptype, yr, cents, rk FROM (
        |  SELECT brand, ptype, yr, cents,
        |    rank() OVER (PARTITION BY brand ORDER BY cents DESC, ptype, yr) AS rk
        |  FROM r) t
        |WHERE rk <= 3 ORDER BY brand, rk, ptype, yr""".stripMargin,

    // q72 shape: the 9-relation join with DATE LOGIC in the join
    // condition — lineitem to its order plus both geography towers and
    // part, keeping only lines shipped >30 days after ordering (the
    // inventory-lag predicate q72 applies between d1/d2/d3 roles).
    "qds_q72_nine_way_lag" ->
      """SELECT n1.n_name AS cust_nation, r2.r_name AS supp_region, p_type,
        |  count(*) AS n_late,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |JOIN part      ON l_partkey = p_partkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND r1.r_name IN ('ASIA', 'EUROPE') AND p_size < 20
        |GROUP BY n1.n_name, r2.r_name, p_type
        |ORDER BY cust_nation, supp_region, p_type""".stripMargin,

    // q93 shape: EXISTS chained two levels deep — customers having an
    // order that itself has a returned high-value line.
    "qds_q93_exists_chain" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND EXISTS (
        |      SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |        AND l_returnflag = 'R' AND l_extendedprice > 5000))
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q95 shape: EXISTS a second line from a DIFFERENT supplier in the
    // same order AND NOT EXISTS any returned line — the double
    // correlated-existence filter over one fact.
    "qds_q95_multi_supplier" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l1 JOIN lineitem l2
        |      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        |    WHERE l1.l_orderkey = o_orderkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = o_orderkey AND l3.l_returnflag = 'R')
        |GROUP BY EXTRACT(YEAR FROM o_orderdate) ORDER BY yr""".stripMargin,

    // q35 shape: EXISTS in a required channel AND a disjunction of
    // EXISTS over two optional channels, grouped demographics.
    "qds_q35_channel_presence" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND EXTRACT(YEAR FROM o_orderdate) = 2000)
        |  AND (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |               AND o_orderpriority = '1-URGENT')
        |    OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |               AND o_orderstatus = 'F'))
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q39 shape: per-(part, month) demand variability with a
    // coefficient-of-variation filter, expressed in EXACT integer
    // cross-multiplication (n·(n·Σx² − (Σx)²) > (n−1)·(Σx)²  ⇔
    // CoV² > 1) so no FP accumulation can flip the comparison.
    "qds_q39_variability" ->
      """WITH m AS (
        |  SELECT l_partkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
        |    count(*) AS n,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT) * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS ss
        |  FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1998
        |  GROUP BY l_partkey, EXTRACT(MONTH FROM l_shipdate))
        |SELECT mo, count(*) AS n_volatile_parts
        |FROM m
        |WHERE n > 1 AND n * (n * ss - s * s) > (n - 1) * s * s
        |GROUP BY mo ORDER BY mo""".stripMargin,

    // q36 shape: margin-ratio ROLLUP with rank PARTITIONED BY GROUPING
    // LEVEL — the grouping()-function-in-window composition.
    "qds_q36_grouping_rank" ->
      """WITH r AS (
        |  SELECT coalesce(n_name, 'ALL') AS nation,
        |    coalesce(o_orderpriority, 'ALL') AS priority,
        |    CAST(GROUPING(n_name) + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
        |    CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS gross_cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY ROLLUP (n_name, o_orderpriority))
        |SELECT nation, priority, lvl,
        |  rank() OVER (PARTITION BY lvl
        |    ORDER BY CAST(disc_cents AS DOUBLE) / CAST(gross_cents AS DOUBLE) DESC,
        |      nation, priority) AS rk
        |FROM r ORDER BY lvl, rk, nation, priority""".stripMargin,

    // q21 shape: per-supplier counts split around a pivot date with
    // FILTER, keeping suppliers whose late share exceeds a band.
    "qds_q21_pivot_date" ->
      """SELECT s_name, count(*) AS n_lines,
        |  count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-07-01 00:00:00') AS n_after,
        |  count(*) FILTER (WHERE l_shipdate <  TIMESTAMP '1998-07-01 00:00:00') AS n_before
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |HAVING count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-07-01 00:00:00') * 2 > count(*)
        |ORDER BY s_name""".stripMargin,

    // q25 shape: three ROLES of the same fact joined — sold lines,
    // returned lines of the same (order, part), and the follow-up
    // purchase of the same part by the same customer.
    "qds_q25_three_role" ->
      """SELECT p_brand, count(*) AS n_chains,
        |  CAST(sum(CAST(floor(l2.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rebuy_cents
        |FROM lineitem l1
        |JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
        |JOIN lineitem l2 ON l1.l_partkey = l2.l_partkey AND l1.l_orderkey <> l2.l_orderkey
        |JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey AND o1.o_custkey = o2.o_custkey
        |JOIN part ON l1.l_partkey = p_partkey
        |WHERE l1.l_returnflag = 'R' AND o2.o_orderdate > o1.o_orderdate
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q49 shape: per-part return ratio as exact integer pair, DENSE_RANK
    // over the ratio, top band kept (rank ties preserved).
    "qds_q49_return_rank" ->
      """WITH t AS (
        |  SELECT p_brand,
        |    count(*) FILTER (WHERE l_returnflag = 'R') AS n_ret,
        |    count(*) AS n_all
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand)
        |SELECT p_brand, n_ret, n_all, rk FROM (
        |  SELECT p_brand, n_ret, n_all,
        |    dense_rank() OVER (ORDER BY CAST(n_ret AS DOUBLE) / n_all DESC) AS rk
        |  FROM t) x
        |WHERE rk <= 5 ORDER BY rk, p_brand""".stripMargin,

    // q54 shape: anchor event per customer (first purchase month) then
    // spend within the following 3 months — month arithmetic on an
    // integer year*12+month axis (portable, no interval types).
    "qds_q54_first_then_window" ->
      """WITH firsts AS (
        |  SELECT o_custkey,
        |    min(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12 +
        |        CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)) AS first_mo
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |JOIN firsts ON orders.o_custkey = firsts.o_custkey
        |JOIN customer ON c_custkey = orders.o_custkey
        |WHERE CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12 +
        |      CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)
        |      BETWEEN first_mo + 1 AND first_mo + 3
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q58 shape: one part's revenue across three period roles of the
    // same fact; keep parts where every period sits within 20% of the
    // three-period average (exact integer cross-multiplication).
    "qds_q58_balanced_periods" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      FILTER (WHERE EXTRACT(YEAR FROM l_shipdate) = 1997) AS BIGINT) AS c1,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      FILTER (WHERE EXTRACT(YEAR FROM l_shipdate) = 1998) AS BIGINT) AS c2,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |      FILTER (WHERE EXTRACT(YEAR FROM l_shipdate) = 1999) AS BIGINT) AS c3
        |  FROM lineitem
        |  WHERE EXTRACT(YEAR FROM l_shipdate) BETWEEN 1997 AND 1999
        |  GROUP BY l_partkey)
        |SELECT p_brand, count(*) AS n_balanced
        |FROM per JOIN part ON l_partkey = p_partkey
        |WHERE c1 IS NOT NULL AND c2 IS NOT NULL AND c3 IS NOT NULL
        |  AND 15 * c1 BETWEEN 4 * (c1 + c2 + c3) AND 6 * (c1 + c2 + c3)
        |  AND 15 * c2 BETWEEN 4 * (c1 + c2 + c3) AND 6 * (c1 + c2 + c3)
        |  AND 15 * c3 BETWEEN 4 * (c1 + c2 + c3) AND 6 * (c1 + c2 + c3)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q31 shape: per-(region, quarter) revenue, self-joined across
    // consecutive quarters, chained growth-ratio comparison between two
    // geographies' trajectories.
    "qds_q31_share_growth" ->
      """WITH rq AS (
        |  SELECT r_name, CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 2000
        |  GROUP BY r_name, EXTRACT(QUARTER FROM o_orderdate))
        |SELECT a.r_name, a.qtr AS q_prev, b.qtr AS q_cur,
        |  round(CAST(b.cents AS DOUBLE) / CAST(a.cents AS DOUBLE), 6) AS growth
        |FROM rq a JOIN rq b ON a.r_name = b.r_name AND b.qtr = a.qtr + 1
        |ORDER BY a.r_name, q_prev""".stripMargin,

    // q66 shape: 12 monthly FILTER sums pivoted into wide columns per
    // nation — the manual-pivot wide aggregate.
    "qds_q66_monthly_pivot" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 1) AS BIGINT) AS m1,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 2) AS BIGINT) AS m2,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 3) AS BIGINT) AS m3,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 4) AS BIGINT) AS m4,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 5) AS BIGINT) AS m5,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 6) AS BIGINT) AS m6,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 7) AS BIGINT) AS m7,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 8) AS BIGINT) AS m8,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 9) AS BIGINT) AS m9,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 10) AS BIGINT) AS m10,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 11) AS BIGINT) AS m11,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE EXTRACT(MONTH FROM o_orderdate) = 12) AS BIGINT) AS m12
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // q76 shape: channels UNION ALL'd with schema-aligned NULL-extended
    // columns, counted per (channel, reason-column-is-null) cell.
    "qds_q76_null_channels" ->
      """WITH u AS (
        |  SELECT 'store' AS channel, l_returnflag AS flag,
        |    CAST(NULL AS VARCHAR(20)) AS priority,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'catalog' AS channel, CAST(NULL AS VARCHAR(20)) AS flag,
        |    o_orderpriority AS priority,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT channel, coalesce(flag, '-') AS flag, coalesce(priority, '-') AS priority,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
        |FROM u GROUP BY channel, flag, priority
        |ORDER BY channel, flag, priority""".stripMargin,

    // q65 shape: parts trading BELOW a fraction of their brand's
    // average revenue — agg, re-agg to brand means, join back
    // (agg-over-agg + semi).  Fraction 0.9, not TPC-DS's 0.5: at
    // sf0.001 a part's revenue is a ~30-lineitem sum (rel. σ ≈ 18%),
    // so nothing sits 50% below its brand mean and the gate went
    // `pass EMPTY` there (round-16 de-EMPTY pass); 0.9 keeps ~30% of
    // parts at every rung while preserving the below-average shape.
    "qds_q65_below_avg" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |with_brand AS (
        |  SELECT p_brand, l_partkey, cents FROM per_part JOIN part ON l_partkey = p_partkey),
        |brand_avg AS (
        |  SELECT p_brand, CAST(sum(cents) AS DOUBLE) / count(*) AS avg_cents
        |  FROM with_brand GROUP BY p_brand)
        |SELECT w.p_brand, count(*) AS n_slow,
        |  CAST(sum(w.cents) AS BIGINT) AS slow_cents
        |FROM with_brand w JOIN brand_avg b ON w.p_brand = b.p_brand
        |WHERE CAST(w.cents AS DOUBLE) < 0.9 * b.avg_cents
        |GROUP BY w.p_brand ORDER BY w.p_brand""".stripMargin,

    // q30/q1 shape: correlated SCALAR subquery against the per-group
    // average of the same derived table — customers returning >1.2× the
    // average return volume of their nation.
    "qds_q30_vs_group_avg" ->
      """WITH cr AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY c_custkey, c_nationkey)
        |SELECT c_custkey, ret_cents
        |FROM cr a
        |WHERE CAST(ret_cents AS DOUBLE) > 1.2 * (
        |  SELECT avg(CAST(ret_cents AS DOUBLE)) FROM cr b
        |  WHERE b.c_nationkey = a.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    // q33/q56/q60 shape: the SAME dimension aggregated independently
    // over three channel slices, UNION ALL'd, then re-aggregated — the
    // agg-of-union-of-aggs tower.
    "qds_q33_channel_reagg" ->
      """WITH y1 AS (
        |  SELECT p_brand, CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1997 GROUP BY p_brand),
        |y2 AS (
        |  SELECT p_brand, CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1998 GROUP BY p_brand),
        |y3 AS (
        |  SELECT p_brand, CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM l_shipdate) = 1999 GROUP BY p_brand)
        |SELECT p_brand, count(*) AS n_channels, CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM (SELECT * FROM y1 UNION ALL SELECT * FROM y2 UNION ALL SELECT * FROM y3) u
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q37/q82 shape: price-band dim filter × date-range fact filter
    // with COUNT DISTINCT over the join.  The band is ±10% around the
    // MEAN retail price in integer cents, expressed with CROSS-
    // MULTIPLIED edges (cents·10·count vs sum·9..sum·11) so neither
    // engine ever divides (Spark `/` on integers is double-truncate,
    // DuckDB's is double-round — the SKILL.md class) — a fixed
    // 920–960 band went `pass EMPTY` at sf0.001 (round-16 de-EMPTY
    // pass); a mean-relative band selects ~15% of parts on any corpus.
    // Magnitudes: cents·10·|part| < 2e6·|part|, sum·11 < 2e6·|part| —
    // both under 2^63 far past SF100.
    "qds_q37_price_band" ->
      """SELECT p_brand, count(DISTINCT p_partkey) AS n_parts, count(*) AS n_lines
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE CAST(floor(p_retailprice * 100) AS BIGINT) * 10
        |      * (SELECT count(*) FROM part)
        |    BETWEEN (SELECT sum(CAST(floor(p_retailprice * 100) AS BIGINT))
        |             FROM part) * 9
        |        AND (SELECT sum(CAST(floor(p_retailprice * 100) AS BIGINT))
        |             FROM part) * 11
        |  AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-03-31 00:00:00'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q41 shape: dimension-only query with a DISTINCT over a deep
    // OR-of-ANDs predicate tree.
    "qds_q41_predicate_tree" ->
      """SELECT DISTINCT p_name FROM part
        |WHERE p_brand LIKE 'Brand#1%'
        |  AND ((p_type IN ('ECONOMY', 'PROMO') AND p_size BETWEEN 1 AND 15)
        |    OR (p_type IN ('SMALL', 'MEDIUM') AND p_size BETWEEN 20 AND 35)
        |    OR (p_type = 'STANDARD' AND p_size >= 40))
        |ORDER BY p_name LIMIT 50""".stripMargin,

    // q44 shape: best and worst performers via two opposite-direction
    // rank subqueries JOINED ON RANK.
    "qds_q44_best_worst" ->
      """WITH perf AS (
        |  SELECT l_suppkey AS sk,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY l_suppkey),
        |b AS (SELECT sk, row_number() OVER (ORDER BY cents DESC, sk) AS rk FROM perf),
        |w AS (SELECT sk, row_number() OVER (ORDER BY cents ASC, sk) AS rk FROM perf)
        |SELECT b.rk AS rk, s1.s_name AS best_name, s2.s_name AS worst_name
        |FROM b JOIN w ON b.rk = w.rk
        |JOIN supplier s1 ON b.sk = s1.s_suppkey
        |JOIN supplier s2 ON w.sk = s2.s_suppkey
        |WHERE b.rk <= 10 ORDER BY rk""".stripMargin,

    // q45 shape: DISJUNCTIVE membership — a plain predicate OR'd with
    // an IN-subquery (decorrelation inside a disjunction).
    "qds_q45_disjunctive_in" ->
      """SELECT c_mktsegment AS segment, count(*) AS n
        |FROM customer
        |WHERE c_custkey % 10 IN (3, 7)
        |   OR c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q48 shape: one scan under a wide OR-of-ANDs band matrix spanning
    // dim and fact columns.
    "qds_q48_band_matrix" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_type = 'ECONOMY'  AND l_quantity BETWEEN 1 AND 15
        |        AND l_discount BETWEEN 0.02 AND 0.06)
        |   OR (p_type = 'STANDARD' AND l_quantity BETWEEN 16 AND 35
        |        AND l_discount BETWEEN 0.04 AND 0.08)
        |   OR (p_type = 'PROMO'    AND l_quantity BETWEEN 36 AND 50
        |        AND l_discount BETWEEN 0.00 AND 0.04)""".stripMargin,

    // q75 shape: year-over-year DECLINE report at brand grain — two
    // year slices of the same per-brand aggregate diff-joined.
    "qds_q75_yoy_decline" ->
      """WITH y AS (
        |  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |    count(*) AS n,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM l_shipdate) IN (1999, 2000)
        |  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate))
        |SELECT a.p_brand, a.n AS n_prev, b.n AS n_cur,
        |  a.cents AS cents_prev, b.cents AS cents_cur
        |FROM y a JOIN y b ON a.p_brand = b.p_brand
        |WHERE a.yr = 1999 AND b.yr = 2000 AND b.cents < a.cents
        |ORDER BY a.p_brand""".stripMargin,

    // q99 shape: order→ship lag banded into a FILTER crosstab per
    // priority (lag on a portable integer month axis).
    "qds_q99_lag_bands" ->
      """WITH t AS (
        |  SELECT o_orderpriority,
        |    (CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) * 12 +
        |     CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT)) -
        |    (CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12 +
        |     CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT)) AS lag_mo
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority,
        |  count(*) FILTER (WHERE lag_mo <= 0) AS m0,
        |  count(*) FILTER (WHERE lag_mo = 1) AS m1,
        |  count(*) FILTER (WHERE lag_mo = 2) AS m2,
        |  count(*) FILTER (WHERE lag_mo >= 3) AS m3plus
        |FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // q46/q68 shape: attribute MISMATCH between two roles of the same
    // dimension — customer's nation differs from supplier's nation on
    // the same line (cross-role inequality as a join residual).
    "qds_q46_attr_mismatch" ->
      """SELECT n1.n_name AS cust_nation, count(*) AS n_cross,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY n1.n_name ORDER BY cust_nation""".stripMargin,

    // q59 shape: day-bucket revenue matrix per year, self-joined across
    // two consecutive years at the bucket grain (the weekday-matrix
    // period-over-period diff join, on a dialect-portable
    // day-of-month%7 axis — Spark and DuckDB number weekdays
    // differently).
    "qds_q59_weekday_yoy" ->
      """WITH wk AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |    CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) % 7 AS dbucket,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1999, 2000)
        |  GROUP BY EXTRACT(YEAR FROM o_orderdate), CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) % 7)
        |SELECT a.dbucket, a.cents AS cents_prev, b.cents AS cents_cur,
        |  round(CAST(b.cents AS DOUBLE) / CAST(a.cents AS DOUBLE), 6) AS ratio
        |FROM wk a JOIN wk b ON a.dbucket = b.dbucket
        |WHERE a.yr = 1999 AND b.yr = 2000
        |ORDER BY a.dbucket""".stripMargin,

    // q24 shape: per-group HAVING against a scalar threshold derived
    // from the WHOLE aggregate (sum > 5% of the global per-group mean).
    "qds_q24_vs_global_scalar" ->
      """WITH per AS (
        |  SELECT c_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |SELECT c_custkey, cents FROM per
        |WHERE CAST(cents AS DOUBLE) > 1.5 * (SELECT avg(CAST(cents AS DOUBLE)) FROM per)
        |ORDER BY c_custkey""".stripMargin,

    // q69 shape: present in one channel, ABSENT from two others —
    // EXISTS plus a conjunction of NOT EXISTS over different slices.
    "qds_q69_demographic_anti" ->
      """SELECT c_mktsegment AS segment, count(*) AS n
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND EXTRACT(YEAR FROM o_orderdate) = 2000)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT'
        |                  AND EXTRACT(YEAR FROM o_orderdate) = 2000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  JOIN lineitem ON l_orderkey = o2.o_orderkey
        |                  WHERE o2.o_custkey = c_custkey AND l_returnflag = 'R'
        |                  AND EXTRACT(YEAR FROM o2.o_orderdate) = 2000)
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin,

    // q8 shape: substring-derived key matched against BOTH a literal
    // list and an IN-subquery INTERSECTION of the two sets.
    "qds_q8_substr_sets" ->
      """SELECT c_mktsegment AS segment, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE substr(c_name, 18, 1) IN ('1', '3', '5', '7')
        |  AND c_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY segment""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
