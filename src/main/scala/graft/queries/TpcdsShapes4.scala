package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS-SHAPE battery, fourth tranche — the final 13 queries of the
  * reference corpus (`sql/core/src/test/resources/tpcds/`,
  * `TPCDSQuerySuite.scala:319`) not yet mapped by
  * [[TpcdsShapes]]/[[TpcdsShapes2]]/[[TpcdsShapes3]].  With these the
  * 99-query corpus is covered family-by-family:
  *
  *  - three-channel 6-way year_total self-join              (q4)
  *  - EXISTS AND (EXISTS OR EXISTS) demographic counts      (q10)
  *  - class-share window over aggregate, web slice          (q12)
  *  - class-share window over aggregate, catalog slice      (q20)
  *  - ROLLUP of averages with grouping() projection         (q27)
  *  - composite-key LEFT JOIN returns, before/after pivot   (q40)
  *  - quarterly deviation-from-partition-mean filter        (q53)
  *  - monthly deviation-from-partition-mean filter          (q63)
  *  - per-channel returns CTEs + ROLLUP over their union    (q80)
  *  - correlated scalar vs state average of returns CTE     (q81)
  *  - income-band VALUES join through the dim chain         (q84)
  *  - dual-role dimension with cross-role equality bands    (q85)
  *  - rank-within-parent over ROLLUP grouping level         (q86)
  *
  * Same contract as the earlier tranches: identical text on Spark and
  * DuckDB, money as exact integer cents, rollup NULLs coalesced to
  * sentinels, deterministic ORDER BY with unique tiebreaks.
  */
object TpcdsShapes4 {
  type Q = (SparkSession, String) => DataFrame

  private val sql: Map[String, String] = Map(
    // q4 shape: per-customer year totals in THREE channels (the three
    // l_returnflag slices stand in for store/catalog/web), six
    // instances of the CTE joined on customer, keeping customers whose
    // 'N'-channel growth outruns both other channels.
    "qds_q4_three_channel_yoy" ->
      """WITH year_total AS (
        |  SELECT o_custkey AS ck, l_returnflag AS channel,
        |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE EXTRACT(YEAR FROM l_shipdate) IN (1996, 1997)
        |  GROUP BY o_custkey, l_returnflag, EXTRACT(YEAR FROM l_shipdate))
        |SELECT s2.ck AS ck, s2.cents AS s_cents, c2.cents AS c_cents, w2.cents AS w_cents
        |FROM year_total s1 JOIN year_total s2 ON s1.ck = s2.ck
        |  JOIN year_total c1 ON s1.ck = c1.ck
        |  JOIN year_total c2 ON s1.ck = c2.ck
        |  JOIN year_total w1 ON s1.ck = w1.ck
        |  JOIN year_total w2 ON s1.ck = w2.ck
        |WHERE s1.channel = 'A' AND s2.channel = 'A'
        |  AND c1.channel = 'N' AND c2.channel = 'N'
        |  AND w1.channel = 'R' AND w2.channel = 'R'
        |  AND s1.yr = 1996 AND s2.yr = 1997
        |  AND c1.yr = 1996 AND c2.yr = 1997
        |  AND w1.yr = 1996 AND w2.yr = 1997
        |  AND s1.cents > 0 AND c1.cents > 0 AND w1.cents > 0
        |  AND CAST(c2.cents AS DOUBLE) / CAST(c1.cents AS DOUBLE)
        |      > CAST(s2.cents AS DOUBLE) / CAST(s1.cents AS DOUBLE)
        |  AND CAST(c2.cents AS DOUBLE) / CAST(c1.cents AS DOUBLE)
        |      > CAST(w2.cents AS DOUBLE) / CAST(w1.cents AS DOUBLE)
        |ORDER BY ck LIMIT 100""".stripMargin,

    // q10 shape: demographic counts for customers active in the
    // primary channel AND in at least one of two secondary channels —
    // EXISTS conjoined with a disjunction of two more EXISTS.
    "qds_q10_exists_and_or" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS cnt1, count(*) AS cnt2
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
        |  AND (EXISTS (SELECT 1 FROM orders
        |               WHERE o_custkey = c.c_custkey AND o_orderpriority = '2-HIGH')
        |    OR EXISTS (SELECT 1 FROM orders
        |               WHERE o_custkey = c.c_custkey AND o_orderpriority = '3-MEDIUM'))
        |GROUP BY c_mktsegment, c_nationkey
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // q12 shape: 30-day band scan, revenue share of the item's class
    // taken as a window over the aggregate (web slice: returnflag 'A').
    "qds_q12_class_share" ->
      """SELECT p_type, p_brand,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(round(
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) * 100
        |    / CAST(sum(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)))
        |           OVER (PARTITION BY p_type) AS DOUBLE), 4) AS DOUBLE) AS revenueratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'A'
        |  AND l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-03-31 00:00:00'
        |GROUP BY p_type, p_brand
        |ORDER BY p_type, p_brand""".stripMargin,

    // q20 shape: the catalog twin of q12 — different slice, different
    // partition dimension, share within brand.
    "qds_q20_brand_share" ->
      """SELECT p_brand, p_size,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(round(
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) * 100
        |    / CAST(sum(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)))
        |           OVER (PARTITION BY p_brand) AS DOUBLE), 4) AS DOUBLE) AS revenueratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'N'
        |  AND l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY p_brand, p_size
        |ORDER BY p_brand, p_size""".stripMargin,

    // q27 shape: ROLLUP over (item, geography) of FOUR averages with
    // the grouping() bit projected, under a demographic filter.
    "qds_q27_rollup_avgs" ->
      """SELECT coalesce(p_brand, 'ALL') AS brand, coalesce(c_mktsegment, 'ALL') AS seg,
        |  grouping(c_mktsegment) AS g_seg,
        |  CAST(round(avg(l_quantity), 4) AS DOUBLE) AS agg1,
        |  CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS agg2,
        |  CAST(round(avg(CAST(floor(l_discount * 100) AS BIGINT)), 4) AS DOUBLE) AS agg3,
        |  CAST(round(avg(CAST(floor(l_tax * 100) AS BIGINT)), 4) AS DOUBLE) AS agg4,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN part ON l_partkey = p_partkey
        |WHERE o_orderpriority = '1-URGENT' AND p_size <= 12
        |GROUP BY ROLLUP (p_brand, c_mktsegment)
        |ORDER BY brand, seg""".stripMargin,

    // q40 shape: fact LEFT OUTER JOIN its returns on a COMPOSITE key
    // (order, linenumber), net-of-returns sums pivoted before/after a
    // pivot date.  'R' rows match themselves (net 0), mirroring how a
    // returned sale nets out in the reference.
    "qds_q40_before_after" ->
      """WITH r AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS ret_cents
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_nationkey,
        |  CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(floor(l_extendedprice * 100) AS BIGINT) - coalesce(ret_cents, 0)
        |    ELSE 0 END) AS BIGINT) AS sales_before,
        |  CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    THEN CAST(floor(l_extendedprice * 100) AS BIGINT) - coalesce(ret_cents, 0)
        |    ELSE 0 END) AS BIGINT) AS sales_after
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  LEFT JOIN r ON l_orderkey = r.ok AND l_linenumber = r.ln
        |WHERE l_shipdate >= TIMESTAMP '1997-12-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,

    // q53 shape: per-brand quarterly sums kept only where they deviate
    // >10% from the brand mean; the deviation test is exact-integer
    // cross-multiplication (10·|sum·n − total| > total), no FP drift.
    "qds_q53_quarter_deviation" ->
      """WITH t AS (
        |  SELECT p_brand AS brand, CAST(EXTRACT(QUARTER FROM l_shipdate) AS INT) AS qoy,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 8
        |  GROUP BY p_brand, EXTRACT(QUARTER FROM l_shipdate)),
        |w AS (
        |  SELECT brand, qoy, sum_cents,
        |    CAST(sum(sum_cents) OVER (PARTITION BY brand) AS BIGINT) AS total_cents,
        |    count(*) OVER (PARTITION BY brand) AS n_q
        |  FROM t)
        |SELECT brand, qoy, sum_cents,
        |  CAST(floor((2.0 * total_cents + n_q) / (2 * n_q)) AS DOUBLE) / 100 AS avg_quarterly
        |FROM w
        |WHERE total_cents > 0 AND 10 * abs(sum_cents * n_q - total_cents) > total_cents
        |ORDER BY brand, qoy""".stripMargin,

    // q63 shape: the monthly twin of q53 over the supplier dimension —
    // per-nation monthly sums vs the nation mean, same exact-integer
    // deviation filter.
    "qds_q63_month_deviation" ->
      """WITH t AS (
        |  SELECT s_nationkey AS nk, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS moy,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE l_returnflag = 'A'
        |  GROUP BY s_nationkey, EXTRACT(MONTH FROM l_shipdate)),
        |w AS (
        |  SELECT nk, moy, sum_cents,
        |    CAST(sum(sum_cents) OVER (PARTITION BY nk) AS BIGINT) AS total_cents,
        |    count(*) OVER (PARTITION BY nk) AS n_m
        |  FROM t)
        |SELECT nk, moy, sum_cents
        |FROM w
        |WHERE total_cents > 0 AND 50 * abs(sum_cents * n_m - total_cents) > total_cents
        |ORDER BY nk, moy""".stripMargin,

    // q80 shape: one returns CTE, three channel CTEs (priority slices)
    // each LEFT JOINing it, UNION ALL'd and rolled up over
    // (channel, id) with sales/returns/profit columns.
    "qds_q80_channel_returns" ->
      """WITH r AS (
        |  SELECT l_orderkey AS ok,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_cents
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
        |ch1 AS (
        |  SELECT c_nationkey AS id,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sales,
        |    CAST(sum(coalesce(ret_cents, 0)) AS BIGINT) AS returns,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) - coalesce(ret_cents, 0)) AS BIGINT) AS profit
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    LEFT JOIN r ON o_orderkey = r.ok
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY c_nationkey),
        |ch2 AS (
        |  SELECT c_nationkey AS id,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sales,
        |    CAST(sum(coalesce(ret_cents, 0)) AS BIGINT) AS returns,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) - coalesce(ret_cents, 0)) AS BIGINT) AS profit
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    LEFT JOIN r ON o_orderkey = r.ok
        |  WHERE o_orderpriority = '2-HIGH' GROUP BY c_nationkey),
        |ch3 AS (
        |  SELECT c_nationkey AS id,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sales,
        |    CAST(sum(coalesce(ret_cents, 0)) AS BIGINT) AS returns,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) - coalesce(ret_cents, 0)) AS BIGINT) AS profit
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    LEFT JOIN r ON o_orderkey = r.ok
        |  WHERE o_orderpriority = '5-LOW' GROUP BY c_nationkey)
        |SELECT coalesce(channel, 'ALL') AS channel, coalesce(id, -1) AS id,
        |  CAST(sum(sales) AS BIGINT) AS sales,
        |  CAST(sum(returns) AS BIGINT) AS returns,
        |  CAST(sum(profit) AS BIGINT) AS profit
        |FROM (
        |  SELECT 'urgent channel' AS channel, id, sales, returns, profit FROM ch1
        |  UNION ALL
        |  SELECT 'high channel' AS channel, id, sales, returns, profit FROM ch2
        |  UNION ALL
        |  SELECT 'low channel' AS channel, id, sales, returns, profit FROM ch3) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel, id""".stripMargin,

    // q81 shape: the catalog-returns twin of q30 — per-(customer,
    // nation) return totals incl. tax, one nation slice, customers
    // above 1.2× their nation's average, customer detail joined in.
    "qds_q81_state_return_avg" ->
      """WITH ctr AS (
        |  SELECT o_custkey AS ck, c_nationkey AS nk,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS total
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey, c_nationkey)
        |SELECT c_custkey, c_name, c_mktsegment, total
        |FROM ctr ctr1 JOIN customer ON ctr1.ck = c_custkey
        |WHERE ctr1.nk = 7
        |  AND CAST(total AS DOUBLE) > 1.2 * (
        |    SELECT avg(CAST(total AS DOUBLE)) FROM ctr ctr2 WHERE ctr2.nk = ctr1.nk)
        |ORDER BY c_custkey""".stripMargin,

    // q84 shape: income-band VALUES table joined through the dimension
    // chain (customer → nation → region → band) with a returns-presence
    // semi join and the concat'd display name.
    "qds_q84_income_band" ->
      """SELECT c_custkey, concat(c_name, ', ', n_name) AS customername
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN (SELECT * FROM (VALUES (1, 0.0, 3000.0), (2, 3000.0, 6000.0),
        |                              (3, 6000.0, 10000.0)) AS v(band_id, lo, hi)) bands
        |    ON c_acctbal >= lo AND c_acctbal < hi
        |  JOIN (SELECT DISTINCT o_custkey AS rk
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |        WHERE l_returnflag = 'R') ret ON rk = c_custkey
        |WHERE r_name = 'ASIA' AND band_id = 2
        |ORDER BY c_custkey LIMIT 100""".stripMargin,

    // q85 shape: the SAME dimension in two roles (customer nation vs
    // supplier nation) with cross-role equality inside an OR-of-ANDs
    // band tree, a second independent band tree, and averaged outputs.
    "qds_q85_dual_role_bands" ->
      """SELECT o_orderpriority,
        |  CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
        |  CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_3' AND n1.n_name = n2.n_name
        |        AND l_extendedprice BETWEEN 1000 AND 20000)
        |    OR (n1.n_name = 'NATION_8' AND n1.n_name = n2.n_name
        |        AND l_extendedprice BETWEEN 500 AND 15000)
        |    OR (n1.n_name = 'NATION_14' AND n1.n_name = n2.n_name
        |        AND l_extendedprice BETWEEN 200 AND 10000))
        |  AND ((n1.n_regionkey IN (0, 1) AND l_quantity BETWEEN 1 AND 25)
        |    OR (n1.n_regionkey IN (2, 3) AND l_quantity BETWEEN 10 AND 40)
        |    OR (n1.n_regionkey = 4 AND l_quantity BETWEEN 5 AND 50))
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // q86 shape: ROLLUP with lochierarchy = grouping(a)+grouping(b) and
    // rank() WITHIN THE PARENT partition (grouping level × parent
    // category), materialized in a CTE so the window runs over plain
    // columns on both engines.
    "qds_q86_rank_within_parent" ->
      """WITH r AS (
        |  SELECT coalesce(p_type, 'ALL') AS ptype, coalesce(p_brand, 'ALL') AS brand,
        |    grouping(p_type) + grouping(p_brand) AS lochierarchy,
        |    CASE WHEN grouping(p_brand) = 0 THEN p_type END AS parent,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_returnflag = 'N'
        |  GROUP BY ROLLUP (p_type, p_brand))
        |SELECT total_cents, ptype, brand, lochierarchy,
        |  rank() OVER (PARTITION BY lochierarchy, parent
        |               ORDER BY total_cents DESC, brand) AS rank_within_parent
        |FROM r
        |ORDER BY lochierarchy DESC, ptype, rank_within_parent, brand""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
