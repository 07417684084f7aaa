package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS-SHAPE battery, second tranche — the structural families from
  * the reference corpus (`sql/core/src/test/resources/tpcds/`,
  * `TPCDSQuerySuite.scala:319`) not yet mirrored by [[TpcdsShapes]]:
  *
  *  - week-over-week cross-year sum self-join                 (q2)
  *  - correlated scalar avg on a NON-KEY attribute            (q6)
  *  - CASE choosing between scalar subqueries per band        (q9)
  *  - distinct-count under EXISTS(other-row) + NOT EXISTS     (q16 / q94)
  *  - equi-join star with a non-equi residual mismatch        (q19)
  *  - N disjoint-band scalar aggregates cross-joined          (q28)
  *  - excess-value filter vs correlated same-fact average     (q32 / q92)
  *  - ratio of two independently-filtered global aggregates   (q61)
  *  - union of typed fact slices re-aggregated by hour        (q71)
  *  - tri-symmetric slices sharing one IN-subquery set        (q83)
  *  - time-band count ratio in one row                        (q90)
  *
  * Same rules as [[TpcdsShapes]]: the SAME SQL text runs on Spark and
  * DuckDB, money aggregates as integer cents, ratios divide exact
  * integers in double precision, every output is deterministically
  * ordered.
  */
object TpcdsShapes2 {
  type Q = (SparkSession, String) => DataFrame

  /** name -> dialect-common SQL (runs verbatim on Spark AND DuckDB). */
  private val sql: Map[String, String] = Map(
    // q2 shape: weekly sums computed once, self-joined across adjacent
    // years on the week bucket.  At scale the CTE aggregates before the
    // join, so the self-join carries ~52 rows per year, not the fact.
    // Week = floor((doy-1)/7) — identical arithmetic on both engines
    // (ISO-week boundaries differ in edge years, so derive from DOY).
    "qds_q2_week_yoy" ->
      """WITH w AS (
        |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        |         CAST(floor((EXTRACT(DOY FROM l_shipdate) - 1) / 7) AS INT) AS wk,
        |         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT a.wk, a.cents AS c1996, b.cents AS c1997,
        |  CAST(round(CAST(b.cents AS DOUBLE) / a.cents, 6) AS DOUBLE) AS wow
        |FROM w a JOIN w b ON a.wk = b.wk
        |WHERE a.yr = 1996 AND b.yr = 1997
        |ORDER BY a.wk""".stripMargin,

    // q6 shape: customers above 1.2× the average balance of their OWN
    // market segment — the correlation key (c_mktsegment) is a non-key
    // attribute, so decorrelation must introduce a grouped aggregate,
    // not a semi-join.
    "qds_q6_above_segment_avg" ->
      """SELECT c_nationkey, count(*) AS n_rich
        |FROM customer c
        |WHERE c_acctbal > 1.2 * (SELECT avg(c2.c_acctbal) FROM customer c2
        |                         WHERE c2.c_mktsegment = c.c_mktsegment)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    // q9 shape: a single-row SELECT whose columns are CASE expressions
    // choosing BETWEEN two scalar subqueries based on a third — five
    // independent scalar plans per band that the optimizer can reuse
    // across branches.  Averages divide exact integer-cent sums.
    "qds_q9_case_scalar_bands" ->
      """SELECT
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) > 1000
        |       THEN (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 1 AND 15)
        |       ELSE (SELECT CAST(round(avg(CAST(floor(l_tax * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 1 AND 15) END AS band1,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 16 AND 30) > 1000
        |       THEN (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 16 AND 30)
        |       ELSE (SELECT CAST(round(avg(CAST(floor(l_tax * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 16 AND 30) END AS band2,
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 45) > 1000000
        |       THEN (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 31 AND 45)
        |       ELSE (SELECT CAST(round(avg(CAST(floor(l_tax * 100) AS BIGINT)), 2) AS DOUBLE)
        |             FROM lineitem WHERE l_quantity BETWEEN 31 AND 45) END AS band3""".stripMargin,

    // q16/q94 shape: orders shipped by MORE than one supplier (EXISTS
    // against another row of the same fact, correlated on the outer
    // ROW not just the key) with no returned lines (NOT EXISTS), and a
    // COUNT(DISTINCT) on top of the semi/anti-filtered join.
    "qds_q16_multi_supplier_clean" ->
      """SELECT count(DISTINCT l.l_orderkey) AS n_orders,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l.l_orderkey
        |                AND l2.l_suppkey <> l.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l.l_orderkey
        |                    AND l3.l_returnflag = 'R')""".stripMargin,

    // q19 shape: a 5-way equi-join star whose WHERE carries a residual
    // NON-EQUI mismatch predicate (customer and supplier in different
    // nations — the "ship-to zip differs from store zip" signature).
    "qds_q19_nation_mismatch" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |WHERE c_nationkey <> s_nationkey AND p_size <= 10
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q28 shape: six disjoint quantity bands, each an independent
    // (avg, count, count-distinct) scalar aggregate, cross-joined into
    // ONE row — six parallel scans the optimizer may not merge because
    // the filters are disjoint.
    "qds_q28_six_bands" ->
      """SELECT
        |  b1.avg_cents AS avg1, b1.n_parts AS parts1,
        |  b2.avg_cents AS avg2, b2.n_parts AS parts2,
        |  b3.avg_cents AS avg3, b3.n_parts AS parts3,
        |  b4.avg_cents AS avg4, b4.n_parts AS parts4,
        |  b5.avg_cents AS avg5, b5.n_parts AS parts5,
        |  b6.avg_cents AS avg6, b6.n_parts AS parts6
        |FROM
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 1 AND 8) b1,
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 9 AND 16) b2,
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 17 AND 24) b3,
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 25 AND 32) b4,
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 33 AND 40) b5,
        |  (SELECT CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |          count(DISTINCT l_partkey) AS n_parts
        |   FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) b6""".stripMargin,

    // q32/q92 shape: "excess discount" — keep fact rows whose discount
    // exceeds 1.3× the average discount of the SAME fact restricted to
    // the same part; the correlated aggregate scans the table being
    // filtered.
    "qds_q32_excess_discount" ->
      """SELECT count(*) AS n_excess,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 25
        |  AND l.l_discount > (SELECT 1.3 * avg(l2.l_discount) FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    // q61 shape: promotional revenue over total revenue — two
    // independently-filtered global aggregates joined into one row,
    // the ratio dividing exact integer cents.
    "qds_q61_promo_ratio" ->
      """SELECT promo.cents AS promo_cents, total.cents AS total_cents,
        |  CAST(round(CAST(promo.cents AS DOUBLE) / total.cents, 6) AS DOUBLE) AS promo_share
        |FROM
        |  (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |   FROM lineitem JOIN part ON l_partkey = p_partkey
        |   WHERE p_type LIKE 'PROMO%') promo,
        |  (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |   FROM lineitem) total""".stripMargin,

    // q71 shape: three typed slices of the event fact unioned, then
    // re-aggregated by hour-of-day across the union — each branch is an
    // independent pushed-down scan; the union never carries raw rows
    // past its own partial aggregate at scale.
    "qds_q71_hourly_union" ->
      """WITH ev AS (
        |  SELECT 'click' AS src, CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr, value
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT 'view', CAST(EXTRACT(HOUR FROM ts) AS INT), value
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT 'purchase', CAST(EXTRACT(HOUR FROM ts) AS INT), value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT hr, src, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM ev GROUP BY hr, src
        |ORDER BY hr, src""".stripMargin,

    // q83 shape: three symmetric return-flag slices, each restricted by
    // the SAME IN-subquery month set, combined into one row with the
    // three-way shares — the shared subquery should evaluate once.
    "qds_q83_tri_slices" ->
      """WITH mset AS (
        |  SELECT DISTINCT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |r AS (SELECT count(*) AS n FROM lineitem
        |      WHERE l_returnflag = 'R'
        |        AND CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) IN (SELECT m FROM mset)),
        |a AS (SELECT count(*) AS n FROM lineitem
        |      WHERE l_returnflag = 'A'
        |        AND CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) IN (SELECT m FROM mset)),
        |nf AS (SELECT count(*) AS n FROM lineitem
        |      WHERE l_returnflag = 'N'
        |        AND CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) IN (SELECT m FROM mset))
        |SELECT r.n AS r_n, a.n AS a_n, nf.n AS n_n,
        |  CAST(round(CAST(r.n AS DOUBLE) / (r.n + a.n + nf.n), 6) AS DOUBLE) AS r_share
        |FROM r, a, nf""".stripMargin,

    // q90 shape: morning/evening count ratio — two time-band counts of
    // the same fact in one row, dividing exact integers.
    "qds_q90_am_pm" ->
      """SELECT am.n AS am_n, pm.n AS pm_n,
        |  CAST(round(CAST(am.n AS DOUBLE) / pm.n, 6) AS DOUBLE) AS am_pm_ratio
        |FROM
        |  (SELECT count(*) AS n FROM events
        |   WHERE CAST(EXTRACT(HOUR FROM ts) AS INT) BETWEEN 6 AND 11) am,
        |  (SELECT count(*) AS n FROM events
        |   WHERE CAST(EXTRACT(HOUR FROM ts) AS INT) BETWEEN 18 AND 23) pm""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
