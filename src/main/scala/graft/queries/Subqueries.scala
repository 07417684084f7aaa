package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery battery — exercises Catalyst's decorrelation rewrites
  * (SURVEY.md §4.1: `PullupCorrelatedPredicates`,
  * `RewriteCorrelatedScalarSubquery`, `RewritePredicateSubquery` in the
  * reference's `optimizer/subquery.scala`) through TPC-H Q12/Q14/Q16/
  * Q17/Q22 shapes.  Each runs as SQL text via spark.sql so the full
  * parse → analyze → decorrelate → plan path executes; the identical
  * ANSI text is the DuckDB oracle.
  */
object Subqueries {
  type Q = (SparkSession, String) => DataFrame

  /** SQL dialect subset accepted verbatim by both Spark and DuckDB. */
  private val sqlTexts: Map[String, String] = Map(
    // Q12 shape: conditional two-way counts by priority class.
    "q12_shipmode" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // Q14 shape: conditional revenue ratio (promo share); ratio taken
    // over exact decimal sums cast to double so both engines divide the
    // same IEEE values.
    "q14_promo_share" ->
      """SELECT CAST(round(
        |    100.00 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |      ELSE CAST(0 AS DECIMAL(26,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE),
        |  6) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,

    // Q16 shape: NOT IN subquery + grouped distinct count.
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT s_suppkey) AS supplier_cnt
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |WHERE p_size IN (1, 5, 9, 13)
        |  AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    // Q17 shape: correlated scalar subquery (per-part average).
    "q17_small_quantity" ->
      """SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // Q22 shape: balance above uncorrelated global average + anti join.
    "q22_global_sales" ->
      """SELECT cntry, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM (SELECT c_custkey, (c_nationkey % 10) AS cntry, c_acctbal FROM customer) c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY cntry ORDER BY cntry""".stripMargin,

    // Correlated NOT EXISTS with an inequality (non-equi correlation).
    "q_corr_exists" ->
      """SELECT s_nationkey, count(*) AS n_top
        |FROM supplier s1
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM supplier s2
        |  WHERE s2.s_nationkey = s1.s_nationkey AND s2.s_acctbal > s1.s_acctbal)
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // Q7 shape: volume between two nation CLASSES by year — the
    // symmetric two-conjunction disjunction is Q7's decorrelation
    // shape; the classes are nationkey PARITIES instead of two fixed
    // keys because fixed keys made the gate `pass EMPTY` at sf0.001,
    // where only 10 of 25 nations have any supplier (round-16
    // de-EMPTY pass — parity classes are populated on every corpus by
    // construction, and the output stays bounded at ≤ 25×25×years
    // groups).
    "q07_volume_shipping" ->
      """SELECT supp_nation, cust_nation, yr,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT s_nationkey AS supp_nation, c_nationkey AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS yr,
        |    l_extendedprice, l_discount
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |  WHERE ((s_nationkey % 2 = 0 AND c_nationkey % 2 = 1)
        |      OR (s_nationkey % 2 = 1 AND c_nationkey % 2 = 0))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, yr
        |ORDER BY supp_nation, cust_nation, yr""".stripMargin,

    // Q8 shape: market share of one supplier nation inside a region's
    // customers, per year (conditional numerator over total).
    "q08_market_share" ->
      """SELECT yr,
        |  CAST(round(
        |    CAST(sum(CASE WHEN supp_nation = 3 THEN vol ELSE CAST(0 AS DECIMAL(26,4)) END) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr, s_nationkey AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS vol
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY yr ORDER BY yr""".stripMargin,

    // Q15 shape: top supplier by revenue via CTE + scalar-subquery max.
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    // Q19 shape: disjunctive multi-branch predicate (OR of ANDs with IN).
    "q19_discounted_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand IN ('Brand#33', 'Brand#34') AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    // Uncorrelated IN-subquery.
    "q_in_subquery" ->
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)

  val queries: Map[String, Q] = sqlTexts.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      graft.Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sqlTexts
}
