package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SSB-SHAPE battery: the Star-Schema-Benchmark query flights the
  * reference exercises through its 13-query SSB corpus (reference
  * `SSBQuerySuite.scala:33-75`), re-expressed on this repo's synthetic
  * star schema (lineitem fact; part/supplier/customer/nation/region
  * dims; orders carrying the order-date role of SSB's date dim).
  *
  *  - Q1.x  date + discount-band + quantity scan, no dim joins
  *  - Q2.x  fact ⋈ part ⋈ supplier-geography, (year, brand) grain
  *  - Q3.x  customer-geography × supplier-geography flows by year
  *  - Q4.1  profit (revenue − cost) by year × customer nation
  *  - Q4.3  profit drill-down to year × supplier nation × brand
  *
  * Same dialect-common SQL text runs verbatim on Spark AND DuckDB (the
  * oracle), money as exact integer cents (`floor(x*100)`), deterministic
  * ORDER BY on the unique grouping keys.
  *
  * Scale shape: every dim is broadcast-sized relative to the fact, so
  * the whole flight is fact-scan → broadcast joins → partial agg → one
  * exchange on the grouping keys (`SsbPlanSpec` asserts no fact
  * shuffle before aggregation).
  */
object SsbShapes {
  type Q = (SparkSession, String) => DataFrame

  /** name -> dialect-common SQL (runs verbatim on Spark AND DuckDB). */
  private val sql: Map[String, String] = Map(
    // Q1.x: pure fact scan under a date/discount/quantity band; the
    // revenue delta SSB defines as extendedprice*discount.  The filter
    // must reach the parquet scan (PushedFilters) — no joins at all.
    "qssb_q1_discount_revenue" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25
        |GROUP BY EXTRACT(YEAR FROM l_shipdate)
        |ORDER BY yr""".stripMargin,

    // Q2.x: (year, brand) revenue with the supplier side pinned to one
    // region and the part side to a type class.
    "qssb_q2_brand_year" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, p_brand,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_type IN ('ECONOMY', 'PROMO')
        |GROUP BY EXTRACT(YEAR FROM l_shipdate), p_brand
        |ORDER BY yr, p_brand""".stripMargin,

    // Q3.x: trade flows customer-nation × supplier-nation × year with
    // both geographies restricted to one region — nation and region
    // each join TWICE in different roles.
    "qssb_q3_nation_flows" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |WHERE r1.r_name = 'EUROPE' AND r2.r_name = 'EUROPE'
        |  AND EXTRACT(YEAR FROM l_shipdate) BETWEEN 1996 AND 1998
        |GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
        |ORDER BY cust_nation, supp_nation, yr""".stripMargin,

    // Q4.1: profit = revenue − supply-cost proxy (90% of retail, in
    // cents), year grain taken from the ORDER date (SSB's date dim
    // role), customer geography pinned to one region.
    "qssb_q4_profit" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  n1.n_name AS cust_nation,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |         - CAST(floor(l_quantity * p_retailprice * 90) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        |JOIN part      ON l_partkey = p_partkey
        |WHERE r1.r_name = 'AMERICA'
        |GROUP BY EXTRACT(YEAR FROM o_orderdate), n1.n_name
        |ORDER BY yr, cust_nation""".stripMargin,

    // Q4.3: profit drill-down to (year, supplier nation, brand) with
    // supplier geography + part-type selectivity.
    "qssb_q4_drill" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  n2.n_name AS supp_nation, p_brand, count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |         - CAST(floor(l_quantity * p_retailprice * 90) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |JOIN part      ON l_partkey = p_partkey
        |WHERE r2.r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1997 AND 1999
        |GROUP BY EXTRACT(YEAR FROM o_orderdate), n2.n_name, p_brand
        |ORDER BY yr, supp_nation, p_brand""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
