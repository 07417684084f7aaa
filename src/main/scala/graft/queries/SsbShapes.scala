package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SSB-SHAPE battery: the Star-Schema-Benchmark query flights the
  * reference exercises through its 13-query SSB corpus (reference
  * `SSBQuerySuite.scala:33-75`), re-expressed on this repo's synthetic
  * star schema (lineitem fact; part/supplier/customer/nation/region
  * dims; orders carrying the order-date role of SSB's date dim).
  *
  *  - Q1.1-1.3  date/discount/quantity bands, no dim joins (year,
  *              month, week grains)
  *  - Q2.1-2.3  fact ⋈ part ⋈ supplier-geography, (year, brand) grain
  *              at type-class / brand-range / single-brand selectivity
  *  - Q3.1-3.4  customer-geography × supplier-geography flows (region,
  *              nation-pair, directional, single-month variants)
  *  - Q4.1-4.3  profit (revenue − cost): customer-nation breadth,
  *              double-geography type grain, supplier-nation drill-down
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

    // Q1.2: month-grain band — one calendar month, tighter discount and
    // a quantity WINDOW (SSB's between-26-and-35), still join-free.
    "qssb_q1_month" ->
      """SELECT CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        |  AND l_discount BETWEEN 0.04 AND 0.06
        |  AND l_quantity BETWEEN 26 AND 35
        |GROUP BY EXTRACT(MONTH FROM l_shipdate)
        |ORDER BY mo""".stripMargin,

    // Q1.3: narrowest band — first week of one month of one year (day
    // arithmetic, portable across both engines' EXTRACT).
    "qssb_q1_week" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        |  AND EXTRACT(MONTH FROM l_shipdate) = 6
        |  AND EXTRACT(DAY FROM l_shipdate) BETWEEN 1 AND 7
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35""".stripMargin,

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

    // Q2.2: brand-RANGE selectivity (between two brands) on a different
    // supplier region — same (year, brand) grain as Q2.1.
    "qssb_q2_brand_range" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, p_brand,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND p_brand BETWEEN 'Brand#3' AND 'Brand#6'
        |GROUP BY EXTRACT(YEAR FROM l_shipdate), p_brand
        |ORDER BY yr, p_brand""".stripMargin,

    // Q2.3: single-brand pin — the most selective Q2 flight.
    "qssb_q2_brand_pin" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr, p_brand,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'MIDDLE EAST' AND p_brand = 'Brand#7'
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

    // Q3.2: flows at NATION-pair selectivity (two named nations instead
    // of a region), year grain.
    "qssb_q3_nation_pair" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_3', 'NATION_8')
        |  AND n2.n_name IN ('NATION_3', 'NATION_8')
        |  AND EXTRACT(YEAR FROM l_shipdate) BETWEEN 1996 AND 1998
        |GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
        |ORDER BY cust_nation, supp_nation, yr""".stripMargin,

    // Q3.3: asymmetric nation sets — customer side and supplier side
    // pinned to DIFFERENT (independently derived) two-nation sets.
    // The sets are DATA-DERIVED (each side's two most-populous
    // nations, count-desc + name tiebreak — deterministic IN-subquery
    // picks): fixed names went `pass EMPTY` at sf0.001, where neither
    // NATION_2 nor NATION_9 has a single supplier (round-16 de-EMPTY
    // pass).  The derivation is per-SIDE (customer census vs supplier
    // census), so the sets stay asymmetric in role even when they
    // overlap in membership on some corpus.
    "qssb_q3_directional" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN (SELECT nc.n_name FROM customer cc, nation nc
        |  WHERE cc.c_nationkey = nc.n_nationkey
        |  GROUP BY nc.n_name ORDER BY count(*) DESC, nc.n_name LIMIT 2)
        |  AND n2.n_name IN (SELECT ns.n_name FROM supplier ss, nation ns
        |  WHERE ss.s_nationkey = ns.n_nationkey
        |  GROUP BY ns.n_name ORDER BY count(*) DESC, ns.n_name LIMIT 2)
        |GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
        |ORDER BY cust_nation, supp_nation, yr""".stripMargin,

    // Q3.4: the month-pinned flow — nation pair AND a single month
    // (SSB's most selective Q3 flight).
    "qssb_q3_month" ->
      """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        |  AND EXTRACT(MONTH FROM l_shipdate) = 12
        |GROUP BY n1.n_name, n2.n_name
        |ORDER BY cust_nation, supp_nation""".stripMargin,

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

    // Q4.2: profit at (year, supplier nation, part type) grain with
    // BOTH geographies region-pinned and the years restricted — the
    // double-geography profit flight between Q4.1's breadth and Q4.3's
    // drill-down.
    "qssb_q4_type" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  n2.n_name AS supp_nation, p_type,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |         - CAST(floor(l_quantity * p_retailprice * 90) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN orders    ON l_orderkey = o_orderkey
        |JOIN customer  ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        |JOIN supplier  ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |JOIN part      ON l_partkey = p_partkey
        |WHERE r1.r_name = 'AMERICA' AND r2.r_name IN ('AMERICA', 'ASIA')
        |  AND EXTRACT(YEAR FROM o_orderdate) BETWEEN 1997 AND 1998
        |GROUP BY EXTRACT(YEAR FROM o_orderdate), n2.n_name, p_type
        |ORDER BY yr, supp_nation, p_type""".stripMargin,

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
