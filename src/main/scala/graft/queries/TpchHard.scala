package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The six hardest TPC-H decorrelation shapes — Q2, Q4, Q9, Q11, Q20,
  * Q21 — completing the 22-query battery (reference SQL under
  * `sql/core/src/test/resources/tpch/q{2,4,9,11,20,21}.sql`, suite
  * `sql/core/src/test/scala/.../TPCHQuerySuite.scala:26-95`).  These
  * exercise the decorrelation rewrites in the reference's
  * `optimizer/subquery.scala` that the rest of the battery doesn't
  * reach: correlated scalar-agg subqueries (Q2, Q20), EXISTS with a
  * non-trivial inner predicate (Q4), HAVING over a scalar subquery
  * (Q11), nested IN + correlated scalar agg (Q20), and the
  * multi-EXISTS / NOT-EXISTS self-joins of Q21.
  *
  * Schema adaptations (the synthetic tables lack some TPC-H columns):
  * `partsupp` doesn't exist, so it is derived as a deterministic CTE
  * over the distinct (l_partkey, l_suppkey) pairs — availqty and
  * supplycost are pure key arithmetic, identical in both engines.
  * `l_commitdate`/`l_receiptdate` don't exist, so Q4/Q21's "received
  * later than committed" predicate becomes a deterministic key-derived
  * boolean with the same selectivity role.  Each query runs as SQL text
  * via spark.sql, and the identical text is the DuckDB oracle.
  */
object TpchHard {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic partsupp stand-in: one row per distinct
    * (partkey, suppkey) pair seen in lineitem, with key-derived
    * availqty/supplycost.  Also the join-reduction property of real
    * partsupp holds: |partsupp| ≪ |lineitem|.
    */
  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    CAST((l_partkey * 7 + l_suppkey * 3) % 1000 + 1 AS INT) AS ps_availqty,
      |    ((l_partkey * 31 + l_suppkey * 17) % 10000) / 100.0 AS ps_supplycost
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  /** Q4/Q21 stand-in for `l_receiptdate > l_commitdate` (columns absent
    * from the synthetic schema): deterministic key arithmetic, ~40%
    * selective, identical in both engines.
    */
  private val lateSql = "(%s.l_orderkey * 13 + %s.l_linenumber * 7) %% 5 < 2"

  private val sqlTexts: Map[String, String] = Map(
    // Q2 shape: correlated scalar-min subquery over the same 4-way join
    // as the outer block (minimum-cost supplier per part in a region).
    "q02_min_cost_supplier" ->
      s"""WITH $partsuppCte
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM part, supplier, partsupp, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size = 15 AND p_type = 'ECONOMY'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps_supplycost) FROM partsupp, supplier, nation, region
        |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    // Q4 shape: EXISTS with an inner predicate beyond the correlation
    // key (late-delivery flag), over a date-windowed orders scan.
    "q04_order_priority" ->
      s"""SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND ${lateSql.format("lineitem", "lineitem")})
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Q9 shape: 6-way join with a LIKE filter and derived profit
    // (price minus supply cost), grouped by nation and year.
    "q09_product_profit" ->
      s"""WITH $partsuppCte
        |SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
        |      - CAST(ps_supplycost AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        |  FROM part, supplier, lineitem, partsupp, orders, nation
        |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
        |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
        |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%red%') AS profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    // Q11 shape: HAVING over an uncorrelated scalar subquery (group
    // value above a fraction of the total over the same join).
    // The TPC-H spec scales Q11's FRACTION with SF (0.0001/SF); a fixed
    // fraction empties the result at 10x the tuning scale (found by the
    // round-11 sf0.1 sweep).  Derive the threshold from the data
    // instead — a part qualifies when its value exceeds 4x the mean
    // per-(part,supplier)-pair value — which keeps the Q11 shape
    // (HAVING vs a scalar subquery), yields rows at any SF where the
    // nation exists, and stays a plain count(*) (a count DISTINCT here
    // costs an extra Expand pass over the join, measured +32%).
    "q11_important_stock" ->
      s"""WITH $partsuppCte
        |SELECT ps_partkey, CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |GROUP BY ps_partkey
        |HAVING CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) > (
        |  SELECT CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) * 4.0
        |    / count(*)
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7')
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    // Q20 shape: nested IN subqueries with a correlated scalar agg on
    // two correlation keys (suppliers holding excess stock of parts).
    "q20_potential_promotion" ->
      s"""WITH $partsuppCte
        |SELECT s_suppkey, s_name
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND ps_availqty > (
        |        SELECT 0.1 * sum(l_quantity) FROM lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |ORDER BY s_name, s_suppkey""".stripMargin,

    // Q21 shape: EXISTS + NOT EXISTS self-joins on lineitem (the only
    // supplier whose delivery was late on a multi-supplier order).
    "q21_waiting_suppliers" ->
      s"""SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND ${lateSql.format("l1", "l1")}
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND ${lateSql.format("l3", "l3")})
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)

  val queries: Map[String, Q] = sqlTexts.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      graft.Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sqlTexts
}
