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

  /** Q11's nation, derived from the data instead of a fixed name (the
    * minimum-suppkey supplier's nation — unique key, so deterministic
    * on any corpus): sf0.001 has suppliers in only 10 of 25 nations,
    * so any fixed name risks a toothless `pass EMPTY` down-rung.
    */
  private val q11NationPick: String =
    """(SELECT n2.n_name FROM supplier s2, nation n2
      |    WHERE s2.s_nationkey = n2.n_nationkey
      |    ORDER BY s2.s_suppkey LIMIT 1)""".stripMargin

  /** Q2's region, derived from the data (the minimum-suppkey
    * supplier's region): guarantees the region filter keeps suppliers
    * on any corpus.
    */
  private val q02RegionPick: String =
    """(SELECT r2.r_name FROM supplier s2, nation n2, region r2
      |    WHERE s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |    ORDER BY s2.s_suppkey LIMIT 1)""".stripMargin

  /** Q21's nation: the BUSIEST supplier nation (most lineitems) — the
    * pick that maximizes waiting-supplier candidates, so the gate has
    * real teeth at the sf0.001 rung (19 qualifying lineitems there vs
    * zero for the old fixed name) and trivially survives the heavy-
    * tail skew drill (the hot suppkey's nation IS the busiest).
    */
  private val q21NationPick: String =
    """(SELECT n9.n_name FROM lineitem l9, supplier s9, nation n9
      |    WHERE l9.l_suppkey = s9.s_suppkey
      |      AND s9.s_nationkey = n9.n_nationkey
      |    GROUP BY n9.n_name
      |    ORDER BY count(*) DESC, n9.n_name LIMIT 1)""".stripMargin

  private val sqlTexts: Map[String, String] = Map(
    // Q2 shape: correlated scalar-min subquery over the same 4-way join
    // as the outer block (minimum-cost supplier per part in a region).
    // Every constant is DATA-DERIVED (round-16 de-EMPTY pass): fixed
    // size/type/region names made the gate `pass EMPTY` at sf0.001
    // (the sf0.001 corpus has no EUROPE-region supplier paired with a
    // size-15 ECONOMY part).  The size filter is a band off min
    // (jitter-stable on alt corpora), the type is the modal type
    // (non-empty by construction), and the region is the min-suppkey
    // supplier's region (has suppliers by construction).
    "q02_min_cost_supplier" ->
      s"""WITH $partsuppCte
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM part, supplier, partsupp, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size BETWEEN (SELECT min(p_size) FROM part)
        |                 AND (SELECT min(p_size) + 4 FROM part)
        |  AND p_type = (SELECT p_type FROM part
        |    GROUP BY p_type ORDER BY count(*) DESC, p_type LIMIT 1)
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = $q02RegionPick
        |  AND ps_supplycost = (
        |    SELECT min(ps_supplycost) FROM partsupp, supplier, nation, region
        |    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |      AND r_name = $q02RegionPick)
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
    // instead — a part qualifies when its value exceeds 2x the mean
    // per-(part,supplier)-pair value — which keeps the Q11 shape
    // (HAVING vs a scalar subquery), yields rows at any SF, and stays
    // a plain count(*) (a count DISTINCT here costs an extra Expand
    // pass over the join, measured +32%).  The NATION is data-derived
    // too (the minimum-suppkey supplier's nation, itself an
    // uncorrelated ORDER BY + LIMIT 1 scalar subquery): a FIXED name
    // made the gate `pass EMPTY` at sf0.001, where only 10 of the 25
    // nations have any supplier at all (round-15 verdict item 2) — a
    // data-derived pick has rows at every rung and on every drill
    // corpus by construction.  2x (not 4x) keeps ~5% of groups at the
    // down-rung's single-supplier nation, margin against alt-seed
    // value jitter.
    "q11_important_stock" ->
      s"""WITH $partsuppCte
        |SELECT ps_partkey, CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = $q11NationPick
        |GROUP BY ps_partkey
        |HAVING CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) > (
        |  SELECT CAST(sum(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty) AS DOUBLE) * 2.0
        |    / count(*)
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = $q11NationPick)
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
    // Nation data-derived (busiest supplier nation) — a fixed name
    // went `pass EMPTY` at sf0.001 (round-16 de-EMPTY pass).
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
        |  AND s_nationkey = n_nationkey AND n_name = $q21NationPick
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)

  val queries: Map[String, Q] = sqlTexts.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      graft.Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sqlTexts
}
