package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** TPC-DS-SHAPE battery, third tranche — the remaining simpler
  * families from the reference corpus, for breadth (the structurally
  * hard patterns live in [[TpcdsShapes]]/[[TpcdsShapes2]]):
  *
  *  - band-scan brand×year topline                      (q3 / q42 / q52 / q55)
  *  - demographic-filtered catalog averages             (q7 / q26)
  *  - OR-of-ANDs averages over mixed dimensions         (q13)
  *  - prefix-disjunction customer rollup                (q15)
  *  - weekday FILTER pivot per nation                   (q43)
  *  - top-trip-per-customer window over aggregate       (q79)
  *  - returns-loss demographic cross                    (q91)
  *  - time-slot traffic counts                          (q96)
  *
  * Same contract: identical text on Spark and DuckDB, integer cents,
  * deterministic ORDER BY with unique tiebreaks.
  */
object TpcdsShapes3 {
  type Q = (SparkSession, String) => DataFrame

  private val sql: Map[String, String] = Map(
    // q3/q42/q52/q55 shape: dim-filtered fact band scan, brand×year
    // topline ranked by revenue with full tiebreaks.
    "qds_q3_brand_topline" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr, p_brand,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_returnflag = 'A' AND p_size <= 15
        |GROUP BY 1, 2
        |ORDER BY cents DESC, yr, p_brand LIMIT 10""".stripMargin,

    // q7/q26 shape: averages of four measures under a demographic
    // filter carried through the orders join.
    "qds_q7_demo_averages" ->
      """SELECT p_brand,
        |  CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
        |  CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_price_cents,
        |  CAST(round(avg(CAST(floor(l_discount * 100) AS BIGINT)), 4) AS DOUBLE) AS avg_disc_pct,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN part ON l_partkey = p_partkey
        |WHERE c_mktsegment = 'BUILDING' AND p_size <= 10
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // q13 shape: averages gated by an OR of AND-bands across customer
    // and order dimensions.
    "qds_q13_or_band_avgs" ->
      """SELECT CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
        |  CAST(round(avg(CAST(floor(l_extendedprice * 100) AS BIGINT)), 2) AS DOUBLE) AS avg_cents,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 100 AND 5000
        |       AND o_orderpriority = '1-URGENT')
        |   OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 5000 AND 9000
        |       AND o_orderpriority = '2-HIGH')
        |   OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal >= 0
        |       AND o_orderpriority = '5-LOW')""".stripMargin,

    // q15 shape: per-nation rollup where customers qualify by a name
    // prefix disjunction OR a balance floor.
    "qds_q15_prefix_or" ->
      """SELECT c_nationkey,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE substr(c_name, 10, 1) IN ('1', '3', '5')
        |   OR c_acctbal > 9000
        |GROUP BY c_nationkey
        |HAVING sum(CAST(floor(o_totalprice * 100) AS BIGINT)) > 0
        |ORDER BY c_nationkey""".stripMargin,

    // q79 shape: per-(customer, order) profit aggregate, then the top
    // trip per customer through a window OVER the aggregate.
    "qds_q79_top_trip" ->
      """WITH trips AS (
        |  SELECT o_custkey AS ck, o_orderkey AS ok,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_custkey, o_orderkey)
        |SELECT ck, ok, cents FROM (
        |  SELECT ck, ok, cents,
        |    row_number() OVER (PARTITION BY ck ORDER BY cents DESC, ok) AS rk
        |  FROM trips)
        |WHERE rk = 1 AND ck <= 300
        |ORDER BY ck""".stripMargin,

    // q91 shape: returned-revenue loss crossed by two demographic
    // dimensions for one calendar slice.
    "qds_q91_returns_cross" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS returned_cents,
        |  count(*) AS n
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) = 1997
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,

    // q96 shape: traffic count in one time slot band × event type.
    "qds_q96_time_slot" ->
      """SELECT event_type, count(*) AS n
        |FROM events
        |WHERE CAST(EXTRACT(HOUR FROM ts) AS INT) BETWEEN 8 AND 9
        |GROUP BY event_type ORDER BY event_type""".stripMargin)

  /** q43 shape: day-of-week FILTER pivot per supplier nation.  The two
    * engines disagree on EXTRACT(DOW) numbering, so each derives
    * Sunday=0 its own way: Spark from epoch-day arithmetic
    * ((days since 1970-01-01 + 4) mod 7 — day 0 was a Thursday),
    * DuckDB from its native dow().
    */
  private def q43(dayExpr: String): String =
    s"""SELECT s_nationkey,
       |  CAST(sum(CASE WHEN $dayExpr = 0
       |    THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sun_cents,
       |  CAST(sum(CASE WHEN $dayExpr = 3
       |    THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS wed_cents,
       |  CAST(sum(CASE WHEN $dayExpr = 6
       |    THEN CAST(floor(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sat_cents
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, Q] = (sql + ("qds_q43_weekday_pivot" ->
    q43("CAST(pmod(datediff(l_shipdate, DATE '1970-01-01') + 4, 7) AS INT)")))
    .map { case (name, text) =>
      name -> { (s: SparkSession, dir: String) =>
        Tables.registerAll(s, dir)
        s.sql(text)
      }
    }

  val oracle: Map[String, String] =
    sql + ("qds_q43_weekday_pivot" -> q43("CAST(EXTRACT(DOW FROM l_shipdate) AS INT)"))
}
