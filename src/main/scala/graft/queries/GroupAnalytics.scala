package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Group-analytics + ordering corner battery, mirroring the reference's
  * golden-file corpus `sql-tests/inputs/group-analytics.sql` and
  * `sql-tests/inputs/window.sql`:
  *
  *  - grouping() bit decomposition over CUBE (which aggregate level a
  *    row came from, disambiguating data-NULL vs rollup-NULL)
  *  - GROUPING SETS over computed EXPRESSIONS, not bare columns
  *  - explicit NULLS FIRST / NULLS LAST under LIMIT — Spark defaults to
  *    nulls-first ascending, DuckDB to nulls-last, so only the explicit
  *    form is portable (and this entry proves ours honors it)
  *  - first_value / nth_value IGNORE NULLS window frames (dialects
  *    place the modifier differently, so Spark and oracle texts differ;
  *    the VALUES must still hash-match)
  *
  * Scale shape: CUBE/GROUPING SETS expand via a single Expand node
  * before partial aggregation (rows × #sets map-side, aggregated before
  * the one exchange); IGNORE-NULLS windows stay one partition-local
  * sort per key group.
  */
object GroupAnalytics {
  type Q = (SparkSession, String) => DataFrame

  /** Entries whose SQL runs verbatim on Spark AND DuckDB. */
  private val common: Map[String, String] = Map(
    // grouping() bits over CUBE: gid = 2*grouping(rf) + grouping(ls)
    // (the multi-arg grouping_id spelling differs across dialects; the
    // bit arithmetic is portable and equivalent).
    "q_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(2 * grouping(l_returnflag) + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin,

    // GROUPING SETS over an expression (year extraction) + a column +
    // the grand total.
    "q_gs_expressions" ->
      """SELECT coalesce(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT), -1) AS yr,
        |  coalesce(o_orderpriority, 'ALL') AS pri, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY GROUPING SETS ((EXTRACT(YEAR FROM o_orderdate)), (o_orderpriority), ())
        |ORDER BY yr, pri""".stripMargin,

    // Explicit null placement under LIMIT: identical only because both
    // sides spell out ASC NULLS LAST (the engines' defaults disagree).
    "q_null_ordering" ->
      """SELECT ck, c_custkey FROM
        |  (SELECT nullif(c_nationkey, 7) AS ck, c_custkey FROM customer
        |   WHERE c_custkey <= 200) t
        |ORDER BY ck ASC NULLS LAST, c_custkey LIMIT 50""".stripMargin,

    // And the mirror: DESC NULLS FIRST puts every NULL-key row ahead of
    // the LIMIT cut.
    "q_null_ordering_first" ->
      """SELECT ck, c_custkey FROM
        |  (SELECT nullif(c_nationkey, 7) AS ck, c_custkey FROM customer
        |   WHERE c_custkey <= 200) t
        |ORDER BY ck DESC NULLS FIRST, c_custkey LIMIT 50""".stripMargin)

  // IGNORE NULLS: Spark wants `first_value(x) IGNORE NULLS OVER ...`,
  // DuckDB wants `first_value(x IGNORE NULLS) OVER ...` — same
  // semantics, different placement, so the texts split here.
  private val winFrame =
    "PARTITION BY c_nationkey ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
  private def winSql(firstV: String, nthV: String): String =
    s"""WITH t AS (SELECT c_custkey, c_nationkey,
       |  CASE WHEN c_acctbal < 0 THEN NULL
       |       ELSE CAST(floor(c_acctbal * 100) AS BIGINT) END AS bal
       |  FROM customer WHERE c_custkey <= 500)
       |SELECT c_custkey, bal,
       |  $firstV OVER ($winFrame) AS first_pos,
       |  $nthV OVER ($winFrame) AS second_pos
       |FROM t ORDER BY c_custkey""".stripMargin

  private val sparkOnly: Map[String, String] = Map(
    "q_win_ignore_nulls" ->
      winSql("first_value(bal) IGNORE NULLS", "nth_value(bal, 2) IGNORE NULLS"))

  private val oracleOnly: Map[String, String] = Map(
    "q_win_ignore_nulls" ->
      winSql("first_value(bal IGNORE NULLS)", "nth_value(bal, 2 IGNORE NULLS)"))

  val queries: Map[String, Q] = (common ++ sparkOnly).map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = common ++ oracleOnly
}
