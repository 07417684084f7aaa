package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Type-coercion golden battery — the corners the reference exercises
  * through `sql/core/src/test/resources/sql-tests/inputs/typeCoercion/`
  * (decimal promotion, string↔numeric comparison, string→timestamp
  * coercion) plus null-ordering, checked PER ROW against DuckDB:
  *
  *  - decimal + / * / ÷ with different scales: the result must be the
  *    exact promoted-scale decimal (surfaced as DOUBLE so the engines'
  *    different result-precision declarations can't mask a value match)
  *  - int + double widening
  *  - string↔numeric comparison must be NUMERIC, not lexicographic —
  *    `'9' < 10` style; a lexicographic engine flips thousands of rows
  *  - timestamp >= string-literal coercion
  *  - negative modulo keeps the dividend's sign (C semantics, which
  *    both Spark and DuckDB implement — a Python-style mod would flip)
  *  - explicit NULLS FIRST/LAST ordering honored in a DESC sort
  *
  * The only Spark/oracle text difference: DuckDB refuses implicit
  * VARCHAR↔BIGINT comparison, so the oracle spells out the CAST that
  * Spark's coercion rule inserts — which IS the assertion (Spark must
  * pick the numeric cast, and every row's flag must agree).
  */
object CoercionQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_coercion_matrix" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_orderkey, l_linenumber,
          |  CAST(CAST(l_quantity AS DECIMAL(12,2)) + CAST(l_discount AS DECIMAL(10,4)) AS DOUBLE) AS dec_add,
          |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)) AS DOUBLE) AS dec_mul,
          |  CAST(CAST(l_quantity AS DECIMAL(12,2)) / 4 AS DOUBLE) AS dec_div,
          |  l_linenumber + l_quantity AS int_plus_double,
          |  CASE WHEN CAST(l_orderkey AS STRING) < l_orderkey + 1 THEN 1 ELSE 0 END AS str_num_cmp,
          |  CASE WHEN l_shipdate >= '1998-01-01' THEN 1 ELSE 0 END AS str_ts_cmp,
          |  (0 - CAST(l_orderkey AS INT)) % 7 AS neg_mod,
          |  CAST(floor(l_orderkey / 7) AS BIGINT) AS int_div_floor
          |FROM lineitem WHERE l_orderkey < 300
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    },

    "q_null_ordering_desc" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT nullif(l_linestatus, 'F') AS st_nullable, l_orderkey, l_linenumber
          |FROM lineitem WHERE l_orderkey < 150
          |ORDER BY st_nullable DESC NULLS LAST, l_orderkey, l_linenumber""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_coercion_matrix" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) + CAST(l_discount AS DECIMAL(10,4)) AS DOUBLE) AS dec_add,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4)) AS DOUBLE) AS dec_mul,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) / 4 AS DOUBLE) AS dec_div,
        |  l_linenumber + l_quantity AS int_plus_double,
        |  CASE WHEN CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) < l_orderkey + 1 THEN 1 ELSE 0 END AS str_num_cmp,
        |  CASE WHEN l_shipdate >= '1998-01-01' THEN 1 ELSE 0 END AS str_ts_cmp,
        |  (0 - CAST(l_orderkey AS INT)) % 7 AS neg_mod,
        |  CAST(floor(l_orderkey / 7) AS BIGINT) AS int_div_floor
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_null_ordering_desc" ->
      """SELECT nullif(l_linestatus, 'F') AS st_nullable, l_orderkey, l_linenumber
        |FROM lineitem WHERE l_orderkey < 150
        |ORDER BY st_nullable DESC NULLS LAST, l_orderkey, l_linenumber""".stripMargin)
}
