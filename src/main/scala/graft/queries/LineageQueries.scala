package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lineage.ColumnLineage

/** Lineage surfaced through the driver contract: compute the column
  * lineage of a representative multi-operator query (join + aggregate +
  * derived expressions) and return the edge list, normalized to bare
  * table names so output is scale-factor-directory independent.
  * Rows-only check (lineage is not SQL-expressible in DuckDB); exact
  * edge semantics are golden-tested in LineageSpec.
  */
object LineageQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_lineage_edges" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          countDistinct(col("o_custkey")).as("n_cust"))
      val edges = ColumnLineage.of(q).toDF(s)
      edges.withColumn("src_table",
          regexp_extract(col("src_table"), "([a-z]+)\\.parquet", 1))
        .orderBy(col("out_column"), col("src_table"), col("src_column"))
    })

  /** The edge list is a deterministic function of the plan, so the
    * oracle is the golden edge set itself — the driver hash proves the
    * lineage walker resolves join + aggregate + expression inputs to
    * exactly these physical columns.
    */
  val oracle: Map[String, String] = Map(
    "q_lineage_edges" ->
      """SELECT * FROM (VALUES
        |  ('n_cust', 'orders', 'o_custkey'),
        |  ('o_orderstatus', 'orders', 'o_orderstatus'),
        |  ('revenue', 'lineitem', 'l_discount'),
        |  ('revenue', 'lineitem', 'l_extendedprice'))
        |  AS t(out_column, src_table, src_column)
        |ORDER BY out_column, src_table, src_column""".stripMargin)
}
