package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.TopK

/** The custom TopKPerKey physical operator through the driver contract,
  * oracle-checked against the window row_number formulation in DuckDB —
  * same rows, radically different plan (bounded heaps, no sort).
  */
object TopKQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_topk_per_key" -> { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      TopK.perKey(ord, Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), desc("o_totalprice"), asc("o_orderkey"))
    })

  val oracle: Map[String, String] = Map(
    "q_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey ASC""".stripMargin)
}
