package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Custom TopKPerKey operator: equivalence with the window formulation
  * and plan-shape assertions (no SortExec, custom exec present).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("top-k per key equals window row_number formulation") {
    val ord = Tables.load(spark, sf, "orders")
    val viaCustom = TopK.perKey(ord,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .as[(Long, Long)].collect().toSet
    assert(viaCustom == viaWindow)
  }

  test("plan uses TopKPerKeyExec and no sort") {
    val ord = Tables.load(spark, sf, "orders")
    val df = TopK.perKey(ord, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 2)
    val plan = df.queryExecution.executedPlan
    // physical nodeName strips the Exec suffix in plan strings
    assert(plan.toString.contains("TopKPerKey"))
    assert(plan.collect { case e: TopKPerKeyExec => e }.nonEmpty ||
      plan.toString.contains("AdaptiveSparkPlan"))
    assert(!plan.toString.contains("Window") && !plan.toString.contains("Sort "))
  }

  test("k larger than group size returns whole groups") {
    val nation = Tables.load(spark, sf, "nation")
    val all = TopK.perKey(nation, Seq(col("n_regionkey")),
      Seq(col("n_nationkey").asc), k = 1000).count()
    assert(all == nation.count())
  }
}
