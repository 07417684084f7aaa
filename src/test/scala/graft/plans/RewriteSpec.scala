package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Optimizer-injection surface: the flag-gated count(DISTINCT) → HLL++
  * rewrite, and AQE's runtime skew-join splitting (the other half of
  * the 100 TB skew story next to PipelineOps.saltedCountSum).
  */
class RewriteSpec extends SparkSpec {

  test("count(distinct) rewrites to approx_count_distinct under the graft flag") {
    val li = Tables.load(spark, sf, "lineitem")
    def q = li.agg(countDistinct(col("l_partkey")).as("n"))
    val exact = q.head().getLong(0)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    try {
      spark.conf.set(ApproxDistinctRewrite.Flag, "true")
      val rewritten = q
      assert(rewritten.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      val approx = rewritten.head().getLong(0)
      assert(math.abs(approx - exact).toDouble / math.max(exact, 1L) < 0.1)
      spark.conf.set(ApproxDistinctRewrite.Flag, "false")
      assert(q.head().getLong(0) == exact)
      assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    } finally {
      spark.conf.unset(ApproxDistinctRewrite.Flag)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRewrite)
    }
  }

  test("grouped count(distinct) also rewrites under the flag") {
    val li = Tables.load(spark, sf, "lineitem")
    def q = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    try {
      spark.conf.set(ApproxDistinctRewrite.Flag, "true")
      assert(q.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(q.collect().nonEmpty)
    } finally {
      spark.conf.unset(ApproxDistinctRewrite.Flag)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRewrite)
    }
  }

  test("AQE splits a skewed sort-merge-join partition at runtime") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 300k rows, half piled on key 0; right omits key 0 so the
      // join output stays small while the skewed partition is real.
      val left = spark.range(300000)
        .select(when(col("id") % 2 === 0, lit(0L))
          .otherwise(col("id") % 4096).as("k"), col("id").as("v"))
      val right = spark.range(1, 4096).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      val n = joined.count()
      assert(n > 0)
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.toLowerCase.contains("skew"),
        s"expected a skew-split join in the final adaptive plan:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
