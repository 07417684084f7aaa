package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime-filtering contract tests for [[PartKvV2]]: a broadcast join
  * whose dim side references 3 of 64 fact partitions must, at
  * execution time, plan only those 3 partitions (dynamic partition
  * pruning through the DSv2 `SupportsRuntimeFiltering` path), with
  * results identical to the unpruned twin.
  *
  * The dim side is `range`-based, NOT a local Seq: a LocalRelation
  * filter constant-folds away at optimization time, and DPP requires a
  * surviving selective Filter on the dim side to fire at all.
  */
class PartKvV2Spec extends SparkSpec {

  private def fact(probe: String) =
    spark.read.format("graft.sources.PartKvV2")
      .option("parts", 64).option("rowsPer", 100).option("probe", probe).load()

  // keys {3, 32, 61}: the only ids in [0, 64) with id % 29 == 3
  private def dim: DataFrame =
    spark.range(0, 64).select(col("id").as("k")).filter(col("k") % 29 === 3)

  test("runtime filter prunes fact partitions through a broadcast join") {
    val df = fact("rf_prune")
      .join(broadcast(dim), col("part") === col("k"))
      .groupBy("part").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .orderBy("part")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // closed form: partition p holds v = 100p..100p+99
    def expect(p: Long) = (p, 100L, 100L * (100 * p) + 99L * 100 / 2)
    assert(rows == Seq(expect(3), expect(32), expect(61)))

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime filter on the v2 scan, plan:\n$plan")
    val planned = PartKvV2.lastPlanned.get("rf_prune")
    assert(planned != null && planned.intValue() == 3,
      s"expected the post-filter re-plan to keep 3 of 64 partitions, got $planned")
  }

  test("pruned answer equals the unpruned twin (runtime filtering off)") {
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val pruned = fact("rf_a")
      .join(broadcast(dim), col("part") === col("k"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set(key, "false")
    try {
      val plain = fact("rf_b")
        .join(broadcast(dim), col("part") === col("k"))
        .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pruned == plain)
      val planned = PartKvV2.lastPlanned.get("rf_b")
      assert(planned != null && planned.intValue() == 64,
        s"control run must read all 64 partitions, got $planned")
    } finally spark.conf.set(key, "true")
  }

  test("plain scan reads every partition exactly once") {
    val df = fact("rf_full")
    assert(df.count() == 6400)
    assert(df.agg(countDistinct("v")).head.getLong(0) == 6400)
    assert(PartKvV2.lastPlanned.get("rf_full").intValue() == 64)
  }
}
