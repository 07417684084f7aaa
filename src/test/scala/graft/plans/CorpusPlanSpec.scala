package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.{CorpusStats, Dedup}

/** Plan-shape assertions for the corpus-statistics operators — the
  * scale property each one is built around.
  */
class CorpusPlanSpec extends SparkSpec {

  test("unigramLogProb broadcasts the vocabulary-sized frequency table") {
    val docs = Tables.load(spark, sf, "documents")
    val p = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"token→frequency lookup must broadcast, never shuffle the corpus:\n$p")
  }

  test("incrementalDedup: exact verify is an anti-join, probe is a bloom scalar") {
    val docs = Tables.load(spark, sf, "documents")
    val hist = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)
    val p = Dedup.incrementalDedup(batch, hist, "text", 300L)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"),
      s"candidate verification must plan as an anti-join:\n$p")
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain") ||
      p.contains("bloom_filter_agg") || p.contains("BloomFilterAggregate"),
      s"the bloom probe must appear in the plan (scalar subquery + codegen probe):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no quadratic work anywhere in the dedup plan:\n$p")
  }

  test("incrementalDedupBloom2: history parquet is scanned ONLY by the " +
      "verify anti-join; the probe reads just the persisted index") {
    val docs = Tables.load(spark, sf, "documents")
    val tmp = graft.TmpCleanup.tempDir("graft_bloom2_plan")
    val hist = docs.filter(col("doc_id") < 300)
    hist.write.mode("overwrite").parquet(s"$tmp/history")
    Dedup.bloomIndex(hist, "text", buckets = 8, 300L)
      .write.mode("overwrite").parquet(s"$tmp/index")
    val batch = docs.filter(col("doc_id") >= 300)
    val plan = Dedup.incrementalDedupBloom2(batch,
        spark.read.parquet(s"$tmp/history"),
        spark.read.parquet(s"$tmp/index"), "text", 8)
      .queryExecution.executedPlan.toString
    // exactly ONE scan of the history files — the verify join; the
    // level-1 probe must not rebuild a filter from history (that is
    // incrementalDedup's shape, re-scanning 100 TB of history per batch)
    val histScans = "graft_bloom2_plan[^\\s]*/history".r
      .findAllIn(plan).size
    assert(histScans == 1,
      s"history must be read once (verify anti-join only), found $histScans:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"candidate verification must plan as an anti-join:\n$plan")
    assert("graft_bloom2_plan[^\\s]*/index".r.findAllIn(plan).nonEmpty,
      s"the probe side must read the persisted index:\n$plan")
    assert(plan.contains("bloom_probe"),
      s"the per-bucket codegen probe must appear:\n$plan")
    // the bucket-count-sized index broadcasts HINT-FREE on its stats
    assert(plan.contains("BroadcastHashJoin"),
      s"the index probe join must broadcast the tiny index side:\n$plan")
    assert(!plan.contains("BloomFilterAggregate") &&
      !plan.contains("bloom_filter_agg"),
      s"no in-batch filter rebuild from history:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no quadratic work:\n$plan")
  }

  test("ppmi marginals broadcast; pair table never re-shuffles for lookups") {
    import spark.implicits._
    val pairs = Seq(("a", "b", 5L), ("b", "c", 3L)).toDF("w1", "w2", "n_pairs")
    val p = CorpusStats.ppmi(pairs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"marginal lookups must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"vocabulary-sized sides must never sort-merge:\n$p")
  }
}
