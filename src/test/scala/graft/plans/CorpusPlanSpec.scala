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
