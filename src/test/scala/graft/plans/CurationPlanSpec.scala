package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.{Linkage, Retrieval, SpanDedup, Whitening}

/** Plan-shape assertions for the curation operators — each one's
  * 100 TB scale property, pinned in the physical plan.
  */
class CurationPlanSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: query terms broadcast; top-k is the bounded heap; nothing quadratic") {
    val docs = Tables.load(spark, sf, "documents")
    val q = Seq((1, "spark table join")).toDF("qid", "qtext")
    val p = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the query-term probe must broadcast, never shuffle the postings:\n$p")
    assert(p.contains("TopKPerKey"),
      s"top-k must plan as the bounded-heap operator, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no quadratic work in the retrieval plan:\n$p")
  }

  test("linkage: candidate generation is an equi-join on the block key") {
    val part = Tables.load(spark, sf, "part")
      .select(col("p_partkey").as("pid"), col("p_name").as("name"))
    val p = Linkage.resolve(part, "pid", "name", part, "pid", "name",
        nm => substring(nm, 3, 4), maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"block matching must be an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"the refine must never degrade to all-pairs:\n$p")
  }

  test("spanStats: spans come from a per-document window, dup join is equi on the hash") {
    val docs = Tables.load(spark, sf, "documents")
    val p = SpanDedup.spanStats(docs, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window") || p.contains("WindowGroupLimit") ||
      p.contains("RunningWindowFunction") || p.contains("collect_list"),
      s"span construction must be the windowed collect, not a self-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no quadratic span comparison:\n$p")
  }

  test("semanticDedup: pair generation is an equi-join on the cell key") {
    val emb = Tables.load(spark, sf, "embeddings")
    val p = graft.ops.SemDedup.semanticDedup(emb, "vec_id", "embedding",
        k = 4, tau = 0.95, iters = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"within-cell pairing must be an equi-join on cell:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs comparison outside cells:\n$p")
  }

  test("momentsMicro: pair partials hash-aggregate below the exchange") {
    val emb = Tables.load(spark, sf, "embeddings")
    val plan = Whitening.momentsMicro(emb, "embedding", d = 64)
      .queryExecution.executedPlan.toString
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(i")
    val partialIdx = plan.indexOf("HashAggregate(keys=[i", exchangeIdx)
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"a partial HashAggregate must sit BELOW the (i,j) exchange so the " +
        s"shuffle carries at most d(d+1)/2 rows per partition:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the moment table needs no join at all:\n$plan")
  }
}
