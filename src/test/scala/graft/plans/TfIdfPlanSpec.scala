package graft.plans

import graft.{SparkSpec, Tables}
import graft.ops.{TfIdf, Triangles}

/** Plan-shape assertions for [[TfIdf]] and [[Triangles]] — each op's
  * 100 TB contract, pinned so a refactor cannot silently regress it.
  */
class TfIdfPlanSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdf: df-table and corpus count broadcast; no sort-merge, no cartesian blowup") {
    val docs = Tables.load(spark, sf, "documents")
    val p = TfIdf.tfIdf(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"tf ⋈ df must broadcast the vocabulary-sized side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in tf-idf should sort-merge:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row corpus count must broadcast, not cartesian:\n$p")
  }

  test("oovRate: vocab selection is a bounded-heap top-k feeding a broadcast") {
    val docs = Tables.load(spark, sf, "documents")
    val p = TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 25)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-V vocabulary must plan as distributed top-k, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"vocabulary membership must broadcast the V-row vocab:\n$p")
  }

  test("triangles: every join is an equi-join — no cartesian or nested-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Triangles.perNode(edges).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"wedge and closure joins must stay equi-joins (keys may be " +
        s"least/greatest expressions, still hashable):\n$p")
  }
}
