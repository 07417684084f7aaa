package graft.plans

import graft.{SparkSpec, Tables}
import graft.ops.{TfIdf, Triangles}

/** Plan-shape assertions for [[TfIdf]] and [[Triangles]] — each op's
  * 100 TB contract, pinned so a refactor cannot silently regress it.
  */
class TfIdfPlanSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdf: df join is an unhinted shuffle equi-join; corpus count broadcasts") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, ResolvedHint}
    val docs = Tables.load(spark, sf, "documents")
    val qe = TfIdf.tfIdf(docs, "doc_id", "text").queryExecution
    // The df table is VOCABULARY-sized (unbounded at corpus scale), so
    // it must NOT carry a broadcast hint — the only hinted frame is the
    // 1-row corpus count (a no-grouping aggregate).
    val badHints = qe.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
          !h.child.collectFirst {
            case a: Aggregate if a.groupingExpressions.isEmpty => a
          }.exists(_ => true) => h
    }
    assert(badHints.isEmpty,
      s"only the scalar corpus count may be broadcast-hinted:\n${qe.analyzed}")
    // At test SF the stats-based planner still broadcasts df (tiny
    // file ⇒ small estimate) — that is the DESIRED adaptive behavior.
    // The scale property to pin: nothing FORCES the broadcast, so with
    // the threshold disabled (a 100 TB-sized estimate, in effect) the
    // join degrades to a shuffle equi-join.  Before this round a forced
    // broadcast() hint made this assert impossible.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = TfIdf.tfIdf(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"tf ⋈ df must degrade to a shuffle equi-join when df is big:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"the 1-row corpus count must broadcast, not cartesian:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
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

  test("big-vocab gate: ≥10⁴-token vocabulary rides the shuffle-join shape") {
    // q_tfidf_bigvocab inflates the vocabulary past anything that could
    // be driver-resident by accident; its scoring join must plan as a
    // shuffle equi-join pre-AQE (the same assert as tfIdf above, but
    // through the actual gate entry), and the corpus itself must
    // actually have ≥ 10⁴ distinct tokens at the verify SF.
    val q = graft.SparkEntry.queries("q_tfidf_bigvocab")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = q(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"big-vocab tf ⋈ df must degrade to a shuffle equi-join:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val nVocab = q(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_terms")).head().getLong(0)
    assert(nVocab >= 10000L,
      s"inflated corpus must exercise >= 10^4 distinct (doc,term) scale: $nVocab")
  }

  test("triangles: every join is an equi-join — no cartesian or nested-loop") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Triangles.perNode(edges).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"wedge and closure joins must stay equi-joins (keys may be " +
        s"least/greatest expressions, still hashable):\n$p")
  }
}
