package graft.plans

import graft.SparkSpec
import graft.queries.TpcdsShapes

/** Plan-shape assertions for the round-4 TPC-DS additions: the
  * structurally heavy shapes must pick the scale-safe physical plans —
  * broadcast dims on the 9-way join, decorrelated semi/anti joins for
  * the EXISTS family (never a nested loop over the fact), and
  * Expand-fed partial aggregation under the rank-over-rollup.
  */
class TpcdsPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    TpcdsShapes.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q72 nine-way date-logic join: dims broadcast, no nested loop") {
    val p = plan("qds_q72_nine_way_lag")
    assert(p.contains("BroadcastHashJoin"), s"dims should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in a star:\n$p")
    // the date-lag predicate is an equi-join residual, not a BNLJ driver
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
  }

  test("q93/q95 EXISTS chains decorrelate to semi/anti joins") {
    val p93 = plan("qds_q93_exists_chain")
    assert(p93.contains("LeftSemi"), s"q93 EXISTS should be a semi join:\n$p93")
    assert(!p93.contains("CartesianProduct"), s"q93 no cartesian:\n$p93")
    val p95 = plan("qds_q95_multi_supplier")
    assert(p95.contains("LeftSemi"), s"q95 EXISTS → semi join:\n$p95")
    assert(p95.contains("LeftAnti"), s"q95 NOT EXISTS → anti join:\n$p95")
    assert(!p95.contains("CartesianProduct"), s"q95 no cartesian:\n$p95")
  }

  test("q67 rank-over-rollup: Expand feeds partial agg, window after") {
    val p = plan("qds_q67_rollup_rank")
    assert(p.contains("Expand"), s"rollup should plan as Expand:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation over the Expand:\n$p")
    assert(p.contains("Window"), s"rank window over the rollup output:\n$p")
    // the window runs over aggregated rows: Window appears ABOVE the
    // aggregates in the top-down dump
    assert(p.indexOf("Window") < p.indexOf("Expand"),
      s"window must consume aggregated rollup rows:\n$p")
  }

  test("q23 double-IN qualification plans as two semi joins") {
    val p = plan("qds_q23_frequent_best")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"both IN filters should be semi joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("battery runs clean at sf0.001") {
    TpcdsShapes.queries.foreach { case (name, q) =>
      assert(q(spark, sf).count() >= 0, s"$name failed")
    }
  }
}
