package graft.plans

import graft.SparkSpec
import graft.queries.TpcdsShapes2

/** Plan-shape assertions for the second TPC-DS tranche — the scale
  * property each shape exists to prove.
  */
class TpcdsPlanSpec2 extends SparkSpec {

  private def plan(name: String): String =
    TpcdsShapes2.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 week-over-week: aggregation runs below the self-join") {
    val p = plan("qds_q2_week_yoy")
    // both join inputs are ~52-row aggregates, never raw fact rows
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"weekly sums must aggregate before joining:\n$p")
    assert(!p.contains("CartesianProduct"), s"equi-join on wk, no cartesian:\n$p")
  }

  test("q6 non-key correlation decorrelates through a grouped aggregate") {
    val p = plan("qds_q6_above_segment_avg")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"segment averages need a grouped aggregate:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"correlated scalar on c_mktsegment must become an equi-join:\n$p")
  }

  test("q16 EXISTS(other row) + NOT EXISTS plan as semi + anti joins") {
    val p = plan("qds_q16_multi_supplier_clean")
    assert(p.contains("LeftSemi"), s"EXISTS → semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS → anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"correlation is equi on l_orderkey — no nested loop:\n$p")
  }

  test("q32 correlated same-fact average joins on the correlation key") {
    val p = plan("qds_q32_excess_discount")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"per-part average must equi-join back on l_partkey:\n$p")
  }

  test("battery runs clean at sf0.001") {
    TpcdsShapes2.queries.foreach { case (name, q) =>
      assert(q(spark, sf).count() >= 0, s"$name failed")
    }
  }
}
