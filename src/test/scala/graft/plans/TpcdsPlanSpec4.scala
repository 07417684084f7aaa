package graft.plans

import graft.SparkSpec
import graft.queries.TpcdsShapes4

/** Plan-shape assertions for the fourth TPC-DS tranche — each test
  * pins the property that makes the shape survive a 100 TB scale-up.
  */
class TpcdsPlanSpec4 extends SparkSpec {

  private def plan(name: String): String =
    TpcdsShapes4.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q4 six-way self-join joins aggregated year totals, not fact rows") {
    val p = plan("qds_q4_three_channel_yoy")
    // the CTE aggregates once per (customer, channel, year) BEFORE the
    // self-joins — fact rows must never reach the 6-way join
    assert(p.contains("HashAggregate"), s"year_total must aggregate first:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all six instances equi-join on the customer key:\n$p")
    // pushdown SPECIALIZES each CTE instance to its (channel, year)
    // slice: all six lineitem scans must carry the pushed returnflag
    // filter — six disjoint slice scans, not six full-corpus scans
    assert("PushedFilters: \\[[^\\]]*l_returnflag".r.findAllIn(p).size == 6,
      s"each year_total instance must push its channel filter to the scan:\n$p")
  }

  test("q10 EXISTS AND (EXISTS OR EXISTS) plans as semi/existence joins") {
    val p = plan("qds_q10_exists_and_or")
    assert(p.contains("LeftSemi") || p.contains("ExistenceJoin"),
      s"EXISTS must plan as semi/existence join, never a subquery loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"correlation is equi on custkey:\n$p")
  }

  test("q12/q20 class-share window is partitioned over the aggregate") {
    // string-level check (AQE wraps the physical tree): the window spec
    // must carry the partition column, never an empty global partition
    for ((n, col) <- Seq("qds_q12_class_share" -> "p_type",
                         "qds_q20_brand_share" -> "p_brand")) {
      val p = plan(n)
      assert(p.contains(s"windowspecdefinition($col"),
        s"$n: share window must partition by $col (no global sort):\n$p")
    }
  }

  test("q40 composite-key LEFT JOIN to returns stays a hash equi-join") {
    val p = plan("qds_q40_before_after")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"(orderkey, linenumber) is an equi key — no nested loop:\n$p")
  }

  test("q81 correlated state-average decorrelates to an equi-join") {
    val p = plan("qds_q81_state_return_avg")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated avg on nationkey must become an aggregate + equi-join:\n$p")
  }

  test("battery runs clean at sf0.001") {
    TpcdsShapes4.queries.foreach { case (name, q) =>
      assert(q(spark, sf).count() >= 0, s"$name failed")
    }
  }
}
