package graft.plans

import graft.SparkSpec
import graft.queries.SsbShapes

/** Plan-shape assertions for the SSB battery (reference
  * `SSBQuerySuite.scala:33-75`): a star flight must execute as
  * fact-scan → broadcast dim joins → partial aggregation, with the only
  * hash exchange carrying ALREADY-AGGREGATED rows on the grouping keys
  * — the fact table itself never shuffles.
  */
class SsbPlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SsbShapes.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("Q1 flight: no joins, band filters pushed to the parquet scan") {
    val p = plan("qssb_q1_discount_revenue")
    assert(!p.contains("Join"), s"Q1 must be join-free:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)"),
      s"discount/quantity band should reach the scan:\n$p")
    // column pruning: the 11-column fact reads only the 4 needed
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      s"scan should be pruned to 4 columns:\n$p")
  }

  test("Q2/Q3 flights: all dims broadcast, fact never hash-shuffles pre-agg") {
    for (q <- Seq("qssb_q2_brand_year", "qssb_q3_nation_flows")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims should broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q: the fact must not shuffle for a dim join:\n$p")
      // two-phase agg: a partial HashAggregate feeds the one exchange
      // (top-down dump: final agg, exchange, partial agg, scan)
      assert("HashAggregate".r.findAllIn(p).size >= 2,
        s"$q: expected partial+final aggregation:\n$p")
      assert(p.contains("Exchange hashpartitioning"), s"$q: expected final-agg exchange:\n$p")
      assert(p.indexOf("Exchange hashpartitioning") > p.indexOf("HashAggregate"),
        s"$q: the exchange should carry aggregated rows, not the fact:\n$p")
    }
  }

  test("battery runs clean at sf0.001") {
    SsbShapes.queries.foreach { case (name, q) =>
      assert(q(spark, sf).count() >= 0, s"$name failed")
    }
  }
}
