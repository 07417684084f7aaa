package graft.plans

import graft.SparkSpec
import graft.queries.TpchHard

/** Decorrelation-shape assertions for the hard TPC-H queries: the
  * subqueries must be rewritten to joins (no residual subquery
  * execution), matching the reference's `optimizer/subquery.scala`
  * rewrites (RewritePredicateSubquery, RewriteCorrelatedScalarSubquery).
  */
class TpchHardSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = TpchHard.queries(name)(spark, sf)
    df.queryExecution.optimizedPlan.toString
  }

  test("q21: EXISTS and NOT EXISTS decorrelate to semi + anti joins") {
    val p = plan("q21_waiting_suppliers")
    assert(p.contains("LeftSemi"), s"expected semi join:\n$p")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
  }

  /** A residual `scalar-subquery#N [refs…]` with NON-empty outer refs
    * is an undecorrelated per-row re-execution — the scale bug this
    * spec exists to reject.  Empty-bracket residues (`[]`) are
    * UNcorrelated constant derivations (q02's data-derived size band /
    * modal type, added to de-EMPTY the sf0.001 rung): they run once
    * before the main plan and broadcast a scalar, which is exactly the
    * shape we want for corpus-independent constants.
    */
  private val correlatedResidue = """scalar-subquery#\d+ \[[^\]]""".r

  test("q2/q20: correlated scalar-agg subqueries decorrelate to aggregated joins") {
    val p2 = plan("q02_min_cost_supplier")
    assert(correlatedResidue.findFirstIn(p2).isEmpty,
      s"q2 left a CORRELATED scalar subquery:\n$p2")
    assert(p2.contains("min(ps_supplycost)"), s"q2 lost the min agg:\n$p2")
    val p20 = plan("q20_potential_promotion")
    assert(correlatedResidue.findFirstIn(p20).isEmpty,
      s"q20 left a CORRELATED scalar subquery:\n$p20")
    assert(p20.contains("LeftSemi"), s"q20 IN should be semi join:\n$p20")
  }

  test("hard battery returns rows at sf0.001 or runs clean") {
    // Row counts are oracle-checked at sf0.01 by the driver; here we
    // just prove each query executes end-to-end on the tiny SF.
    TpchHard.queries.foreach { case (name, q) =>
      val n = q(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("corner battery: correlated scalar COUNT decorrelates to a left-outer agg join") {
    // q_subq_scalar_empty is the COUNT-bug shape: the rewrite must
    // produce an outer join + aggregate (0 for empty groups), never a
    // per-row re-execution of the subquery.
    val p = graft.queries.SubqueryCorners
      .queries("q_subq_scalar_empty")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("Join LeftOuter"), s"expected decorrelated outer join:\n$p")
    assert(!p.toLowerCase.contains("scalar-subquery"),
      s"correlated scalar subquery left undecorrelated:\n$p")
  }
}
