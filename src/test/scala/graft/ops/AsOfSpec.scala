package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Golden semantics for the as-of join, both directions: latest
  * at-or-before (backward), earliest at-or-after (forward), exact-time
  * ties visible, and null padding when no qualifying row exists.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val quotes = Seq(
    (1L, ts(10), 100.0), (1L, ts(20), 110.0), (1L, ts(30), 120.0),
    (2L, ts(15), 200.0)).toDF("key", "t", "px")
  private val trades = Seq(
    (1L, ts(5), "a"),   // before any quote
    (1L, ts(20), "b"),  // exact-time tie
    (1L, ts(25), "c"),  // between quotes
    (2L, ts(40), "d"),  // after the only quote
    (3L, ts(10), "e"))  // key with no quotes
    .toDF("key", "t", "tag")

  test("backward: latest quote at-or-before each trade, ties visible") {
    val out = AsOfJoin.asOf(trades, quotes, "key", "t", Seq("px"))
      .select("tag", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> None,          // nothing at-or-before 00:05
      "b" -> Some(110.0),   // exact-time 00:20 quote IS visible
      "c" -> Some(110.0),   // latest before 00:25
      "d" -> Some(200.0),   // key 2's only quote, earlier
      "e" -> None))         // key 3 has no quotes
  }

  test("forward: earliest quote at-or-after each trade, ties visible") {
    val out = AsOfJoin.asOfForward(trades, quotes, "key", "t", Seq("px"))
      .select("tag", "px").as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> Some(100.0),   // next quote after 00:05
      "b" -> Some(110.0),   // exact-time 00:20 quote IS visible
      "c" -> Some(120.0),   // next after 00:25
      "d" -> None,          // nothing at-or-after 00:40 for key 2
      "e" -> None))
  }

  test("plans a single shuffle: no join operator at all, one window") {
    val plan = AsOfJoin.asOf(trades, quotes, "key", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the window formulation:\n$plan")
  }
}
