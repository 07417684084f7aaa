package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE-semantics goldens: override / insert / persist, null-valued
  * updates win over base values (a coalesce-based merge would get this
  * wrong), and the plan is a single full-outer join.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: override matched, insert new, keep unmatched") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "st", "p")
    val updates = Seq((2L, "B", 200.0), (9L, "x", 90.0)).toDF("k", "st", "p")
    val out = Upsert(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0),
      (9L, "x", 90.0)))
  }

  test("upsert: an update carrying NULL overrides the base value") {
    val base = Seq((1L, Some("keep"))).toDF("k", "v")
    val updates = Seq((1L, None: Option[String])).toDF("k", "v")
    val out = Upsert(base, updates, Seq("k"))
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, None)))
  }

  test("upsert plans as one full-outer shuffle join") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((2L, "b")).toDF("k", "v")
    val df = Upsert(base, updates, Seq("k"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("FullOuter"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
