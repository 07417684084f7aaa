package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 aggregate-pushdown contract tests for [[GroupStatsV2]]: the
  * supported GROUP BY shape must plan with NO Aggregate node (complete
  * pushdown) and still produce exactly the raw-path answer; unsupported
  * shapes must fall back to the raw scan and stay correct.
  */
class GroupStatsV2Spec extends SparkSpec {

  private def table = spark.read.format("graft.sources.GroupStatsV2")
    .option("n", 801).option("groups", 8).load()

  /** Final-plan Aggregate node presence (AQE wraps the plan, so match
    * on the final-plan text, the idiom the other plan specs use).
    */
  private def hasAggNode(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.collect() // finalize the adaptive plan
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    finalPlan.contains("HashAggregate") || finalPlan.contains("SortAggregate")
  }

  test("supported shape: complete pushdown, zero Aggregate nodes, exact values") {
    val df = table.groupBy("grp").agg(
      count(lit(1)).as("n_rows"), min("v").as("min_v"),
      max("v").as("max_v"), sum("v").as("sum_v"))
    assert(!hasAggNode(df),
      s"expected complete pushdown, plan:\n${df.queryExecution.executedPlan}")
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates"))

    // n=801: group g0 has 101 ids {0,8,...,800}, others 100
    val rows = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("g0") == ((101L, 0L, 800L, (101L * 800L) / 2)))
    assert(rows("g3") == ((100L, 3L, 795L, 100L * (3L + 795L) / 2)))
    assert(rows.size == 8)
  }

  test("pushdown answer == raw-path answer, group by group") {
    val pushed = table.groupBy("grp").agg(
      count(lit(1)).as("n_rows"), min("v").as("min_v"),
      max("v").as("max_v"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // avg() is not in the supported set -> raw path plans a real aggregate
    val rawDf = table.groupBy("grp").agg(
      count(lit(1)).as("n_rows"), min("v").as("min_v"),
      max("v").as("max_v"), sum("v").as("sum_v"), avg("v").as("a"))
    assert(hasAggNode(rawDf), "avg must disable the pushdown")
    val raw = rawDf.select("grp", "n_rows", "min_v", "max_v", "sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(pushed == raw)
  }

  test("group-by a non-grp column falls back to the raw path") {
    val df = table.groupBy("v").agg(count(lit(1)).as("c"))
    assert(hasAggNode(df))
    assert(df.count() == 801)
  }

  test("plain scan still serves raw rows with column pruning") {
    val df = table.select("grp").filter(col("grp") === "g7")
    assert(df.count() == 100)
  }
}
