package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.{PipelineOps, RangeJoin, TextAnalysis}

/** Plan-shape assertions for the round-2 operators — the 100 TB
  * properties, checked on the executed plan, not just the results:
  * the binned range join never degrades to a nested loop, the
  * contamination join broadcasts the benchmark side, sequence packing
  * shuffles exactly once, and the salted aggregate really groups on
  * the salt in its first stage.
  */
class PipelinePlanSpec extends SparkSpec {

  /** Final executed plan only — AdaptiveSparkPlan's toString repeats
    * the tree under "== Initial Plan ==", which would double-count
    * node occurrences.
    */
  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val iv = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01"))).cast("long").as("s"))
      .withColumn("e", col("s") + 7L)
    val pts = Tables.load(spark, sf, "lineitem")
      .select(datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01"))).cast("long").as("p"))
    val plan = executedPlan(RangeJoin.binned(pts, iv, "p", "s", "e", 8L))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("contamination broadcasts the benchmark n-gram set and reuses the cache") {
    val docs = Tables.load(spark, sf, "documents")
    // materialize=false: inspect the live plan (the default eagerly
    // localCheckpoints the result and releases the cache, which
    // truncates the visible plan to a Scan of the checkpoint RDD)
    val plan = executedPlan(PipelineOps.contamination(docs, n = 5, benchMod = 97L,
      materialize = false))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    // the persisted n-gram projection serves all three consumers
    assert(plan.contains("InMemory") || plan.contains("TableCacheQueryStage"),
      s"expected the cached n-gram table in the plan:\n$plan")
  }

  test("sequence packing shuffles exactly once (by shard)") {
    val docs = Tables.load(spark, sf, "documents")
    val df = PipelineOps.sequencePacking(docs, "source", "doc_id",
      TextAnalysis.tokenCount(col("text")).cast("long"), budget = 2048L)
    val plan = executedPlan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle:\n$plan")
    assert(plan.contains("hashpartitioning(source"))
  }

  test("salted aggregation groups on the salt before the key") {
    val ev = Tables.load(spark, sf, "events")
    val df = PipelineOps.saltedCountSum(ev, "event_type",
      floor(col("value") * 100).cast("long"), col("event_id"), salts = 16)
    val plan = executedPlan(df)
    assert(plan.contains("__salt"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected the two-phase shape (salted + final):\n$plan")
  }

  test("charEntropy aggregates partially below both exchanges") {
    val docs = Tables.load(spark, sf, "documents")
    val plan = executedPlan(
      TextAnalysis.charEntropy(docs, "doc_id", "text"))
    // two groupBys, each partial->final: partial_count must appear
    // (map-side combine), and no window/global node anywhere
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"expected partial aggregation:\n$plan")
    assert(!plan.contains("WindowExec"), "no window in a pure two-agg op")
  }

  test("globalRowNumber: range shuffle + broadcast offsets, no global window") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
    val df = PipelineOps.globalRowNumber(li, Seq("l_orderkey", "l_linenumber"),
      numPartitions = 8)
    val plan = executedPlan(df)
    assert(plan.contains("Exchange rangepartitioning"),
      s"order must come from ONE range shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"partition offsets must broadcast, never shuffle the data again:\n$plan")
    assert(!plan.contains("Window"),
      s"the whole point: no window anywhere:\n$plan")
    df.unpersist()
  }

  test("tokenBudgetMixture: segmented scan, tasks bounded by partition size") {
    val docs = Tables.load(spark, sf, "documents")
    val df = PipelineOps.tokenBudgetMixture(docs, "doc_id", "text", "source",
      Map("src0" -> 400L, "src1" -> 300L))
    val plan = executedPlan(df)
    // the cumulative window runs per (partition, domain) — NEVER per
    // domain alone, which would pin a whole domain to one task
    assert(plan.contains("windowspecdefinition(__pid"),
      s"running total must be per (partition, domain):\n$plan")
    assert(!plan.contains("windowspecdefinition(source#"),
      s"no domain-wide window allowed:\n$plan")
    assert(plan.contains("Exchange rangepartitioning"),
      s"order comes from the range shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"subtotal offsets must broadcast back:\n$plan")
  }

  test("weightedSample selects through the bounded-heap TopKPerKey") {
    val docs = Tables.load(spark, sf, "documents")
    val df = PipelineOps.weightedSample(docs, "doc_id", "n_chars",
      "source", k = 3)
    val plan = executedPlan(df)
    assert(plan.contains("TopKPerKey"),
      s"per-stratum selection must use the k-heap operator:\n$plan")
    // the rank-label window (and its sort) may only run ABOVE the
    // k-heap — i.e. over k-bounded survivors, never the raw stratum
    val winAt = plan.indexOf("Window ")
    val heapAt = plan.indexOf("TopKPerKey")
    assert(winAt >= 0 && heapAt > winAt,
      s"window must sit above TopKPerKey (survivors only):\n$plan")
  }

  test("itemCooccurrence: pair counts combine map-side; joins stay equi") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), get_json_object(col("props"), "$.k").as("item"))
    val plan = executedPlan(
      graft.ops.GraphOps.itemCooccurrence(ev, "user_id", "item", 2L))
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"pair counting must combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"user self-join and degree joins must stay equi-joins:\n$plan")
  }
}
