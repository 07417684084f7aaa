package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Physical-plan shape assertions (§2.13 repartition/coalesce, §4.2
  * partitioning & shuffle): the plans we claim in BENCH_NOTES.md,
  * checked mechanically.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("repartition(n) is round-robin; repartition(col) hashes; coalesce avoids shuffle") {
    val li = Tables.load(spark, sf, "lineitem")
    assert(planOf(li.repartition(8)).contains("RoundRobinPartitioning"))
    assert(planOf(li.repartition(8, col("l_orderkey"))).contains("hashpartitioning(l_orderkey"))
    val coalesced = planOf(li.coalesce(1))
    assert(coalesced.contains("Coalesce") && !coalesced.contains("Exchange"))
  }

  test("global sort range-partitions; broadcast hint forces BHJ") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    assert(planOf(li.orderBy(col("l_orderkey"))).contains("rangepartitioning"))
    val joined = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
    assert(planOf(joined).contains("BroadcastHashJoin"))
  }

  test("IVF assignment partial-aggregates map-side, no corpus-keyed window") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = graft.ops.Similarity.ivfTopK(
      emb, emb.filter(col("vec_id") < 4), k = 3, nCells = 8, nProbe = 2)
    val plan = planOf(df)
    assert(plan.contains("partial_max_by"),
      s"cell assignment should map-side combine:\n$plan")
    // remaining windows are query-side (probe + final rank) only
    assert(!plan.contains("windowspecdefinition(corpus_id"),
      s"corpus-wide window shuffle crept back in:\n$plan")
  }

  test("shuffle_hash hint selects ShuffledHashJoin over sort-merge") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = li.join(ord.hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = planOf(joined)
      assert(plan.contains("ShuffledHashJoin"),
        s"shuffle_hash hint should plan SHJ:\n$plan")
      assert(!plan.contains("SortMergeJoin"))
      // SHJ skips both sort passes SMJ would need
      assert(!plan.contains("Sort "), s"SHJ must not sort either side:\n$plan")
      assert(joined.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
      // the oracle-gated entry runs the same SHJ shape
      val entry = planOf(graft.queries.Joins
        .queries("q_join_shuffle_hash")(spark, sf))
      assert(entry.contains("ShuffledHashJoin"),
        s"q_join_shuffle_hash should plan SHJ:\n$entry")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("immutable agg buffers fall back to SortAggregate when object-hash is off") {
    val li = Tables.load(spark, sf, "lineitem")
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    try {
      val agg = li.groupBy(col("l_returnflag"))
        .agg(collect_list(col("l_linestatus")).as("statuses"))
      val plan = planOf(agg)
      assert(plan.contains("SortAggregate"),
        s"collect_list without ObjectHashAggregate should SortAggregate:\n$plan")
      assert(agg.count() == 3)
    } finally {
      spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "true")
    }
    // with the default conf the same shape uses ObjectHashAggregate
    val objPlan = planOf(li.groupBy(col("l_returnflag"))
      .agg(collect_list(col("l_linestatus"))))
    assert(objPlan.contains("ObjectHashAggregate"))
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and the result is still correct
      assert(joined.count() ==
        Tables.load(spark, sf, "lineitem")
          .join(Tables.load(spark, sf, "orders"),
            col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
