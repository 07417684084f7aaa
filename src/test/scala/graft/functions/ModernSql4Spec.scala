package graft.functions

import graft.SparkSpec
import graft.queries.ModernSql4

/** Structural checks for the Spark-4 SQL-surface battery (values are
  * oracle-checked through the gate; these assert the engine-level
  * properties the oracle can't see).
  */
class ModernSql4Spec extends SparkSpec {

  test("scalar SQL UDF inlines into the plan (no ScalaUDF boundary)") {
    val df = ModernSql4.queries("q_sql_udf")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF"),
      "SQL UDF body should inline at analysis, not bridge through ScalaUDF")
    assert(df.count() > 0)
  }

  test("recursive CTE materializes the full 0..24 spine including empty keys") {
    val rows = ModernSql4.queries("q_recursive_cte")(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (0 to 24))
    // nations only span 0..24 in TPC-H, but not every key need have
    // customers at sf0.001 — the LEFT join must keep zero-count keys
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("UTF8_LCASE collation halves the distinct count of a cased union") {
    val r = ModernSql4.queries("q_collation")(spark, sf).head()
    val (ci, cs) = (r.getLong(0), r.getLong(1))
    assert(ci == 25, "25 nations case-insensitively")
    assert(cs > ci, "cased + lowercased copies must be distinct case-sensitively")
  }

  test("session variable set from a scalar subquery binds across statements") {
    val df = ModernSql4.queries("q_session_vars")(spark, sf)
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("pipe syntax plans to the same result as the nested form") {
    val piped = ModernSql4.queries("q_pipe_syntax")(spark, sf).collect()
    val nested = spark.sql(ModernSql4.oracle("q_pipe_syntax")).collect()
    assert(piped.toSeq == nested.toSeq)
  }

  test("SQL hints force broadcast and pin repartitioning") {
    val df = ModernSql4.queries("q_sql_hints")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"BROADCAST hint should force BHJ:\n$plan")
    // a hint the session would reject logs + ignores, never fails: the
    // same query under a disabled broadcast threshold STILL broadcasts
    // because the hint overrides the config
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = ModernSql4.queries("q_sql_hints")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastHashJoin"),
        s"hint must override autoBroadcastJoinThreshold=-1:\n$forced")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("DISTRIBUTE BY adds a hash exchange on the named key") {
    graft.Tables.registerAll(spark, sf)
    val plan = spark.sql(
      "SELECT l_suppkey FROM lineitem DISTRIBUTE BY l_suppkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(l_suppkey"))
  }
}
