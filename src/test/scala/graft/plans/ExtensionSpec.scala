package graft.plans

import graft.SparkSpec

/** The one-config-line activation story: every runtime session loads
  * `spark.sql.extensions=graft.plans.GraftExtensions`, which must make
  * the library's SQL function names resolve with NO per-session
  * registration code — the unforked equivalent of the reference adding
  * rows to `FunctionRegistry.scala`'s built-in table.
  */
class ExtensionSpec extends SparkSpec {

  test("graft_* SQL functions resolve through the session extension") {
    // no registerFunction / temp-function calls anywhere in this test
    val r = spark.sql(
      """SELECT graft_hamming64(CAST(12 AS BIGINT), CAST(10 AS BIGINT)) AS hd,
        |       graft_morton2(CAST(3 AS INT), CAST(5 AS INT)) AS z,
        |       graft_rolling_hash64('abc') AS rh""".stripMargin).head()
    assert(r.getInt(0) == 2)          // 12^10 = 0b0110
    assert(r.getLong(1) == 39L)       // interleave(3=0b11, 5=0b101) = 0b100111
    val expected = "abc".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    assert(r.getLong(2) == expected)
  }

  test("graft_unicode_normalize resolves with a literal form; non-literal rejected") {
    // NB Spark's char(769) wraps mod 256 (DuckDB's chr does not) — build
    // the combining mark with a scala-side escape instead
    val r = spark.sql(
      "SELECT graft_unicode_normalize(concat('cafe', '́'), 'NFC') AS s").head()
    assert(r.getString(0) == "café")
    intercept[Exception] {
      spark.sql("SELECT graft_unicode_normalize('x', concat('NF', 'C'))").collect()
    }
  }

  test("DESCRIBE FUNCTION surfaces the injected usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION graft_morton2")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("graft_morton2") && desc.toLowerCase.contains("morton"),
      s"unexpected description:\n$desc")
  }

  test("TopKPerKey plans through the injected strategy alone") {
    import org.apache.spark.sql.functions.col
    // clear the experimental fallback the DataFrame helper installs, so
    // planning can ONLY succeed via GraftExtensions.injectPlannerStrategy
    val saved = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = Nil
    try {
      val df = graft.plans.TopK.perKey(
        graft.Tables.load(spark, sf, "supplier"),
        keys = Seq(col("s_nationkey")),
        order = Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 2)
      // perKey re-installs into experimental; strip again to be sure the
      // injected path is what plans
      spark.experimental.extraStrategies = Nil
      val plan = df.queryExecution.executedPlan.toString
      // physical nodeName strips the Exec suffix; reaching a physical
      // plan AT ALL proves the injected strategy matched the node
      assert(plan.contains("TopKPerKey ["),
        s"extension-injected strategy should plan the custom node:\n$plan")
      assert(df.count() > 0)
    } finally spark.experimental.extraStrategies = saved
  }

  test("bad arity fails at analysis with the function's own message") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hamming64(1)").collect()
    }
    assert(e.getMessage.contains("graft_hamming64"),
      s"expected arity failure naming the function, got: ${e.getMessage}")
  }
}
