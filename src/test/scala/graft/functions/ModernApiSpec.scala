package graft.functions

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Spark-4-era session APIs the 2.4-fork reference lacks: observable
  * metrics (CollectMetrics) and parameterized SQL.
  */
class ModernApiSpec extends SparkSpec {

  test("Dataset.observe surfaces metrics without a second pass") {
    val li = Tables.load(spark, sf, "lineitem")
    val obs = Observation("li_metrics")
    val observed = li.observe(obs,
      count(lit(1)).as("cnt"),
      sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
    val n = observed.count()
    val metrics = obs.get
    assert(metrics("cnt") == n)
    assert(metrics("qty").asInstanceOf[Double] > 0.0)
  }

  test("parameterized SQL: named and positional args") {
    val named = spark.sql(
      "SELECT count(*) AS n FROM range(100) WHERE id < :lim",
      Map("lim" -> 42)).head().getLong(0)
    assert(named == 42L)
    val positional = spark.sql(
      "SELECT count(*) AS n FROM range(100) WHERE id < ? AND id >= ?",
      Array(42, 2)).head().getLong(0)
    assert(positional == 40L)
  }

  test("Dataset.transpose: rows become columns keyed by the index column") {
    import spark.implicits._
    val df = Seq(("m1", 1L, 10L), ("m2", 2L, 20L))
      .toDF("metric", "a", "b")
    val t = df.transpose(col("metric"))
    assert(t.columns.toSeq == Seq("key", "m1", "m2"), t.columns.toSeq)
    val rows = t.orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a", 1L, 2L), ("b", 10L, 20L)), rows)
  }

  test("Dataset.lateralJoin: the right side correlates per left row") {
    import spark.implicits._
    val left = Seq((1L, 3), (2L, 1)).toDF("id", "n")
    // per-left-row correlated subquery: top `n` integers for each row
    val right = spark.range(1, 10).toDF("v")
      .where(col("v") <= col("n").outer())
    val out = left.lateralJoin(right)
      .groupBy(col("id")).agg(count(lit(1)).as("k"),
        sum(col("v")).cast("long").as("s"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 6L), (2L, 1L, 1L)), out)
  }

  test("Dataset.exists() and DataFrame-API groupingSets()") {
    import spark.implicits._
    // exists(): correlated EXISTS built from a frame — orders that
    // have at least one high-quantity line
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    val hasBig = li.where(col("l_orderkey") === col("o_orderkey").outer() &&
      col("l_quantity") >= 45)
    val viaApi = ord.where(hasBig.exists()).count()
    val viaJoin = ord.join(li.where(col("l_quantity") >= 45)
        .select(col("l_orderkey")).distinct(),
      ord("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(viaApi == viaJoin && viaApi > 0, s"$viaApi vs $viaJoin")
    // groupingSets(): the DataFrame-API spelling of GROUPING SETS
    val gs = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L))
      .toDF("g1", "g2", "v")
      .groupingSets(Seq(Seq(col("g1")), Seq(col("g2"))), col("g1"), col("g2"))
      .agg(sum(col("v")).cast("long").as("s"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2))).toSet
    assert(gs == Set(
      (Some("a"), None, 3L), (Some("b"), None, 4L),
      (None, Some("x"), 5L), (None, Some("y"), 2L)), gs)
  }

  test("Dataset.scalar(): a one-row frame used as a scalar subquery " +
      "column") {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem")
    val avgQty = li.agg(avg(col("l_quantity")))
    val above = li.select(col("l_orderkey"), col("l_quantity"))
      .where(col("l_quantity") > avgQty.scalar())
      .count()
    val expected = {
      val a = li.agg(avg(col("l_quantity"))).head().getDouble(0)
      li.where(col("l_quantity") > a).count()
    }
    assert(above == expected && above > 0, s"$above vs $expected")
  }
}
