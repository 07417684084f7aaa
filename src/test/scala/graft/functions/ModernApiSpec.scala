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
}
