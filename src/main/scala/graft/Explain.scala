package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .queryExecution.executedPlan.toString
      // summarize: exchanges, joins, scans
      plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Scan parquet")
          || l.contains("HashAggregate") || l.contains("TakeOrdered")
          || l.contains("WholeStageCodegen")).take(24).foreach(println)
    }
  }
}
