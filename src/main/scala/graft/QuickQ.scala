package graft

/** Dev utility: run named SparkEntry queries at sf0.001 and show rows. */
object QuickQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    args.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        println(s"=== $name rows=${df.count()}")
        df.show(5, false)
      } catch { case e: Throwable => println(s"=== $name ERR ${e.getMessage.take(500)}") }
    }
    spark.stop()
  }
}
