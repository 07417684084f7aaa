package graft.tools

import org.apache.spark.sql.SparkSession

/** Maintenance main (test scope): row counts for candidate fuzz seeds
  * of one family at one SF, so EMPTY slots can be re-seeded.
  * Usage: Test/runMain graft.tools.ProbeFuzzSeeds <sfDir> <family> <lo> <hi>
  */
object ProbeFuzzSeeds {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, family, lo, hi) = args.take(4)
    val spark = graft.GraftSession.withHive(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.FuzzQueries.probeSeeds(spark, sfDir, family,
        lo.toLong to hi.toLong)
      .foreach { case (c, n) => println(s"PROBE seed=$c rows=$n") }
    spark.stop()
  }
}
