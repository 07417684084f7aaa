import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QDbg extends App {
  val spark = graft.GraftSession.withHive(SparkSession.builder()
    .master("local[32]").config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.ui.enabled","false")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.1"
  def t(tag: String)(f: => Unit): Unit = {
    val t0=System.nanoTime(); f; println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.3f s")
  }
  val raw = graft.Tables.load(spark, dir, "lineitem")
  raw.limit(1).count()
  for (i <- 1 to 2) {
    t(s"run$i parquet 3pt")(raw.select(expr("percentile(l_extendedprice, array(0.25,0.5,0.75))")).head())
    t(s"run$i parquet 9pt")(raw.select(expr("percentile(l_extendedprice, array(0.08,0.1,0.12,0.48,0.5,0.52,0.88,0.9,0.92))")).head())
    val cached = raw.select(col("l_extendedprice")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    t(s"run$i cached 9pt")(cached.select(expr("percentile(l_extendedprice, array(0.08,0.1,0.12,0.48,0.5,0.52,0.88,0.9,0.92))")).head())
    cached.unpersist()
  }
  spark.stop()
}
