package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (test scope): break q_dedup_minhash's gate time
  * into its component pipelines at sf0.1.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.withHive(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val base = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), col("text"))
    val docs = base.unionByName(base.filter(pmod(col("doc_id"), lit(100)) === 0)
      .withColumn("doc_id", col("doc_id") + 500000L))
    docs.cache().count()
    for (round <- 1 to 3) {
      val found = time(s"minhashPairs r$round") {
        val f = graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
        f.count(); f
      }
      val exact = time(s"jaccardPairsExact r$round") {
        val e = graft.ops.Dedup.jaccardPairsExact(docs, "doc_id", "text", threshold = 0.5)
        e.count(); e
      }
      time(s"full-gate-shape r$round") {
        exact.agg(count(lit(1)).as("n_exact_pairs"))
          .crossJoin(found.join(exact, Seq("id_a", "id_b", "jaccard"), "left_anti")
            .agg(count(lit(1)).as("n_false_pairs"))).collect()
      }
    }
    spark.stop()
  }
}
