package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.multi_match_count

/** Microbench: Aho-Corasick multi_match_count vs the naive P-pass
  * contains() formulation, at growing blocklist sizes.  Run with
  *   sbt "Test / runMain graft.tools.AcBench /root/testdata/sf0.1"
  * Results land in BENCH_NOTES.md by hand — this is a measurement
  * tool, not a gate.
  */
object AcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("acbench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
      .select(lower(col("text")).as("t")).cache()
    docs.count()
    // vocabulary-derived patterns: real corpus words plus 2-grams so
    // some patterns hit and some never do
    val words = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort",
      "window", "customer", "query", "big", "stream", "group", "vector",
      "filter", "data", "column", "join", "small", "order", "the")
    def patterns(p: Int): Seq[String] =
      (0 until p).map { i =>
        if (i < words.length) words(i)
        else words(i % words.length) + " " + words((i * 7 + 3) % words.length)
      }
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    for (p <- Seq(8, 32, 128, 512)) {
      // distinct: the generator can collide at large P, and the
      // automaton counts DISTINCT patterns while a naive sum over a
      // duplicated list double-counts
      val ps = patterns(p).distinct
      val naive = ps.map(s =>
        sum(when(instr(col("t"), s) > 0, 1).otherwise(0))).reduce(_ + _)
      // warm both paths once, then 5 timed runs each
      docs.select(sum(multi_match_count(col("t"), ps))).head().getLong(0)
      docs.select(naive).head().getLong(0)
      val ac = (1 to 5).map(_ => time(
        docs.select(sum(multi_match_count(col("t"), ps))).head().getLong(0)))
      val nv = (1 to 5).map(_ => time(docs.select(naive).head().getLong(0)))
      require(ac.map(_._2).distinct.size == 1 &&
        ac.head._2 == nv.head._2, "result mismatch")
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"P=$p%4d  ac=${med(ac.map(_._1))}%.3fs  " +
        f"naive=${med(nv.map(_._1))}%.3fs  hits=${ac.head._2}")
    }
    spark.stop()
  }
}
