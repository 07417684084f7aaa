package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence tests: the scale-shaped operators
  * must agree with their naive formulations on arbitrary data, not
  * just the crafted goldens.
  */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive theta join on random data (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val pts = Seq.tabulate(300)(i => (i.toLong, rnd.between(-1000L, 1000L)))
        .toDF("pid", "p")
      val ivs = Seq.tabulate(60) { i =>
        val s = rnd.between(-1000L, 1000L)
        (i.toLong, s, s + rnd.between(0L, 200L))
      }.toDF("iid", "s", "e")
      val w = rnd.between(1L, 300L)
      val binned = RangeJoin.binned(pts, ivs, "p", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = pts.crossJoin(ivs)
        .filter(col("p") >= col("s") && col("p") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(binned == naive, s"seed=$seed binWidth=$w")
    }
  }

  test("salted count+sum == direct aggregation on random data") {
    val rnd = new Random(7)
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.between(-10000L, 10000L)))
      .toDF("id", "k", "v")
    val salted = PipelineOps.saltedCountSum(df, "k", col("v"), col("id"), salts = 8)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("dupFraction bounds and exactness on random token arrays") {
    val rnd = new Random(11)
    val docs = Seq.tabulate(200) { i =>
      val toks = Seq.fill(rnd.between(1, 30))(s"w${rnd.nextInt(10)}")
      (i.toLong, toks.mkString(" "), toks)
    }
    val out = docs.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val m = PipelineOps.repetitionMetrics(out, "text")
      .select("doc_id", "dup_word_frac").as[(Long, Double)].collect().toMap
    docs.foreach { case (id, _, toks) =>
      val expected = math.rint(
        (1.0 - toks.distinct.size.toDouble / toks.size) * 1e6) / 1e6
      assert(math.abs(m(id) - expected) < 1e-9, s"doc $id")
      assert(m(id) >= 0.0 && m(id) < 1.0)
    }
  }

  test("minhashPairs precision == 1 vs exact Jaccard on random corpora (2 seeds)") {
    for (seed <- Seq(5, 17)) {
      val rnd = new Random(seed)
      // small vocabulary forces real shingle overlap (candidate pairs
      // exist, some above and some below the threshold)
      val docs = Seq.tabulate(80) { i =>
        (i.toLong, Seq.fill(rnd.between(5, 25))(s"w${rnd.nextInt(12)}").mkString(" "))
      }.toDF("doc_id", "text")
      val found = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val exact = Dedup.jaccardPairsExact(docs, "doc_id", "text", threshold = 0.4)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // every surfaced pair must be a true pair with the exact value
      // (the refine guarantees precision 1; recall may be < 1)
      assert(found.subsetOf(exact), s"seed=$seed false pairs: ${found -- exact}")
      // and exact twins (jaccard == 1) are always recalled
      val twins = exact.filter(_._3 == 1.0)
      assert(twins.subsetOf(found), s"seed=$seed missed twins: ${twins -- found}")
    }
  }
}
