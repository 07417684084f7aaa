package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Specs for the Aggregator-based MinHash and duplicate clustering. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashAggregator merge is min-wise: equals single-pass result") {
    val hashes = Seq(10L, 999L, -5L, 123456789L, 42L)
    val k = 16
    val expected = Array.tabulate(k)(i =>
      hashes.map(h => MinHashAggregator.mix(h, i)).min)
    val agg = MinHashAggregator.minhashUdaf(k)
    val got = hashes.toDF("h").repartition(3)
      .agg(agg(col("h")).as("sig"))
      .as[Array[Long]].head()
    assert(got.toSeq == expected.toSeq)
  }

  test("MinHash signatures of identical shingle sets are identical") {
    val docs = Tables.load(spark, sf, "documents")
    val agg = MinHashAggregator.minhashUdaf(32)
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val sigs = sh.select(col("id"), explode(col("sh")).as("h"))
      .groupBy("id").agg(agg(col("h")).as("sig"))
    val dupGroups = Dedup.exactGroups(docs, "doc_id", "text")
      .select("members").as[Seq[Long]].collect()
    val sigMap = sigs.as[(Long, Array[Long])].collect().toMap
    dupGroups.foreach { ms =>
      val first = sigMap(ms.head).toSeq
      ms.tail.foreach(m => assert(sigMap(m).toSeq == first))
    }
  }

  test("connected components merges transitive duplicate pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).toDF("id_a", "id_b")
    val cc = DupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(Set(20L, 21L, 22L, 23L).map(cc) == Set(20L))
    val cl = DupClusters.clusters(pairs).orderBy("cluster")
      .as[(Long, Long, Seq[Long])].collect()
    assert(cl.map(c => (c._1, c._3)).toSeq ==
      Seq((1L, Seq(1L, 2L, 3L)), (10L, Seq(10L, 11L)),
        (20L, Seq(20L, 21L, 22L, 23L))))
  }

  test("a path graph far longer than the round budget still converges") {
    // 200-node chain: diameter 199, so min-label propagation would need
    // 199 rounds and silently return unmerged labels at any realistic
    // budget; star contraction must close it in O(log n) rounds.
    // Shuffled pair order so convergence can't ride on a lucky layout.
    val n = 200L
    val chain = new scala.util.Random(42)
      .shuffle((1L until n).map(i => (i, i + 1)).toVector)
    val cc = DupClusters.connectedComponents(chain.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(cc.size == n)
    assert(cc.values.forall(_ == 1L), "every chain node must label to 1")
  }

  test("non-convergence is loud, never a silent partial labeling") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DupClusters.connectedComponents(pairs, maxIter = 0).collect()
    }
  }

  test("self-pairs and isolated duplicates label themselves") {
    val pairs = Seq((5L, 5L), (7L, 7L)).toDF("id_a", "id_b")
    val cc = DupClusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(5L -> 5L, 7L -> 7L))
  }

  test("end-to-end: minhash pairs -> clusters keep one rep per clique") {
    val docs = Tables.load(spark, sf, "documents")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.999)
    val cl = DupClusters.clusters(pairs)
    // each cluster's members must all be mutual exact duplicates here
    val norm = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.normalize(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    cl.as[(Long, Long, Seq[Long])].collect().foreach { case (_, _, members) =>
      val norms = members.map(norm).toSet
      assert(norms.size == 1, s"cluster $members spans texts $norms")
    }
  }
}
