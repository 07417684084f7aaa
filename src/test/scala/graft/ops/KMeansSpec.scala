package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Lloyd k-means goldens: the objective never increases across
  * iterations (the Lloyd guarantee), assignments are deterministic
  * across runs, and an obviously separable dataset separates.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("cost is non-increasing across iterations") {
    val emb = Tables.load(spark, sf, "embeddings")
    val c0 = KMeansOps.cost(KMeansOps.fit(emb, "vec_id", "embedding", k = 4, iters = 0))
    val c1 = KMeansOps.cost(KMeansOps.fit(emb, "vec_id", "embedding", k = 4, iters = 1))
    val c3 = KMeansOps.cost(KMeansOps.fit(emb, "vec_id", "embedding", k = 4, iters = 3))
    assert(c1 <= c0 + 1e-9)
    assert(c3 <= c1 + 1e-9)
  }

  test("deterministic across runs") {
    val emb = Tables.load(spark, sf, "embeddings")
    def run() = KMeansOps.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      .select("vec_id", "cell").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("separable clusters are recovered") {
    // the two smallest ids are the initial centroids for k = 2; two
    // tight blobs around (0,0) and (10,10).
    val pts = Seq(
      (0L, Array(0.1f, 0.0f)), (2L, Array(0.0f, 0.2f)), (4L, Array(-0.1f, 0.1f)),
      (1L, Array(10.0f, 10.1f)), (3L, Array(9.9f, 10.0f)), (5L, Array(10.1f, 9.8f)))
      .toDF("vec_id", "embedding")
    val cells = KMeansOps.fit(pts, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(Set(cells(0L), cells(2L), cells(4L)).size == 1)
    assert(Set(cells(1L), cells(3L), cells(5L)).size == 1)
    assert(cells(0L) != cells(1L))
  }

  test("init is rank-based: sparse / offset ids still yield k clusters") {
    // ids start at 1000 — an `id < k` init would find no centroids
    val pts = Seq(
      (1000L, Array(0.1f, 0.0f)), (1002L, Array(0.0f, 0.2f)),
      (1001L, Array(10.0f, 10.1f)), (1003L, Array(9.9f, 10.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeansOps.fit(pts, "vec_id", "embedding", k = 2, iters = 1)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(out.size == 4)
    assert(out.values.toSet.size == 2)
    assert(out(1000L) == out(1002L) && out(1001L) == out(1003L))
  }
}
