package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Golden-semantics and recall tests for [[Pq]] product quantization. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("identical vectors encode to identical codes; codes index codebooks") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 1f, 0f)), (4L, Array(0f, 1f, 1f, 0f)),
      (5L, Array(1f, 1f, 0f, 1f))).toDF("vec_id", "embedding")
    val books = Pq.train(vecs, "vec_id", "embedding", m = 2, k = 2, iters = 2)
    assert(books.size == 2 && books.forall(_.forall(_.length == 2)))
    val coded = vecs.select(col("vec_id"),
        Pq.encode(col("embedding"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(coded(1L) == coded(2L) && coded(3L) == coded(4L))
    assert(coded.values.forall(cs =>
      cs.length == 2 && cs.forall(c => c >= 0 && c < 2)))
  }

  test("reconstruction of a centroid-aligned vector is near-exact") {
    // 8 copies of two distinct vectors: Lloyd centroids converge onto
    // the two points, so reconstruction error must be ~0
    val vecs = ((1L to 8L).map(i => (i, Array(2f, 3f, -1f, 0f))) ++
      (9L to 16L).map(i => (i, Array(-2f, 1f, 4f, 2f))))
      .toDF("vec_id", "embedding")
    val books = Pq.train(vecs, "vec_id", "embedding", m = 2, k = 2, iters = 3)
    val err = vecs.select(
        aggregate(zip_with(col("embedding").cast("array<double>"),
            Pq.reconstruct(Pq.encode(col("embedding"), books), books)
              .cast("array<double>"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err < 1e-10, s"max reconstruction error $err")
  }

  test("recall@10 vs brute force clears the gate floor on the real corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("query_id"), col("corpus_id"))
    val pq = Pq.topK(emb, queries, k = 10)
      .select(col("query_id").as("qb"), col("corpus_id").as("cb"))
    val common = brute.join(pq,
        col("query_id") === col("qb") && col("corpus_id") === col("cb"))
      .groupBy("query_id").agg(count(lit(1)).as("n_common"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // measured min is 5-6/10 across SFs; the enforced contract is 4/10
    // (margin for test-data regeneration between rounds)
    assert(common.size == 8 && common.values.forall(_ >= 4),
      s"recall@10 floor of 4/10 violated: $common")
  }

  test("ADC scoring equals per-pair reconstructed cosine to FP tolerance") {
    // ADC (LUT sum / stored rnorm2) must compute the SAME asymmetric
    // cosine as explicitly reconstructing the coded vector — it is an
    // algebraic refactoring, not an approximation.  Compare every
    // scored pair from searchEncoded (k = corpus size ⇒ all pairs)
    // against a reconstruct()-based twin.
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 64)
    val queries = emb.filter(col("vec_id") < 4)
    val books = Pq.train(emb, "vec_id", "embedding", m = 8, k = 8, iters = 2)
    val coded = Pq.encodeTable(emb, books)
    val adc = Pq.searchEncoded(coded, books, queries, k = 100)
      .select(col("query_id"), col("corpus_id"), col("cos").as("cos_adc"))
    val recon = coded.crossJoin(
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        round(graft.functions.cosine_sim(col("qvec"),
          Pq.reconstruct(col("codes"), books)), 6).as("cos_recon"))
    val maxDiff = adc.join(recon, Seq("query_id", "corpus_id"))
      .agg(max(abs(col("cos_adc") - col("cos_recon")))).head().getDouble(0)
    // both sides are rounded to 6 dp independently, so a raw score at a
    // rounding boundary may flip by exactly one 6-dp ulp — allow one
    assert(maxDiff <= 1.5e-6, s"ADC diverges from reconstruction: $maxDiff")
  }

  test("IVF-PQ recall@10 vs brute force clears the floor on the real corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8).limit(8)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("query_id"), col("corpus_id"))
    val ivfpq = Pq.ivfPqTopK(emb, queries, k = 10, nCells = 16, nProbe = 8)
      .select(col("query_id").as("qb"), col("corpus_id").as("cb"))
    val common = brute.join(ivfpq,
        col("query_id") === col("qb") && col("corpus_id") === col("cb"))
      .groupBy("query_id").agg(count(lit(1)).as("n_common"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // IVF pruning on top of PQ: floor is 3/10 (PQ alone gates 4/10)
    assert(common.size == 8 && common.values.forall(_ >= 3),
      s"IVF-PQ recall@10 floor of 3/10 violated: $common")
  }

  test("train and encode fail loudly on empty/degenerate input") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Pq.train(empty, "vec_id", "embedding", m = 2, k = 2, iters = 1)
    }
    assert(e1.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException] {
      Pq.encode(col("embedding"), Seq.empty)
    }
    assert(e2.getMessage.contains("codebooks"))
  }

  test("persisted code-table search equals the one-shot path") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 4)
    val books = Pq.train(emb, "vec_id", "embedding", m = 16, k = 16, iters = 2)
    // round-trip the index through parquet: codes are plain ints, the
    // codebooks are the (tiny) model state a real deployment persists
    // alongside — search must be identical after the round trip
    val dir = graft.TmpCleanup.tempDir("graft_pq_idx")
    Pq.encodeTable(emb, books).write.mode("overwrite").parquet(dir)
    val split = Pq.searchEncoded(spark.read.parquet(dir), books, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val oneShot = Pq.topK(emb, queries, k = 5, m = 16, kCents = 16, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(split == oneShot && split.nonEmpty, s"split=$split one=$oneShot")
  }
}
