package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the standard compression for
  * billion-vector ANN: split each d-dim embedding into `m` subvectors,
  * k-means each subspace independently (codebooks of k centroids), and
  * store each vector as m small codes.  At m=32, k=32 a 64-dim float32
  * embedding (256 bytes) becomes 32 codes (32 bytes) — 8× smaller (and
  * 4-bit packing would halve it again); compression is what lets a
  * corpus-scale embedding table live in executor memory for the
  * scoring pass.
  *
  * Scale shape: ALL m subspaces train in ONE Lloyd pipeline over the
  * exploded (subspace, subvector) table — per iteration one assignment
  * projection under the broadcast codebook literal and one (j, cell,
  * dim) mean aggregation whose result is m·k·(d/m) = k·d doubles, the
  * driver-held model state (same bound as [[KMeansOps]]).  Job count
  * is O(iters), independent of m.  At real corpus scale PQ codebooks
  * are trained on a sample by construction — quality depends on the
  * distribution, not the count.  Encoding is a pure per-row projection;
  * search scores broadcast queries against the code column with
  * asymmetric distance (query side exact, corpus side quantized).
  */
object Pq {

  /** Squared L2 between two array<double> columns (in-row). */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (in-row). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** 3-D codebook literal: books(j)(c) is centroid c of subspace j. */
  private def bookLit(books: Seq[Array[Array[Double]]]): Column =
    typedLit(books.map(_.map(_.toSeq).toSeq))

  /** Nearest-centroid index (0-based) of subvector `sv` within the
    * subspace-`j` codebook (ties to the smaller cell via first-match
    * array_position).  `sv` must be a materialized attribute or a
    * cheap slice — it is captured by the distance lambda and
    * re-evaluated once per cell.
    */
  private def nearestCell(bl: Column, j: Column, sv: Column): Column = {
    val dists = transform(element_at(bl, j + 1), c => dist2(sv, c))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Per-subspace codebooks: result(j) is a k×(d/m) centroid matrix
    * for subspace j.  Seeded with k DISTINCT subvectors per subspace in
    * hash order (duplicate seeds would collapse Lloyd cells; hash order
    * spreads them across the distribution, deterministically).  Cells
    * that lose all members keep their previous centroid, so every
    * codebook always has exactly its seeded cell count.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): Seq[Array[Array[Double]]] = {
    // Determinism caveat: per-iteration centroid means use avg() over
    // doubles, so codebooks are stable for a FIXED partitioning but not
    // bit-identical across different partition counts (FP addition is
    // not associative).  Downstream gates therefore assert recall
    // ENVELOPES, never exact codebook values.
    val firstRow = corpus.select(size(col(vecCol)).as("d")).head(1)
    require(firstRow.nonEmpty, "Pq.train: corpus is empty — nothing to train on")
    val d = firstRow.head.getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val sub = d / m
    val subs = corpus
      .select(explode(array((0 until m).map { j =>
        struct(lit(j).as("j"),
          slice(col(vecCol).cast("array<double>"), j * sub + 1, sub).as("sv"))
      }: _*)).as("e"))
      .select(col("e.j").as("j"), col("e.sv").as("sv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("j")).orderBy(hash(col("sv")), col("sv"))
    val seedRows = subs.distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .collect()
    var books: Seq[Array[Array[Double]]] = (0 until m).map { j =>
      seedRows.filter(_.getInt(0) == j).sortBy(_.getInt(2))
        .map(_.getSeq[Double](1).toArray)
    }
    for (_ <- 1 to iters) {
      val means = subs
        .withColumn("cell", nearestCell(bookLit(books), col("j"), col("sv")))
        .select(col("j"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("j"), col("cell"), col("dim"))
        .agg(avg(col("x")).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (jc, rows) =>
          jc -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      books = books.zipWithIndex.map { case (book, j) =>
        book.zipWithIndex.map { case (prev, c) => means.getOrElse((j, c), prev) }
      }
    }
    subs.unpersist()
    books
  }

  /** PQ code column: array<int> of length m, code j = nearest
    * codebook-j centroid of subvector j.  One small expression tree
    * regardless of m·k — the codebooks travel as a nested literal and
    * the per-cell loop is a higher-order transform.
    */
  def encode(vec: Column, books: Seq[Array[Array[Double]]]): Column = {
    require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
      "Pq.encode: empty or degenerate codebooks — train on a non-empty corpus first")
    val m = books.size
    val sub = books.head.head.length
    val bl = bookLit(books)
    transform(sequence(lit(0), lit(m - 1)), j =>
      nearestCell(bl, j,
        slice(vec.cast("array<double>"), j * sub + 1, lit(sub))))
  }

  /** Reconstructed (decoded) vector from a code column: concatenation
    * of the coded centroids, as array<float> so it feeds the same fused
    * cosine the exact path uses.
    */
  def reconstruct(codes: Column, books: Seq[Array[Array[Double]]]): Column = {
    val bl = bookLit(books)
    val parts = books.indices.map { j =>
      element_at(element_at(bl, j + 1), element_at(codes, j + 1) + 1)
    }
    transform(concat(parts: _*), x => x.cast("float"))
  }

  /** Per-(subspace, cell) squared centroid norms as an m×k literal —
    * the driver-side half of the ADC cosine denominator.  Summed on the
    * driver in fixed index order, so the literal is deterministic.
    */
  private def centNorm2Lit(books: Seq[Array[Array[Double]]]): Column =
    typedLit(books.map(_.map(c => c.map(x => x * x).sum).toSeq))

  /** The persisted-index half: (corpus_id, codes, rnorm2) — m small
    * codes plus ONE double (the reconstructed vector's squared norm,
    * `Σ_j ‖centroid_{j,code_j}‖²`) instead of the embedding; write this
    * once, search it for every query batch (the same split contract as
    * [[Similarity.ivfIndex]] / [[Similarity.ivfSearch]]).  Storing
    * rnorm2 at encode time is what makes ADC scoring O(m) per pair —
    * the search never reconstructs.
    */
  def encodeTable(corpus: DataFrame, books: Seq[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    // codes lands in its own projection and is referenced twice below
    // (output + rnorm2), so CollapseProject cannot re-inline the encode
    // expression into the norm lookup
    corpus.select(col(idCol).as("corpus_id"),
        encode(col(vecCol), books).as("codes"))
      .select(col("corpus_id"), col("codes"),
        aggregate(
          zip_with(col("codes"), centNorm2Lit(books),
            (c, row) => element_at(row, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("rnorm2"))

  /** Per-query ADC lookup table: lut(j)(c) = ⟨q_j, centroid_{j,c}⟩, an
    * m×k array-of-arrays computed ONCE per query row (the query side is
    * a bounded batch).  With the stored `rnorm2`, the asymmetric cosine
    * of (query, coded doc) is `Σ_j lut(j)(code_j) / (‖q‖·√rnorm2)` —
    * m table lookups per pair (Jégou et al. 2011 §IV's ADC, adapted
    * from L2 to cosine), instead of the O(d) per-pair reconstruction a
    * naive asymmetric search would do.
    */
  private def adcLut(qvec: Column, books: Seq[Array[Array[Double]]]): Column = {
    val m = books.size
    val sub = books.head.head.length
    val bl = bookLit(books)
    val qd = qvec.cast("array<double>")
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(bl, j + 1), c =>
        dot(slice(qd, j * sub + 1, lit(sub)), c)))
  }

  /** ADC cosine from materialized (lut, qnorm) query columns and
    * (codes, rnorm2) corpus columns — the O(m) scoring kernel shared by
    * [[searchEncoded]] and [[ivfPqSearch]].
    */
  private def adcCos(lut: Column, qnorm: Column,
      codes: Column, rnorm2: Column): Column = {
    val num = aggregate(
      zip_with(codes, lut, (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    when(qnorm > 0 && rnorm2 > 0, num / (qnorm * sqrt(rnorm2)))
      .otherwise(lit(0.0))
  }

  /** Search a code table built by [[encodeTable]]: queries stay exact
    * (asymmetric), the corpus side stays CODED — each pair costs m
    * lookup-adds against the query's precomputed LUT, never a d-dim
    * reconstruction.  Funnels through the same deterministic
    * [[Similarity.rankTopK]] as every other ANN variant.
    */
  def searchEncoded(coded: DataFrame, books: Seq[Array[Array[Double]]],
      queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      adcLut(col(vecCol), books).as("lut"),
      sqrt(dot(col(vecCol).cast("array<double>"),
        col(vecCol).cast("array<double>"))).as("qnorm"))
    val scored = coded.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        adcCos(col("lut"), col("qnorm"), col("codes"), col("rnorm2")).as("cos"))
    Similarity.rankTopK(scored, k)
  }

  /** IVF-PQ index: the billion-vector layout — every corpus vector
    * coarse-assigned to an IVF cell ([[Similarity.ivfIndex]]) and
    * PQ-coded, so the persisted artifact is (cell_id, corpus_id, codes,
    * rnorm2): m bytes-ish per vector, bucketable by cell_id.  Search
    * probes nProbe cells and ADC-scores only their members.
    */
  def ivfPqIndex(corpus: DataFrame, centroids: DataFrame,
      books: Seq[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Similarity.ivfIndex(corpus, centroids, idCol, vecCol)
      .select(col("cell_id"), col("corpus_id"), encode(col("cvec"), books).as("codes"))
      .select(col("cell_id"), col("corpus_id"), col("codes"),
        aggregate(
          zip_with(col("codes"), centNorm2Lit(books),
            (c, row) => element_at(row, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("rnorm2"))

  /** IVF-PQ search over an [[ivfPqIndex]] artifact: nProbe coarse cells
    * per query (exact query-to-centroid cosine, same probe ranking and
    * tie-break as [[Similarity.ivfSearch]]), then ADC scoring of the
    * probed cells' codes — the scoring join is an equi-join on cell_id
    * against the broadcast (query, cell, LUT) probe table, so at scale
    * it touches only probed buckets of the persisted index.
    */
  def ivfPqSearch(index: DataFrame, centroids: DataFrame,
      books: Seq[Array[Array[Double]]], queries: DataFrame, k: Int,
      nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.cosine_sim
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      adcLut(col(vecCol), books).as("lut"),
      sqrt(dot(col(vecCol).cast("array<double>"),
        col(vecCol).cast("array<double>"))).as("qnorm"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(desc("qsim"), asc("cell_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("qsim", cosine_sim(col("qvec"), col("centroid")))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("cell_id"), col("lut"), col("qnorm"))
    val scored = index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        adcCos(col("lut"), col("qnorm"), col("codes"), col("rnorm2")).as("cos"))
    Similarity.rankTopK(scored, k)
  }

  /** One-shot convenience: train + encode + search. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 32, kCents: Int = 32, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val books = train(corpus, idCol, vecCol, m, kCents, iters)
    searchEncoded(encodeTable(corpus, books, idCol, vecCol), books,
      queries, k, idCol, vecCol)
  }

  /** One-shot IVF-PQ: centroids + coded index + probed ADC search. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 32, kCents: Int = 32,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val books = train(corpus, idCol, vecCol, m, kCents, iters)
    val centroids = Similarity.ivfCentroids(corpus, nCells, idCol, vecCol)
    ivfPqSearch(ivfPqIndex(corpus, centroids, books, idCol, vecCol),
      centroids, books, queries, k, nProbe, idCol, vecCol)
  }
}
