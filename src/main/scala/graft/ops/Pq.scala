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
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
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

  /** The persisted-index half: (corpus_id, codes) — 32 ints per vector
    * instead of the embedding; write this once, search it for every
    * query batch (the same split contract as [[Similarity.ivfIndex]] /
    * [[Similarity.ivfSearch]]).
    */
  def encodeTable(corpus: DataFrame, books: Seq[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
      encode(col(vecCol), books).as("codes"))

  /** Search a code table built by [[encodeTable]]: queries stay exact
    * (asymmetric), the corpus side is PQ-reconstructed.  Funnels
    * through the same deterministic [[Similarity.rankTopK]] as every
    * other ANN variant.
    */
  def searchEncoded(coded: DataFrame, books: Seq[Array[Array[Double]]],
      queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = coded.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        graft.functions.cosine_sim(col("qvec"),
          reconstruct(col("codes"), books)).as("cos"))
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
}
