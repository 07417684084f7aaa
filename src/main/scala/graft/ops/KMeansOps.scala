package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd k-means over an embedding column — the clustering
  * step of training-data curation (domain balancing, semantic dedup
  * buckets, data-mix analysis).  Deterministic end to end: centroid
  * init is key arithmetic (the first k vector ids, same device as
  * [[Similarity]]'s IVF coarse quantizer — no RNG, no shipped state),
  * assignment ties break toward the smaller cell id, and the mean is an
  * exact per-dimension average.
  *
  * Scale shape per iteration:
  *  - assignment: centroids (k·d doubles) broadcast; the corpus streams
  *    once through a codegen'd distance projection and a partial-agg
  *    argmin — the only shuffle carries one (id, cell, d2) row per
  *    vector, never the expanded k-way cross product;
  *  - update: per-dimension means via posexplode + partial agg — the
  *    shuffle carries d rows per vector of 16 bytes, with map-side
  *    combine collapsing them to (k·d) groups per partition first;
  *  - the tiny centroid table is `localCheckpoint`ed so the iteration
  *    loop's lineage stays O(1) instead of stacking k plan copies
  *    (the q_dup_clusters lesson from round 1).
  */
object KMeansOps {

  /** Squared Euclidean distance between two double-array columns. */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Assign every vector to its nearest centroid.
    * Input emb: (idCol, __vec); centroids: (__cell, __cvec).
    * Output: (idCol, cell, d2, __vec).
    */
  private def assign(emb: DataFrame, centroids: DataFrame, idCol: String): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("__d2", dist2(col("__vec"), col("__cvec")))
      .groupBy(col(idCol))
      .agg(
        // deterministic argmin: nearest centroid, smaller cell id on ties
        min_by(col("__cell"), struct(col("__d2"), col("__cell"))).as("cell"),
        min(col("__d2")).as("d2"),
        first(col("__vec")).as("__vec"))

  /** Recompute centroids as per-dimension means of their members.
    * Cells that lost all members drop out (standard Lloyd behavior).
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("__vec")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("__cvec"))
      .select(col("cell").as("__cell"), col("__cvec"))
      .localCheckpoint()

  /** Run `iters` Lloyd iterations; returns (idCol, cell, d2) — the final
    * assignment and its squared distance.  `iters = 0` returns the
    * assignment under the initial centroids (useful for cost baselines).
    */
  def fit(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0)
    val emb = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("__vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // first k vectors BY RANK of id (not `id < k`, which assumes a
    // dense 0-based id space and would silently under-provision
    // centroids for 1-based or hashed ids); the single-partition
    // row_number window runs over only the k limited rows
    val rankW = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    var centroids = emb.orderBy(col(idCol)).limit(k)
      .select((row_number().over(rankW) - 1).cast("long").as("__cell"),
        col("__vec").as("__cvec"))
      .localCheckpoint()
    var assigned = assign(emb, centroids, idCol)
    for (_ <- 0 until iters) {
      centroids = update(assigned)
      assigned = assign(emb, centroids, idCol)
    }
    // final assignment is 3 narrow columns per id: materialize it and
    // release the cached embedding projection
    CacheScope.releasing(assigned.select(col(idCol), col("cell"), col("d2")), emb)
  }

  /** Mean squared distance of an assignment — the Lloyd objective. */
  def cost(assigned: DataFrame): Double =
    assigned.agg(avg(col("d2"))).head().getDouble(0)
}
