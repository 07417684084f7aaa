package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd k-means over an embedding column — the clustering
  * step of training-data curation (domain balancing, semantic dedup
  * buckets, data-mix analysis).  Deterministic end to end: centroid
  * init is key arithmetic (the first k vector ids by rank, same device
  * as [[Similarity]]'s IVF coarse quantizer — no RNG), assignment ties
  * break toward the smaller cell id, and the mean is an exact
  * per-dimension average.
  *
  * Scale shape per iteration (the classic distributed-Lloyd layout —
  * centroids live on the driver, data never leaves the executors):
  *  - assignment: the k·d centroid matrix (a few KB) is baked into the
  *    plan as literal arrays, so scoring is a PURE whole-stage-codegen
  *    projection over one corpus scan — no join, no shuffle, no
  *    broadcast exchange;
  *  - update: per-dimension means via posexplode + partial agg — the
  *    shuffle carries d rows per vector of 16 bytes, with map-side
  *    combine collapsing them to (k·d) groups per partition first; the
  *    k·d result rows are collected to the driver to form the next
  *    iteration's literals (the only driver traffic, O(k·d) per
  *    iteration — independent of corpus size);
  *  - lineage stays O(1) across iterations because each assignment
  *    plan starts from the cached projection plus fresh literals — no
  *    stacked plan copies, no checkpoints needed.
  */
object KMeansOps {

  /** Squared Euclidean distance between a vector column and a centroid
    * literal.
    */
  private def dist2Lit(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, lit(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Assignment projection under the given centroid matrix: array_min
    * over (d2, cell) structs — nearest centroid, smaller cell on ties.
    * Output: (idCol, cell, d2, __vec).
    */
  private def assign(emb: DataFrame, centroids: Seq[(Long, Array[Double])],
      idCol: String): DataFrame =
    emb.withColumn("__best", array_min(array(centroids.map { case (j, c) =>
        struct(dist2Lit(col("__vec"), c).as("d2"), lit(j).as("cell"))
      }: _*)))
      .select(col(idCol), col("__best.cell").as("cell"),
        col("__best.d2").as("d2"), col("__vec"))

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
    // centroids for 1-based or hashed ids)
    var centroids: Seq[(Long, Array[Double])] =
      emb.orderBy(col(idCol)).limit(k).select(col("__vec")).collect()
        .toSeq.zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Double](0).toArray) }
    var assigned = assign(emb, centroids, idCol)
    for (_ <- 0 until iters) {
      // new centroid = per-dimension mean of the cell's members; cells
      // that lost all members drop out (standard Lloyd behavior).  The
      // collect is k·d rows of 24 bytes — centroid state, not data.
      centroids = assigned
        .select(col("cell"), posexplode(col("__vec")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getLong(0)).toSeq
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
        }
        .sortBy(_._1)
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
