package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: groups pairs
  * (id_a, id_b) into clusters labeled by their minimum member id, so a
  * corpus can keep exactly one representative per duplicate cluster
  * (pairs alone under-remove: a~b, b~c must collapse a,b,c together).
  *
  * Algorithm: iterative min-label propagation (each vertex adopts the
  * smallest label among itself and its neighbors) until fixpoint.
  * Every iteration is one shuffle on vertex id; convergence needs at
  * most the graph diameter in rounds — near-dup graphs are unions of
  * small cliques, so 2-3 rounds in practice.  No driver-side graph,
  * no collect: scales to any pair count Spark can shuffle.
  */
object DupClusters {

  /** @param pairs DataFrame with two long columns (id_a, id_b)
    * @return (id, cluster) — cluster = min id reachable from id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edgesRaw = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size the iteration to the GRAPH, not the corpus: near-dup pair
    // graphs are orders of magnitude smaller than their corpus, and a
    // fixpoint loop at corpus parallelism pays per-iteration scheduling
    // for empty partitions.  ~100k edges per partition keeps tasks busy.
    val nEdges = edgesRaw.count()
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt))
    val edges = edgesRaw.repartition(parts, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge src->dst, dst's current label
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = updated.join(labels.withColumnRenamed("cluster", "old"), Seq("id"))
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Cluster summary: size + member list per duplicate cluster. */
  def clusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"), sort_array(collect_list(col("id"))).as("members"))
      .filter(col("size") > 1)
}
