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
  *
  * Scale mechanics: the (possibly expensive) upstream pair-generation
  * plan is cut off with an eager `localCheckpoint` before the loop, so
  * iterations never re-evaluate it; each iteration's labels are
  * checkpointed too, keeping the plan O(1) instead of O(iterations).
  * Convergence is detected without a labels⋈labels diff join: labels
  * only ever decrease under min-propagation, so the fixpoint is reached
  * exactly when sum(label) stops decreasing — a single cheap aggregate
  * over the already-materialized labels.
  */
object DupClusters {

  /** @param pairs DataFrame with two long columns (id_a, id_b)
    * @return (id, cluster) — cluster = min id reachable from id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // Bidirectional edge list, materialized ONCE; localCheckpoint is
    // eager and truncates lineage, so the fixpoint loop below never
    // touches the candidate-generation pipeline again.
    val edgesRaw = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    // Size the iteration to the GRAPH, not the corpus: near-dup pair
    // graphs are orders of magnitude smaller than their corpus, and a
    // fixpoint loop at corpus parallelism pays per-iteration scheduling
    // for empty partitions.  ~100k edges per partition keeps tasks busy.
    val nEdges = edgesRaw.count()
    val parts = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt))
    val edges = edgesRaw.repartition(parts, col("dst")).localCheckpoint()

    def labelSum(df: DataFrame): BigDecimal = {
      val row = df.agg(sum(col("cluster").cast("decimal(38,0)"))).head()
      if (row.isNullAt(0)) BigDecimal(0) else BigDecimal(row.getDecimal(0))
    }

    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge src->dst, dst's current label;
      // a vertex keeps the least of its own and its neighbors' labels.
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      // Labels decrease monotonically, so an unchanged sum IS the
      // fixpoint — no diff join, and the aggregate runs over the
      // partitions the checkpoint just materialized.
      val newSum = labelSum(updated)
      converged = newSum == prevSum
      prevSum = newSum
      labels = updated
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
