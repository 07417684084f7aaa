package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: groups pairs
  * (id_a, id_b) into clusters labeled by their minimum member id, so a
  * corpus can keep exactly one representative per duplicate cluster
  * (pairs alone under-remove: a~b, b~c must collapse a,b,c together).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14).
  * Unlike plain min-label propagation — whose round count is the graph
  * DIAMETER, so a 10k-long chain of templated near-dups silently
  * exhausts any fixed iteration budget — star contraction halves tree
  * heights every round and provably converges in O(log n) rounds on ANY
  * topology.  Each round is two shuffles on vertex id; no driver-side
  * graph, no collect: scales to any pair count Spark can shuffle.
  *
  * Scale mechanics: the (possibly expensive) upstream pair-generation
  * plan is cut off with an eager `localCheckpoint` before the loop, so
  * iterations never re-evaluate it; each round's edge set is
  * checkpointed too, keeping the plan O(1) instead of O(iterations).
  * Convergence = the edge set reaches the star fixpoint (no edge
  * rewrites in a round); if the budget is somehow exhausted first the
  * operator THROWS rather than return partial labels.
  */
object DupClusters {

  /** @param pairs DataFrame with two long columns (id_a, id_b)
    * @return (id, cluster) — cluster = min id reachable from id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // All vertex ids (for labeling isolated/self-paired nodes at the end)
    val nodes = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id")))
      .distinct()
      .localCheckpoint()
    // Canonical proper edges (u > v), materialized ONCE; localCheckpoint
    // is eager and truncates lineage, so the contraction loop below
    // never touches the candidate-generation pipeline again.
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: for every vertex x, link each strictly-LARGER
      // neighbor to the minimum of x's closed neighborhood.  Operates on
      // the symmetric view; emitted edges keep u > v ≥ min, so they stay
      // proper.
      val sym = edges.select(col("u").as("x"), col("v").as("n"))
        .union(edges.select(col("v").as("x"), col("u").as("n")))
      val lsMin = sym.groupBy("x").agg(min(col("n")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      val afterLarge = sym.join(lsMin, "x")
        .filter(col("n") > col("x"))
        .select(col("n").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // SMALL-STAR: every vertex links its smaller-or-equal neighbors
      // (and itself) to the minimum of its closed neighborhood.  Input
      // edges are proper (u > v), so grouping by u sees exactly the
      // smaller neighbors; min neighbor IS the neighborhood min.
      val ssMin = afterLarge.groupBy(col("u").as("x"))
        .agg(min(col("v")).as("m"))
      val relink = afterLarge
        .join(ssMin, afterLarge("u") === ssMin("x"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      val selfLink = ssMin.select(col("x").as("u"), col("m").as("v"))
      val next = relink.union(selfLink).distinct().localCheckpoint()
      // Fixpoint: a round that rewrites nothing.  Both edge sets are
      // DISTINCT, so set equality = equal counts + empty one-sided
      // difference; the previous round's count is remembered (not
      // re-counted), and the difference runs as one anti-join with a
      // take(1) short-circuit instead of the former exceptAll
      // (aggregate + join) — one cheap action per round instead of
      // three (r16, guide §1.2: iterative protocols pay per action).
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (rounds needed is O(log n), so this indicates " +
          "a pathological input, not a deep graph)")
    // At the fixpoint every component is a star rooted at its minimum:
    // edges are exactly (member, root).  Root and isolated vertices
    // label themselves.
    nodes.join(edges, nodes("id") === edges("u"), "left_outer")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster"))
  }

  /** Cluster summary: size + member list per duplicate cluster. */
  def clusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"), sort_array(collect_list(col("id"))).as("members"))
      .filter(col("size") > 1)
}
