package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * standard graph-density diagnostic (clustering coefficient numerator)
  * for co-occurrence / similarity graphs; alongside [[GraphOps.pageRank]]
  * and [[DupClusters]] it completes the graph toolkit a curation
  * pipeline needs (dense near-dup neighborhoods show up as triangle-rich
  * clusters long before connected components merge them).
  *
  * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11).
  * Each undirected edge is directed from its lower-degree endpoint to
  * the higher (ties by node id), then wedges `a→b, a→c` are joined
  * against oriented edges `b→c`.  Orientation bounds every node's
  * out-degree by O(√m), so the wedge join is Σ outdeg² ≤ O(m^1.5)
  * TOTAL — independent of max degree.  A hub with 10M neighbors
  * produces no 10M²-row wedge explosion; the hub's edges all point
  * INTO it and contribute no wedges at all.  Both joins are plain
  * shuffle equi-joins on node keys; nothing collects.
  */
object Triangles {

  /** Count triangles per node from an undirected edge list.
    *
    * `edges` must have (src, dst) columns, one row per undirected edge
    * in either order; duplicates and self-loops are removed here.
    * Returns (node, n_triangles) for every node in at least one
    * triangle; each triangle contributes 1 to each of its 3 corners.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient: (deg, id) lexicographic — a total order, so exactly one
    // direction per edge and the orientation is acyclic
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    // wedges a→b, a→c with b<c impossible to guarantee (orientation is
    // by degree), so take unordered pairs out of a's out-neighborhood
    val w1 = oriented.select(col("a"), col("b"))
    val w2 = oriented.select(col("a"), col("b").as("c"))
    val wedges = w1.join(w2, "a").filter(col("b") < col("c"))
    // close the wedge: the third edge b–c may be oriented either way,
    // so match against the canonical undirected (min,max) edge set
    val closing = und.select(col("u").as("x"), col("v").as("y"))
    val tris = wedges.join(closing,
      least(col("b"), col("c")) === col("x") &&
        greatest(col("b"), col("c")) === col("y"))
      .select(col("a"), col("b"), col("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /** Global triangle count (each triangle once). */
  def globalCount(edges: DataFrame): DataFrame =
    perNode(edges).agg(sum("n_triangles").cast("long").as("s"))
      .select(expr("s div 3").cast("long").as("n_triangles"))
}
