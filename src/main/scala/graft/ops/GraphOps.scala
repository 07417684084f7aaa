package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality over edge lists.  Complements
  * [[DupClusters]] (connected components): where components answer
  * "which documents are the same", PageRank answers "which nodes are
  * authoritative" — the web-graph quality prior used to weight crawl
  * data in training pipelines.
  *
  * All rank arithmetic is INTEGER micro-units: contributions are
  * `floor(rank·w/W)` and damping is `floor(x·85/100)`, so every
  * iteration is exact and the result is bit-identical under any
  * partitioning or iteration schedule — no floating-point drift, which
  * also makes it directly oracle-checkable against an unrolled SQL twin.
  */
object GraphOps {

  /** Weighted PageRank, fixed iteration count, damping 0.85.
    *
    * `edges` must have (src, dst, w) columns.  Each iteration is one
    * join (ranks ⋈ edges on src — broadcast when ranks are node-sized,
    * shuffle otherwise) and one aggregation on dst; dangling nodes
    * contribute nothing (documented contract).  Returns (node,
    * rank_micro) with ranks in micro-units starting from 1e6.
    */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    // Materialize the edge list ONCE: the out-weight aggregation, the
    // node set (two references via the union), the weighted-edge join
    // and every iteration all consume it, and `edges` is typically the
    // output of an expensive upstream plan (a multi-way fact join) —
    // without the checkpoint that plan re-runs 4+k times per call
    // (observed 3.5x on the trade-graph gate).  At scale this is the
    // "persist the edge list, iterate over it" contract every
    // distributed PageRank assumes.
    val eMat = CacheScope.traced(edges)
    val outW = eMat.groupBy("src").agg(sum("w").as("w_out"))
    val nodes = eMat.select(col("src").as("node"))
      .union(eMat.select(col("dst").as("node"))).distinct()
    val e = eMat.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("w_out"))
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iterations) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"),
          floor(col("rank_micro") * col("w") / col("w_out")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").cast("long").as("in_micro"))
      // cut plan lineage each round: without this the plan chains k
      // joins, analysis cost grows per iteration and any action
      // recomputes every earlier round (same reason Bpe.learnMerges
      // checkpoints).  LAZY checkpoint: eager would run one job per
      // iteration just to materialize a node-sized frame — the final
      // action materializes the chain once, and each round still
      // caches.  `traced` keeps column lineage chaining through every
      // round's LogicalRDD.
      ranks = CacheScope.traced(
        nodes.join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit(150000L) + floor(coalesce(col("in_micro"), lit(0L)) * 85 / 100)
              .cast("long")).as("rank_micro")),
        eager = false)
    }
    ranks
  }

  /** Canonical undirected edge set: (u < v), self-loops dropped. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** One peel round: drop every vertex of degree < k and the edges
    * touching it.  Degrees are one symmetric aggregation; the cut is
    * two semi-joins on the endpoint — all equi-shuffles on node id.
    */
  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val keep = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
      .select(col("n"))
    e.join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
      .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("deg"))

  /** k-core decomposition membership (Matula/Beck peel, distributed):
    * repeatedly delete vertices of degree < k until every survivor has
    * degree >= k.  Returns (node, deg) over the k-core subgraph.
    * Round count is bounded by the peel depth, not the diameter; each
    * round materializes the shrinking edge set (localCheckpoint) so
    * the plan stays O(1).  Throws rather than return a partial core
    * when `maxIter` is exhausted — same loud-failure contract as
    * [[DupClusters.connectedComponents]].
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = canonical(edges).localCheckpoint()
    var prev = e.count()
    var converged = prev == 0L
    var i = 0
    while (!converged && i < maxIter) {
      e = peelOnce(e, k).localCheckpoint()
      val c = e.count()
      // unchanged edge count <=> no vertex was under-degree <=> fixpoint
      converged = c == prev || c == 0L
      prev = c
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIter peels — raise maxIter " +
          "(rounds are bounded by the peel depth of the graph)")
    degrees(e)
  }

  /** Fixed-round peel toward the (max-degree-relative) core: k is
    * computed from the canonical graph's maximum degree as
    * `max(2, maxDeg·num/den)` (driver-side scalar — one aggregate over
    * the node-sized degree table), then exactly `rounds` peels run.
    * The FIXED round count (rather than peel-to-fixpoint) is what
    * makes the operator expressible as an unrolled SQL twin, the same
    * contract as [[pageRank]]'s fixed iterations; converged inputs are
    * simply unchanged by the extra rounds.
    */
  def kCorePeelRelative(edges: DataFrame, num: Int, den: Int,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && num >= 1 && den >= num,
      s"need rounds >= 1 and 0 < num/den <= 1, got $num/$den x$rounds")
    var e = canonical(edges).localCheckpoint()
    val maxDeg = degrees(e).agg(max(col("deg"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val k = math.max(2L, maxDeg * num / den).toInt
    for (_ <- 1 to rounds) e = peelOnce(e, k).localCheckpoint()
    degrees(e)
  }

  /** Deterministic weighted random walks — the node2vec/DeepWalk
    * corpus generator, with the RNG replaced by hash arithmetic so the
    * walk corpus is bit-identical on any cluster, any partitioning,
    * any retry.  Each node starts `walksPerNode` walks; at step `s`
    * walk `w` draws `(w·2654435761 + s·40503 + seed) mod out-weight`
    * and follows the edge whose cumulative-weight interval contains
    * the draw (integer inverse-CDF per node, same device as
    * [[PipelineOps.sampleCategorical]]).
    *
    * Scale shape: the per-node cumulative intervals are built ONCE
    * (one window PARTITIONED by source node, outdeg-bounded) and laid
    * out as a BINNED index — each interval exploded to the coarse bins
    * it overlaps, bin width = the node's mean edge weight (floored to
    * ≥ total/4096 so no edge explodes to more than ~4k bins), the same
    * device as [[PipelineOps.sampleCategorical]] /
    * [[RangeJoin.binned]].  Each step then equi-joins the frontier on
    * (node, bin-of-draw): a walk meets only the O(1)-expected
    * intervals sharing its draw's bin, NEVER the node's full edge
    * list — a 10⁶-out-degree hub multiplies a resting walk by ~2 rows
    * per step (≤ deg/4096 + 1 worst case), not by 10⁶.  The walk's
    * current-node scalars (total weight, bin width) ride ON the index
    * rows of the edge that produced it, so a step is exactly one join.
    *
    * Requires LONG node ids and that every `dst` also appears as a
    * `src` (true for symmetric graphs) — walkers then never strand.
    *
    * @return (walk_id, path) with path = "n0->n1->...->nk"
    */
  def deterministicWalks(edges: DataFrame, walksPerNode: Int, steps: Int,
      seed: Long): DataFrame = {
    val (walks, binsIdx) = walkFrontier(edges, walksPerNode, steps, seed)
    val out = walks.select(col("walk_id"), col("path"))
    CacheScope.releasing(out, binsIdx)
  }

  /** [[deterministicWalks]] before its lineage-erasing checkpoint —
    * exposed so specs can assert the per-step (node, bin) join shape.
    * Returns (frontier, persisted bin index); the caller owns the
    * index's unpersist. */
  private[graft] def walkFrontier(edges: DataFrame, walksPerNode: Int,
      steps: Int, seed: Long): (DataFrame, DataFrame) = {
    require(walksPerNode >= 1 && steps >= 1)
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // Materialize the caller's edge plan ONCE: `base` feeds `stats`
    // and `cum`, and `stats` feeds the index join, the dst-scalars
    // side AND the walk-frontier init — without the checkpoint every
    // occurrence re-evaluated the (possibly expensive) upstream edge
    // build per plan branch (the round-8 pageRank lesson; BenchProbe
    // r16 measured the q_random_walks co-occurrence build running 6+
    // times per call).  Edge-list-sized and node-sized frames
    // respectively — the same storage class as the binned index below.
    val base = CacheScope.traced(edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("__w"))
      .filter(col("__w") > 0))
    // per-node distribution scalars: total weight and bin width (mean
    // edge weight, clamped so one node never spans more than ~2·4096
    // bins — bounds both the sequence() explosion of a dominant edge
    // and the per-bin candidate count of a uniform hub)
    val stats = CacheScope.traced(base.groupBy(col("src"))
      .agg(sum(col("__w")).as("__total"), count(lit(1)).as("__deg"))
      .select(col("src"), col("__total"),
        greatest(lit(1L), expr("__total div least(__deg, 4096L)"))
          .as("__binw")))
    val cum = base
      .withColumn("__lo", coalesce(sum(col("__w")).over(wnd), lit(0L)))
    // binned inverse-CDF index, built once and reused by every step;
    // each row carries the DESTINATION node's scalars so the frontier
    // never needs a second join to draw its next step
    val dstStats = stats.select(col("src").as("__d2"),
      col("__total").as("__dt"), col("__binw").as("__dbw"))
    val binsIdx = cum.join(stats, Seq("src"))
      .withColumn("__b", explode(sequence(
        expr("__lo div __binw"), expr("(__lo + __w - 1) div __binw"))))
      .join(dstStats, col("dst") === col("__d2"))
      .select(col("src").as("__s"), col("__b"), col("dst").as("__d"),
        col("__lo").as("__ll"), col("__w").as("__ww"),
        col("__dt"), col("__dbw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var walks = stats
      .select(col("src").as("__cur"), col("__total").as("__tt"),
        col("__binw").as("__bw"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("__j"))
      .select((col("__cur") * walksPerNode + col("__j")).as("walk_id"),
        col("__cur"), col("__cur").cast("string").as("path"),
        col("__tt"), col("__bw"))
    for (s <- 1 to steps) {
      walks = walks
        .withColumn("__u", pmod(
          col("walk_id") * 2654435761L + lit(s * 40503L) + seed,
          col("__tt")))
        .withColumn("__ub", expr("__u div __bw"))
        .join(binsIdx,
          col("__cur") === col("__s") && col("__ub") === col("__b"))
        .filter(col("__u") >= col("__ll") &&
          col("__u") < col("__ll") + col("__ww"))
        .select(col("walk_id"), col("__d").as("__cur"),
          concat(col("path"), lit("->"), col("__d").cast("string"))
            .as("path"),
          col("__dt").as("__tt"), col("__dbw").as("__bw"))
    }
    (walks, binsIdx)
  }

  /** Item-item co-occurrence similarity (the item-based collaborative-
    * filtering kernel): from a (user, item) interaction stream, count
    * for every item pair how many users touched BOTH, and score the
    * pair by cosine over the user sets — `n_ab / √(n_a · n_b)`.
    *
    * Scale shape: interactions first collapse to DISTINCT (user, item)
    * — one shuffle on the user key — then the pair generation is a
    * self-equi-join on user, so the quadratic term is per-user
    * (Σ|items(u)|², the standard CF bound; cap items-per-user upstream
    * for power users, exactly the salting/ceiling every production CF
    * applies), never |items|² globally.  Pair counts and the two
    * item-degree joins all shuffle fixed-width keys.
    *
    * @param minUsers drop pairs co-seen by fewer users (noise floor)
    * @return (item_a, item_b, n_ab, cosine) with item_a < item_b
    */
  def itemCooccurrence(df: DataFrame, userCol: String, itemCol: String,
      minUsers: Long): DataFrame = {
    require(minUsers >= 1)
    // The distinct (user, item) table feeds three plan branches (both
    // self-join sides + the item-degree counts); the branches share ONE
    // physical distinct via exchange reuse (identical subtrees — AQE
    // ReusedExchange), so no operator-level persist is needed: a cache
    // here measured SLOWER (r16 — concurrent branches serialize on the
    // unmaterialized cache's block locks) and the upstream parse cost
    // belongs to the caller's layout (see q_item_cooc's fanOut).
    val ui = df.select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull).distinct()
    val counts = ui.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = ui.select(col("__u"), col("__i").as("item_a"))
      .join(ui.select(col("__u"), col("__i").as("item_b")), Seq("__u"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minUsers)
    val out = pairs
      .join(counts.select(col("__i").as("item_a"), col("__n").as("__na")),
        Seq("item_a"))
      .join(counts.select(col("__i").as("item_b"), col("__n").as("__nb")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / sqrt((col("__na") * col("__nb")).cast("double")),
          6).as("cosine"))
    out
  }
}
