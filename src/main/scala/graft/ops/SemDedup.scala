package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/** Semantic deduplication over an embedding column (the SemDeDup
  * recipe: Abbas et al. 2023, arXiv:2303.09540): cluster the corpus
  * with k-means, compare pairs ONLY within a cluster, connect pairs
  * above the cosine threshold into components, and keep one
  * representative (minimum id) per component.
  *
  * Scale design: the quadratic term is confined to within-cell
  * self-joins — with k sized so cells hold ~10³ members, a 10⁹-doc
  * corpus costs Σ|cell|² ≈ n·10³ comparisons sharded across one
  * equi-shuffle on `cell`, never an n² cross-join.  The cosine kernel
  * is the codegen [[graft.functions.CosineSimilarityF]] expression
  * (allocation-free, whole-stage), assignment is centroid-literal
  * arithmetic from [[KMeansOps]] (no shuffle), and component labeling
  * is the O(log n)-round star contraction in [[DupClusters]].
  * Cross-cell near-duplicates are out of contract — the SemDeDup
  * trade: k-means cells approximate semantic neighborhoods, and a pair
  * split across cells was far enough apart to survive (raise `iters`
  * or lower `k` to tighten recall).
  */
object SemDedup {

  /** Label every row with its duplicate component and a keep flag.
    *
    * @param emb    input with (idCol, vecCol: array<float>)
    * @param k      number of k-means cells (size so n/k fits a task)
    * @param tau    cosine threshold for "semantic duplicate"
    * @param iters  Lloyd iterations for the cell map
    * @return (idCol, cell, cluster, keep) — `cluster` is the minimum
    *         member id of the duplicate component (own id if unique),
    *         `keep` marks the one representative per component
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, iters: Int = 2): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val cells = KMeansOps.fit(emb, idCol, vecCol, k, iters)
      .select(col(idCol), col("cell"))
    val v = emb.select(col(idCol), col(vecCol).cast("array<float>").as("__v"))
    val m = cells.join(v, Seq(idCol))
    val l = m.select(col("cell"), col(idCol).as("id_a"), col("__v").as("__va"))
    val r = m.select(col("cell"), col(idCol).as("id_b"), col("__v").as("__vb"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine_sim(col("__va"), col("__vb")) >= tau)
      .select(col("id_a"), col("id_b"))
    val comp = DupClusters.connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    cells.join(comp, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("cluster"), col(idCol)).as("cluster"))
      .withColumn("keep", col("cluster") === col(idCol))
  }
}
