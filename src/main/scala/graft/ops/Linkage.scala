package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): resolve each
  * "dirty" record to its best canonical match by edit distance,
  * comparing ONLY within a cheap deterministic blocking key.
  *
  * Scale design: the all-pairs comparison every naive ER does is
  * replaced by an equi-join on the block key — cost is Σ|block|²,
  * bounded by construction of the key (a prefix, a phonetic code, a
  * zip prefix...), never n².  The refine step (Levenshtein) runs only
  * on block-mates, and the best-match argmin is a hash aggregation on
  * the dirty id whose partial (min of a (dist, id) struct) combines
  * map-side.  Hot blocks at extreme scale are a salting candidate —
  * the key is caller-chosen precisely so it can be composed (prefix +
  * length band) to bound skew.
  */
object Linkage {

  /** Match `dirty` (idD, nameD) against `clean` (idC, nameC).
    *
    * @param blockKey deterministic blocking function applied to BOTH
    *                 name columns; only same-block pairs are compared
    * @param maxDist  maximum Levenshtein distance for a candidate
    * @return one row per MATCHED dirty record: (dirty_id,
    *         n_candidates, best_dist, best_match) where best is the
    *         (distance, clean-id)-lexicographic minimum — fully
    *         deterministic.  Unmatched dirty records are absent
    *         (anti-join them separately for a reject file).
    */
  def resolve(dirty: DataFrame, idD: String, nameD: String,
      clean: DataFrame, idC: String, nameC: String,
      blockKey: Column => Column, maxDist: Int): DataFrame = {
    val d = dirty.select(col(idD).as("__did"), col(nameD).as("__dn"),
      blockKey(col(nameD)).as("__blk"))
    val c = clean.select(col(idC).as("__cid"), col(nameC).as("__cn"),
      blockKey(col(nameC)).as("__blk"))
    d.join(c, "__blk")
      .withColumn("__dist", levenshtein(col("__dn"), col("__cn")).cast("long"))
      .filter(col("__dist") <= maxDist)
      .groupBy("__did")
      .agg(count(lit(1)).as("n_candidates"),
        min(struct(col("__dist"), col("__cid"))).as("__best"))
      .select(col("__did").as("dirty_id"), col("n_candidates"),
        col("__best.__dist").as("best_dist"),
        col("__best.__cid").as("best_match"))
  }
}
