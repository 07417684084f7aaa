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

  /** Per-field survivorship rule for [[survivorship]] — every rule is
    * a deterministic total order, so the golden record is identical on
    * any cluster and any partitioning.
    */
  sealed trait SurvivorRule
  object SurvivorRule {
    /** newest non-null value, order = lexicographic on `orderCols`
      * (include a unique id as the last column) */
    final case class Newest(orderCols: Seq[String]) extends SurvivorRule
    /** longest string; ties break to the lexicographically LARGEST */
    case object Longest extends SurvivorRule
    /** numeric maximum */
    case object MaxNum extends SurvivorRule
    /** most frequent value; ties break to the SMALLEST value */
    case object ModeAsc extends SurvivorRule
  }

  /** Survivorship / golden-record merge — the step AFTER matching: each
    * cluster of records referring to one entity collapses to a single
    * row, field by field, under the caller's rules.
    *
    * Scale shape: all Newest/Longest/MaxNum fields fold into ONE
    * hash aggregation on the cluster key (max_by/max partials combine
    * map-side); each ModeAsc field costs one extra (cluster, value)
    * pre-aggregation — value-cardinality-sized, joined back on the
    * cluster key.  Nothing is ever ordered globally and no cluster's
    * records need to fit one task beyond its aggregation buffer.
    *
    * @param fields (outputName, sourceColumn, rule) per golden field
    * @return one row per cluster: (clusterCol, outputName...)
    */
  def survivorship(records: DataFrame, clusterCol: String,
      fields: Seq[(String, String, SurvivorRule)]): DataFrame = {
    import SurvivorRule._
    require(fields.nonEmpty)
    val onePass = fields.collect {
      case (out, f, Newest(ord)) =>
        max_by(col(f), when(col(f).isNotNull,
          struct(ord.map(col): _*))).as(out)
      case (out, f, Longest) =>
        max_by(col(f), when(col(f).isNotNull,
          struct(length(col(f)), col(f)))).as(out)
      case (out, f, MaxNum) => max(col(f)).as(out)
    }
    val base =
      if (onePass.nonEmpty)
        records.groupBy(col(clusterCol)).agg(onePass.head, onePass.tail: _*)
      else records.select(col(clusterCol)).distinct()
    val withModes = fields.collect { case (out, f, ModeAsc) => (out, f) }
      .foldLeft(base) { case (acc, (out, f)) =>
        val mode = records.filter(col(f).isNotNull)
          .groupBy(col(clusterCol), col(f)).agg(count(lit(1)).as("__cnt"))
          .groupBy(col(clusterCol))
          .agg(min_by(col(f), struct(negate(col("__cnt")), col(f))).as(out))
        acc.join(mode, Seq(clusterCol), "left")
      }
    // column order follows the caller's field list
    withModes.select(col(clusterCol) +: fields.map(f => col(f._1)): _*)
  }
}
