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

  /** Blocking-quality audit — the go/no-go BEFORE running pairwise
    * entity matching at scale: a blocking key must kill almost all of
    * the N² candidate space (reduction ratio) while keeping the known
    * duplicate pairs co-blocked (pair completeness, measured against a
    * labelled truth-pair set, the standard ER evaluation protocol).
    *
    * Exactness: candidate pairs are Σ_blocks n_b(n_b−1)/2 — exact
    * integers (the product of consecutive integers is even, so the
    * halving is exact); both ratios are integral ppm divisions.
    * Records with a NULL blocking key block with nothing (standard
    * semantics) but still count in N.
    *
    * Scale shape: one map-side-combined count per block (shuffle =
    * #blocks rows), one 1-row total, and two id-keyed equi-joins to
    * attach keys to the truth pairs — never a pair materialization.
    *
    * @param records (idCol, keyCol) frame; @param truthPairs (a, b)
    *        labelled duplicate pairs over the same ids
    * @return one row: (n_records, n_blocks, candidate_pairs,
    *         all_pairs, reduction_ppm, true_pairs, captured_pairs,
    *         completeness_ppm — −1 when the truth set is empty)
    */
  def blockingQuality(records: DataFrame, idCol: String, keyCol: String,
      truthPairs: DataFrame): DataFrame = {
    val keyed = records.select(col(idCol).as("__id"),
      col(keyCol).as("__k"))
    val blocks = keyed.filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__nb"))
    val blockAgg = blocks.agg(
      count(lit(1)).as("n_blocks"),
      coalesce(sum(expr(
        "CAST(__nb AS DECIMAL(38,0)) * (__nb - 1) div 2")), lit(0L))
        .cast("decimal(38,0)").as("__cand"))
    val totals = keyed.agg(count(lit(1)).as("n_records"))
    val t = truthPairs.select(col("a").as("__a"), col("b").as("__b"))
    val cap = t
      .join(keyed.select(col("__id").as("__a"), col("__k").as("__ka")),
        Seq("__a"))
      .join(keyed.select(col("__id").as("__b"), col("__k").as("__kb")),
        Seq("__b"))
      .agg(count(lit(1)).as("true_pairs"),
        coalesce(sum(when(col("__ka").isNotNull &&
          (col("__ka") === col("__kb")), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("captured_pairs"))
    totals.crossJoin(blockAgg).crossJoin(cap)
      .selectExpr("n_records", "n_blocks",
        "CAST(__cand AS BIGINT) AS candidate_pairs",
        "CAST(CAST(n_records AS DECIMAL(38,0)) * (n_records - 1) div 2 " +
          "AS BIGINT) AS all_pairs",
        "CAST(CASE WHEN n_records >= 2 THEN " +
          "((CAST(n_records AS DECIMAL(38,0)) * (n_records - 1) div 2 " +
          "- __cand) * 1000000) " +
          "div (CAST(n_records AS DECIMAL(38,0)) * (n_records - 1) div 2) " +
          "ELSE -1 END AS BIGINT) AS reduction_ppm",
        "true_pairs", "captured_pairs",
        "CAST(CASE WHEN true_pairs > 0 THEN " +
          "(CAST(captured_pairs AS DECIMAL(38,0)) * 1000000) " +
          "div true_pairs ELSE -1 END AS BIGINT) AS completeness_ppm")
  }
}
