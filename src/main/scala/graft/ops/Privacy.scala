package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification screens run before a dataset release: k-anonymity
  * (every quasi-identifier combination must be shared by ≥ k rows) and
  * l-diversity (each combination must carry ≥ l distinct values of the
  * sensitive attribute — k-anonymous groups can still leak when the
  * sensitive value is constant within a group).
  *
  * Scale shape: one map-side-combined aggregation to the QI-group
  * frame (group-count-sized), then a scalar summary — two shuffles of
  * fixed-width keys, nothing row-scale after the first aggregation.
  * Exact counts, no sampling: a privacy gate that samples can miss
  * exactly the singleton groups it exists to find.
  */
object Privacy {

  /** One summary row:
    * (n_groups, min_group_size, n_groups_below_k, n_rows_below_k,
    * n_groups_below_l, worst_diversity).
    */
  def anonymityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2 && l >= 1)
    val groups = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        count_distinct(col(sensitiveCol)).as("__d"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      min(col("__n")).cast("long").as("min_group_size"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_groups_below_k"),
      sum(when(col("__n") < k, col("__n")).otherwise(0L))
        .cast("long").as("n_rows_below_k"),
      sum(when(col("__d") < l, 1L).otherwise(0L)).as("n_groups_below_l"),
      min(col("__d")).cast("long").as("worst_diversity"))
  }

  /** The generalization step that FIXES a failed report: quasi columns
    * are coarsened (caller-supplied bucketing expressions, e.g. age →
    * decade, zip → prefix) and rows whose coarsened group still falls
    * below k are suppressed.  Returns the surviving rows with their
    * group size appended — exactly the k-anonymization loop's inner
    * iteration, kept relational so it composes with the report.
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2)
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    df.join(sizes, quasiCols).filter(col("group_size") >= k)
  }

  /** [[suppressBelowK]] with k derived from the data itself: half the
    * largest QI-group size (integer floor), clamped below by `kFloor`
    * — so the largest group always survives at any corpus scale.
    *
    * The scalar is folded in as a single-row broadcast cross join
    * rather than a driver `.head()` collect, so the step plans as ONE
    * query (the group-size aggregation feeds both the max and the join
    * through one exchange) instead of a separate full pass to fetch k
    * (r16 verdict item 6: no collects in query paths).  `div` is
    * integer division on BIGINT — identical to the former
    * `maxGroup / 2L` driver arithmetic for non-negative counts.
    */
  def suppressBelowHalfMax(df: DataFrame, quasiCols: Seq[String],
      kFloor: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty && kFloor >= 2)
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
    val kRow = sizes.agg(
      greatest(lit(kFloor), expr("max(group_size) div 2")).as("__k"))
    df.join(sizes, quasiCols)
      .crossJoin(broadcast(kRow))
      .filter(col("group_size") >= col("__k"))
      .drop("__k")
  }
}
