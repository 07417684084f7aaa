package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two snapshots of a dataset — the regression gate
  * a curation pipeline runs before promoting a new corpus version:
  * which keys appeared, disappeared, or changed, and in which columns.
  *
  * One full-outer shuffle join on the key; per-column change flags are
  * computed with null-safe equality (`<=>`) so a value↔null transition
  * counts as a change, not a match.  The output is one row per
  * differing key (unchanged keys are filtered before anything heavy),
  * so at 100 TB the result is proportional to the CHANGE volume, not
  * the table.
  */
object TableDiff {

  /** (key, status, changed_cols) per differing key: status ∈
    * {added, removed, changed}; changed_cols is a comma-joined sorted
    * list (empty for added/removed).
    */
  def diff(old: DataFrame, nu: DataFrame, keys: Seq[String]): DataFrame = {
    require(old.columns.sameElements(nu.columns),
      s"schema mismatch: ${old.columns.mkString(",")} vs ${nu.columns.mkString(",")}")
    val others = old.columns.filterNot(keys.contains).toSeq
    val o = old.select(
      (keys.map(col) ++ others.map(c => col(c).as(s"__o_$c")) :+
        lit(1).as("__in_old")): _*)
    val n = nu.select(
      (keys.map(col) ++ others.map(c => col(c).as(s"__n_$c")) :+
        lit(1).as("__in_new")): _*)
    val j = o.join(n, keys, "full_outer")
    val changedCols = concat_ws(",", array_sort(filter(array(others.map { c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))
        .otherwise(lit(null).cast("string"))
    }: _*), c => c.isNotNull)))
    j.select((keys.map(col) :+
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status") :+
        when(col("__in_old").isNull || col("__in_new").isNull, lit(""))
          .otherwise(changedCols).as("changed_cols")): _*)
      .filter(col("status") =!= "changed" || col("changed_cols") =!= "")
  }
}
