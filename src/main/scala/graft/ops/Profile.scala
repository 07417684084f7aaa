package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the summary a pipeline snapshots before
  * and after every transformation (and feeds to [[Drift]] / [[Checks]]
  * thresholds).  Like [[Checks]], the whole profile folds into a
  * single aggregation over one scan: per column it measures null
  * count, exact distinct count, and min/max (numeric columns keep
  * DOUBLE metrics, string columns keep STRING bounds — no lossy
  * cross-type formatting).  Output is one row per column.
  */
object Profile {

  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty, "no columns to profile")
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")
    def dist(c: String) = count_distinct(col(c)).as(s"__nd_$c")
    val aggs =
      numCols.flatMap(c => Seq(nulls(c), dist(c),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))) ++
      strCols.flatMap(c => Seq(nulls(c), dist(c),
        min(col(c)).as(s"__sn_$c"), max(col(c)).as(s"__sx_$c")))
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numCols.map { c =>
        struct(lit(c).as("column"),
          col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      } ++ strCols.map { c =>
        struct(lit(c).as("column"),
          col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"__sn_$c").as("min_str"), col(s"__sx_$c").as("max_str"))
      }
    oneRow.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.n_null"), col("r.n_distinct"),
        col("r.min_num"), col("r.max_num"), col("r.min_str"), col("r.max_str"))
      .orderBy(col("column"))
  }
}
