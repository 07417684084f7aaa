package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most
  * recent right row with the same key and right.time <= left.time.
  *
  * The reference has no such operator — SURVEY.md §2.3 notes as-of
  * joins fall back to theta-join → BroadcastNestedLoop/Cartesian, which
  * is O(n·m) per key.  This implementation is the scale-first
  * formulation: tag both sides, UNION, and run one window pass with
  * `last(..., ignoreNulls)` over (key, time) — a single shuffle on the
  * key, O((n+m) log(n+m)) per key partition, no nested loop anywhere.
  * Skewed keys degrade to a sort, not a quadratic blowup.
  */
object AsOfJoin {

  /** @param left      probe side (one output row per left row)
    * @param right     reference side whose latest-at-time values attach
    * @param keyCol    equi-key column name present on both sides
    * @param timeCol   orderable time column name present on both sides
    * @param rightVals right-side value columns to carry (null when no
    *                  right row is at-or-before the left row's time)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCol, timeCol, rightVals, forward = false)

  /** Forward variant: for each left row, attach the EARLIEST right row
    * with right.time >= left.time (the "next reading after the event"
    * direction).  Same single-shuffle window formulation, scanned in
    * reverse time order.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightVals: Seq[String]): DataFrame =
    asOfImpl(left, right, keyCol, timeCol, rightVals, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightVals: Seq[String], forward: Boolean): DataFrame = {
    // side flag orders right rows before left rows at identical times,
    // so an exact-time match IS visible to the left row (<=, not <)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rid", monotonically_increasing_id())
    val lPadded = rightVals.foldLeft(l)((df, c) =>
      df.withColumn(s"__rv_$c", lit(null)))
    val r = right.select(
      (Seq(col(keyCol), col(timeCol)) ++
        rightVals.map(c => col(c).as(s"__rv_$c"))): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rid", lit(null).cast("long"))
    val lCols = left.columns
    val unioned = lPadded.select(
      (Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), col("__side"), col("__rid")) ++
        lCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
        rightVals.map(c => col(s"__rv_$c"))): _*)
      .unionByName(r.select(
        (Seq(col(keyCol).as("__k"), col(timeCol).as("__t"), col("__side"), col("__rid")) ++
          rightVals.map(c => col(s"__rv_$c"))): _*),
        allowMissingColumns = true)
    // forward scans time DESCENDING, so "last non-null right value so
    // far" becomes "earliest right row at-or-after" — same window shape
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned)((df, c) =>
      df.withColumn(s"__rv_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1)
      .select(
        (Seq(col("__k").as(keyCol), col("__t").as(timeCol)) ++
          lCols.filterNot(c => c == keyCol || c == timeCol).map(col) ++
          rightVals.map(c => col(s"__rv_$c").as(c))): _*)
  }
}
