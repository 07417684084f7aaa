package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: aggregate an event stream onto a complete
  * calendar grid and fill the gaps deterministically (last-observation-
  * carried-forward).  The dense grid is `dimensions × days` — generated,
  * not scanned — and the fill is a partitioned running window, so the
  * whole operator is one shuffle on the series key at any scale.
  */
object TimeSeries {

  /** Daily totals per key with gap days filled by carry-forward.
    *
    * Output columns: (keyCol, day, cents, observed) where `cents` is the
    * day's exact integer total if observed, else the most recent
    * observed total (0 before the first observation), and `observed`
    * flags real data points.  Money is summed as integer cents so the
    * fill is bit-exact under any partitioning.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, from: String, to: String): DataFrame = {
    val spark = events.sparkSession
    val daily = events
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        // round, not floor: on a DOUBLE input 8.35*100 is 834.999…, and
        // floor would drop a cent; round recovers the exact cents for
        // any value that IS an exact cent amount
        round(col(valueCol) * 100).cast("long").as("v"))
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(col(keyCol), col("day"))
      .agg(sum("v").as("day_cents"))
    // dense grid: every key × every day in [from, to] — a generated
    // cross of two tiny inputs, never a scan of the fact table
    val days = spark.range(1).select(
      explode(sequence(lit(from).cast("date"), lit(to).cast("date"))).as("day"))
    val keys = events.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(days))
    val fillWin = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(last(col("day_cents"), ignoreNulls = true).over(fillWin),
          lit(0L)).as("cents"),
        col("day_cents").isNotNull.as("observed"))
  }
}
