package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range (interval) join: points joined to intervals containing
  * them, as an equi-join instead of the broadcast-nested-loop plan a
  * naive `p BETWEEN s AND e` predicate produces.
  *
  * The reference supports range predicates only through its generic
  * theta-join path (nested loop; reference join suite
  * `sql/core/src/test/scala/org/apache/spark/sql/JoinSuite.scala` —
  * "cross join with predicates"), which is O(|P|·|I|) and unusable at
  * 100 TB.  The standard scale trick (used by every warehouse engine's
  * range-join optimization) is binning:
  *
  *  - each point lands in exactly ONE bin: `floor(p / w)`;
  *  - each interval is exploded to EVERY bin it overlaps:
  *    `sequence(floor(s/w), floor(e/w))`;
  *  - join on the bin key (shuffle/broadcast equi-join — Catalyst picks),
  *    then re-check the exact containment predicate.
  *
  * Because the point side maps to a single bin, a qualifying (point,
  * interval) pair meets in exactly one bin — no post-join dedup.  With
  * `binWidth` ≈ the max interval length, each interval expands to ≤ 2
  * bins, so the join input is ≤ 2·|I| + |P| rows and the shuffle is on
  * a dense integer key.  Skewed bins (hot time ranges) are still plain
  * equi-join skew, which AQE's skew-join splitting handles.
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `points(pointCol) BETWEEN intervals(startCol) AND intervals(endCol)`
    * (inclusive).  All three columns must be numeric (e.g. epoch days /
    * seconds); column names of the two inputs must be disjoint.
    */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = binWidth.toDouble
    val p = points.withColumn("__bin", floor(col(pointCol) / w).cast("long"))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(col(startCol) / w).cast("long"),
      floor(col(endCol) / w).cast("long"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
