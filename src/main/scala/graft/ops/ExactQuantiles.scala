package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT interpolated percentiles — the scale path for what
  * `expr("percentile(...)")` computes in a single final aggregation
  * buffer.  Spark's `Percentile` aggregate funnels every (value, count)
  * pair into one OpenHashMap that is merged and sorted on a single
  * thread — ~2.5 s for 600k near-distinct doubles, and linear in
  * DISTINCT values at any scale, which makes it a driver-sized
  * bottleneck on a 100 TB fact column.  Here the heavy lifting is a
  * range repartition + per-partition sort (both fully distributed);
  * only partition COUNTS (numParts rows) and the 2·|ps| bracketing
  * values ever reach the driver.
  *
  * Interpolation matches Spark's `Percentile.getPercentile`
  * BIT-FOR-BIT: for rank `k = p·(n−1)` (0-based) the result is
  * `(⌈k⌉−k)·v_lo + (k−⌊k⌋)·v_hi` over the sorted values at ⌊k⌋ and ⌈k⌉
  * (NOT the algebraically-equal `v_lo + frac·Δ`, which differs in the
  * last ulp).  DuckDB's `quantile_cont` agrees to well past the 4-dp
  * rounding the oracle gates compare at.  Nulls are excluded,
  * mirroring both engines.
  */
object ExactQuantiles {

  /** Exact percentiles of `colName` (cast to double) at each `ps`
    * fraction.  Two driver-visible jobs: partition sizes, then the
    * bracketing-row lookup.  `numParts` bounds the per-partition sort.
    */
  def percentiles(df: DataFrame, colName: String, ps: Seq[Double],
      numParts: Int = 32): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentile fractions must be in [0,1]: $ps")
    val spark = df.sparkSession
    val data = df.select(col(colName).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .repartitionByRange(numParts, col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = data.groupBy("__pid").count().orderBy("__pid")
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val n = sizes.map(_._2).sum
      require(n > 0, s"ExactQuantiles: no non-null values in '$colName'")
      // global start offset of each range partition, in value order
      val starts = sizes.scanLeft(0L)(_ + _._2).init
      val offsets = sizes.zip(starts).map { case ((pid, sz), st) => (pid, st, sz) }
      def locate(globalIdx: Long): (Int, Long) = {
        val (pid, st, _) = offsets.find { case (_, st, sz) =>
          globalIdx >= st && globalIdx < st + sz
        }.get
        (pid, globalIdx - st + 1) // 1-based row_number within partition
      }
      val ranks = ps.map(p => p * (n - 1))
      val wanted = ranks.flatMap(k =>
        Seq(math.floor(k).toLong, math.ceil(k).toLong)).distinct
      val targets = wanted.map { idx =>
        val (pid, rn) = locate(idx); (pid, rn, idx)
      }
      import spark.implicits._
      val targetDf = targets.toDF("__pid", "__rn", "__idx")
      val w = Window.partitionBy("__pid").orderBy("__v")
      val found = data.withColumn("__rn", row_number().over(w))
        .join(broadcast(targetDf), Seq("__pid", "__rn"))
        .select(col("__idx"), col("__v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      ranks.map { k =>
        val lo = math.floor(k).toLong
        val hi = math.ceil(k).toLong
        if (lo == hi) found(lo)
        else (hi - k) * found(lo) + (k - lo) * found(hi)
      }
    } finally data.unpersist()
  }
}
