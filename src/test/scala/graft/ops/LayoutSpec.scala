package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout properties — the guarantees that make Morton
  * clustering worth a write-time shuffle at 100 TB.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def grid(n: Int) =
    (0 until n).flatMap(x => (0 until n).map(y => (x, y))).toDF("x", "y")

  test("morton codes are a bijection on the 64x64 grid") {
    val codes = grid(64)
      .select(graft.functions.morton2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(codes.length == 4096)
    assert(codes.toSet.size == 4096, "interleave must be injective")
    assert(codes.min == 0L && codes.max == 4095L,
      "low 6+6 bits must fill exactly [0, 4096)")
  }

  test("an aligned power-of-2 tile is one contiguous run of the z-order") {
    // THE z-curve property file skipping relies on: sort the grid by
    // morton code and every aligned 16x16 tile occupies one contiguous
    // index range — so a 2-D box predicate maps to few file ranges.
    val sorted = grid(64)
      .withColumn("z", graft.functions.morton2(col("x"), col("y")))
      .orderBy(col("z"))
      .select(col("x"), col("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val inTile = sorted.zipWithIndex.collect {
      case ((x, y), i) if x >= 16 && x < 32 && y >= 32 && y < 48 => i
    }
    assert(inTile.length == 256)
    assert(inTile.last - inTile.head == 255,
      s"aligned tile must be contiguous, spanned ${inTile.head}..${inTile.last}")
  }

  test("zorder range-partitions into disjoint morton ranges") {
    val parts = Layout.zorder(grid(64), col("x"), col("y"), buckets = 8)
      .withColumn("z", graft.functions.morton2(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"), count(lit(1)).as("n"))
      .orderBy(col("lo"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(parts.map(_._3).sum == 4096)
    parts.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 <= lo2, s"partition ranges must not overlap: $hi1 > $lo2")
      case _ =>
    }
    // clustering payoff: each bucket's 2-D bounding box is a fraction
    // of the domain (row-major buckets would span full-width stripes)
    val boxes = Layout.zorder(grid(64), col("x"), col("y"), buckets = 8)
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // sampled range boundaries may straddle a quadrant seam, so a
    // couple of buckets can span wide — but MOST must be tight in both
    // dimensions (row-major stripes give dx=63 for every bucket)
    assert(boxes.count { case (dx, dy) => dx <= 32 && dy <= 32 } >= 5,
      s"z-order buckets should mostly be spatially tight, got ${boxes.mkString(",")}")
    assert(boxes.map(_._2).max <= 40,
      s"no bucket may span the full y range, got ${boxes.mkString(",")}")
  }
}
