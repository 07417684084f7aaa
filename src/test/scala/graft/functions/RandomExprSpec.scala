package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Nondeterministic-expression contracts (reference
  * `randomExpressions.scala`, `misc.scala` uuid): seeded rand is
  * reproducible for a fixed partitioning, uuid/monotonic ids are
  * well-formed and unique.
  */
class RandomExprSpec extends SparkSpec {

  test("rand(seed) reproduces exactly for a fixed partitioning") {
    // rand draws sequentially within a partition, so both the
    // partitioning AND the row order must be pinned for reproducibility
    val base = Tables.load(spark, sf, "nation")
      .repartition(2, col("n_nationkey"))
      .sortWithinPartitions(col("n_nationkey"))
    def draw() = base.select(col("n_nationkey"), rand(42).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val a = draw()
    val b = draw()
    assert(a == b, "rand(42) must be stable across runs on the same partitioning")
    assert(a.values.forall(v => v >= 0.0 && v < 1.0))
    // randn too
    val n1 = base.select(randn(7)).collect().map(_.getDouble(0)).toSeq
    val n2 = base.select(randn(7)).collect().map(_.getDouble(0)).toSeq
    assert(n1 == n2)
  }

  test("uuid() rows are RFC-4122-shaped and unique") {
    val ids = Tables.load(spark, sf, "nation")
      .select(expr("uuid()").as("u")).collect().map(_.getString(0))
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(ids.forall(u => re.findFirstIn(u).isDefined), s"bad uuid: ${ids.head}")
    assert(ids.distinct.length == ids.length)
  }

  test("monotonically_increasing_id is unique and ascending per partition") {
    val df = Tables.load(spark, sf, "lineitem")
      .select(monotonically_increasing_id().as("mid"),
        spark_partition_id().as("pid"))
    val rows = df.collect().map(r => (r.getInt(1), r.getLong(0)))
    assert(rows.map(_._2).distinct.length == rows.length)
    rows.groupBy(_._1).values.foreach { part =>
      val ids = part.map(_._2).toSeq
      assert(ids == ids.sorted, "ids must ascend within a partition")
    }
  }
}
