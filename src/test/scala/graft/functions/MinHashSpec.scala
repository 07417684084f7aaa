package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[MinHashBuckets]] must be bit-identical to the relational
  * formulation it fuses (`min(xxhash64(lit(i), s))` per seed, then
  * `xxhash64(lit(b), h_br...)` per band) — otherwise swapping it into
  * the dedup pipeline would silently change every LSH bucket.
  */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16; private val bands = 4; private val rows = 4

  test("fused buckets == explode/aggregate formulation, bit for bit") {
    // shingle sets from a range scan so codegen runs
    val docs = spark.range(50).select(col("id"),
      expr("transform(sequence(0, CAST(id % 7 AS INT)), t -> xxhash64(id + t))")
        .as("sh"))
      .persist()
    val fused = docs
      .select(col("id"), posexplode(minhash_buckets(col("sh"), k, bands, rows))
        .as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // the reference formulation, exactly as Dedup.minhashSignatures
    // + the band hash build them
    val ex = docs.select(col("id"), explode(col("sh")).as("h"))
    val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"h$i"))
    val flat = ex.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val ref = flat.select(col("id"), posexplode(array((0 until bands).map { b =>
        xxhash64((lit(b) +: (0 until rows).map(r => col(s"h${b * rows + r}"))): _*)
      }: _*)).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    docs.unpersist()
    assert(fused.size == 50 * bands && fused == ref,
      s"fused and relational buckets diverge: ${fused.toSeq.diff(ref.toSeq).take(3)}")
  }

  test("empty shingle set yields NULL (no signature), null passes through") {
    val out = Seq((1L, Seq(7L, 9L)), (2L, Seq.empty[Long]))
      .toDF("id", "sh")
      .select(col("id"), minhash_buckets(col("sh"), k, bands, rows).as("b"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L))
  }

  test("wrong element type is an analysis error") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, Seq("a", "b"))).toDF("id", "sh")
        .select(minhash_buckets(col("sh"), k, bands, rows)).collect()
    }
  }
}
