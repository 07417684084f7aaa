package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed MinHash signature aggregator — the SURVEY.md §7 design note
  * ("MinHash signatures as a TypedImperativeAggregate-style
  * Aggregator") realized with the public `Aggregator[IN, BUF, OUT]`
  * API (reference interface: `expressions/Aggregator.scala:55`,
  * planned through ObjectHashAggregate like the reference's
  * `TypedImperativeAggregate`, `interfaces.scala:473`).
  *
  * Semantically identical to [[Dedup.minhashSignatures]] (the k seeded
  * mins of xxhash64(i, shingle)), but holds the whole signature in one
  * mutable buffer per group instead of k column aggregates — the shape
  * to reach for when k is large or the reduction isn't expressible as
  * flat columns.  Merge is element-wise min, so it's associative,
  * commutative, and partial-aggregation friendly at any scale.
  */
class MinHashAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashAggregator.mix(shingleHash, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** 64-bit seeded mix (xxhash64 finalizer over hash ^ golden-ratio
    * seed stream) — deterministic, same independence story as the
    * column formulation's xxhash64(lit(i), h).
    */
  def mix(h: Long, seed: Int): Long = {
    var x = h ^ (0x9e3779b97f4a7c15L * (seed + 1))
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Untyped-DataFrame-usable aggregate column. */
  def minhashUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashAggregator(k), Encoders.scalaLong)
}
