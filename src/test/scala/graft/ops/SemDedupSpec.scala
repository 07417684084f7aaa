package graft.ops

import graft.SparkSpec

/** Golden-semantics tests for [[SemDedup.semanticDedup]] on crafted
  * embeddings with hand-checkable duplicate structure.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs.toSeq

  test("identical vectors collapse to one representative (min id kept)") {
    // two far-apart directions; ids 1,2,3 identical; 10 alone; 20,21 identical
    val rows = Seq(
      (1L, vec(1f, 0f, 0f)), (2L, vec(1f, 0f, 0f)), (3L, vec(1f, 0f, 0f)),
      (10L, vec(0.9f, 0.1f, 0f)),
      (20L, vec(0f, 0f, 1f)), (21L, vec(0f, 0f, 1f)))
      .toDF("id", "v")
    val out = SemDedup.semanticDedup(rows, "id", "v", k = 2, tau = 0.999,
        iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)) && out(3L) == ((1L, false)))
    assert(out(10L) == ((10L, true)), "near-but-below-tau row survives")
    assert(out(20L) == ((20L, true)) && out(21L) == ((20L, false)))
  }

  test("tau governs what counts as a duplicate") {
    // cos(a, b) ≈ 0.9965 for these two: dropped at tau=0.99, kept at 0.999
    val rows = Seq(
      (1L, vec(1f, 0f)), (2L, vec(1f, 0.084f)),
      (3L, vec(0f, 1f)))
      .toDF("id", "v")
    def keeps(tau: Double): Set[Long] =
      SemDedup.semanticDedup(rows, "id", "v", k = 1, tau = tau, iters = 0)
        .filter("keep").collect().map(_.getLong(0)).toSet
    assert(keeps(0.99) == Set(1L, 3L), "2 is a near-dup of 1 at 0.99")
    assert(keeps(0.999) == Set(1L, 2L, 3L), "2 survives a tighter tau")
  }

  test("duplicate components are transitive within a cell") {
    // chain: 1~2 and 2~3 above tau (cos 5° ≈ 0.99619), but 1~3 below
    // (cos 10° ≈ 0.9848) — one component anyway
    val rows = Seq(
      (1L, vec(1f, 0f)), (2L, vec(0.9962f, 0.0872f)), // ~5 degrees apart
      (3L, vec(0.9848f, 0.1736f)))                     // ~10 from id 1
      .toDF("id", "v")
    val out = SemDedup.semanticDedup(rows, "id", "v", k = 1, tau = 0.996,
        iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must collapse transitively, got $out")
  }
}
