package graft.ops

import graft.SparkSpec

/** [[SuffixArray.suffixRanks]] vs a local suffix-sort twin, including
  * repetitive text (the prefix-doubling motivation), cross-document
  * ties, and the shorter-is-prefix ordering rule.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def localRanks(docs: Seq[(Long, String)], maxLen: Int)
      : Map[(Long, Int), Long] = {
    val sufs = docs.flatMap { case (d, t0) =>
      val t = t0.take(maxLen)
      (1 to t.length).map(p => ((d, p), t.substring(p - 1)))
    }
    val order = sufs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sufs.map { case (k, s) => k -> order(s) }.toMap
  }

  test("dense global ranks match a local suffix sort — repetitive and " +
      "tied suffixes included") {
    val docs = Seq(
      (1L, "banana"),          // the classic overlapping-suffix case
      (2L, "nana"),            // suffixes tie exactly with doc 1's
      (3L, "abababab"),        // periodic: doubling's worst-case friend
      (4L, "b"),               // single char, prefix of doc 1 suffixes
      (5L, ""))                // empty doc contributes nothing
    val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    val want = localRanks(docs, 16)
    assert(got == want, s"got $got\nwant $want")
    // identical suffixes across documents share one dense rank
    assert(got((1L, 3)) == got((2L, 1)), "'nana...' tie must share rank")
    // shorter-prefix suffix ranks below its extensions: 'b' < 'banana'
    assert(got((4L, 1)) < got((1L, 1)))
  }

  test("truncation contract: ranks are exact for the truncated corpus") {
    val docs = Seq((1L, "xxxxxxxxxxa"), (2L, "xxxxxxxxxxb"))
    val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    // both docs truncate to 'xxxxxxxxxx' — every (pos) pair ties
    assert((1 to 10).forall(p => got((1L, p)) == got((2L, p))),
      s"truncated twins must tie at every position: $got")
  }
}
