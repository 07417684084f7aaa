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

  test("longestRepeats: exact top-k against a local adjacent-suffix twin") {
    val docs = Seq((1L, "banana"), (2L, "nana"), (3L, "abab"))
    val got = SuffixArray.longestRepeats(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxLen = 16, topK = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // local twin: sort every suffix, LCP of adjacent pairs, same order
    val sufs = docs.flatMap { case (d, t) =>
      (1 to t.length).map(p => (t.substring(p - 1), d, p.toLong)) }
      .sortBy(x => (x._1, x._2, x._3))
    val want = sufs.zip(sufs.tail).map { case ((s1, d1, p1), (s2, d2, p2)) =>
      val l = s1.zip(s2).takeWhile(c => c._1 == c._2).length
      (l.toLong, s1.take(l), d1, p1, d2, p2)
    }.filter(_._1 >= 1)
      .sortBy(x => (-x._1, x._2, x._3, x._4)).take(5)
    assert(got == want, s"got $got\nwant $want")
    // the longest repeat is the cross-document 'nana'
    assert(got.head._1 == 4L && got.head._2 == "nana", s"top: ${got.head}")
  }

  test("randomized: ranks match the local twin on small-alphabet " +
      "corpora (3 seeds)") {
    // a 2-char alphabet maximizes duplicate suffixes and deep shared
    // prefixes — the doubling rounds' and the 8-char-seed's worst case
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1 to 30).map(i =>
        (i.toLong, Seq.fill(rnd.nextInt(21))("ab"(rnd.nextInt(2))).mkString))
      val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
          "doc_id", "text", maxLen = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2))
        .toMap
      assert(got == localRanks(docs, 16), s"seed=$seed")
    }
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
