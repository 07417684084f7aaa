package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crafted-record goldens for [[Linkage.resolve]] and
  * [[SpanDedup.spanStats]].
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("linkage resolves within blocks only, picks the closest match") {
    val clean = Seq((1L, "acme corp"), (2L, "acme corps"), (3L, "zenith ltd"))
      .toDF("id", "name")
    val dirty = Seq((10L, "acme corpx"), (20L, "zenith ltdx"), (30L, "bcme corp"))
      .toDF("id", "name")
    val out = Linkage.resolve(dirty, "id", "name", clean, "id", "name",
        nm => substring(nm, 1, 1), maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 10 matches both acme variants (dist 1 each — 'acme corpx' is one
    // edit from either); best is the lower id
    assert(out(10L) == ((2L, 1L, 1L)), s"got $out")
    assert(out(20L) == ((1L, 1L, 3L)), "single in-block candidate")
    // 30 starts with 'b': no clean record in its block despite dist 1
    // to 'acme corp' — blocking must prune it
    assert(!out.contains(30L), "cross-block pairs are never compared")
  }

  test("best match ties break on the lower clean id") {
    val clean = Seq((5L, "same name"), (4L, "same name")).toDF("id", "name")
    val dirty = Seq((1L, "same namex")).toDF("id", "name")
    val out = Linkage.resolve(dirty, "id", "name", clean, "id", "name",
        nm => substring(nm, 1, 4), maxDist = 1).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq((2L, 1L, 4L)))
  }

  test("span stats count corpus-wide and within-doc span repeats") {
    // n=3 spans; docs 1 and 2 share "a b c d" => shared spans "a b c"
    // and "b c d"; doc 3 repeats "x y z" internally twice
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d q"),
      (3L, "x y z w x y z"),
      (4L, "p q"))
      .toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 2L)), s"doc1: 3 spans, 2 shared; got $out")
    assert(out(2L) == ((3L, 2L)), s"doc2 mirrors doc1; got $out")
    // doc3 spans: xyz yzw zwx wxy xyz — "x y z" occurs twice => both
    // occurrences counted as duplicated
    assert(out(3L) == ((5L, 2L)), s"within-doc repeat counts; got $out")
    assert(out(4L) == ((0L, 0L)), "short docs yield zero spans, not absence")
  }

  private def removed(docs: org.apache.spark.sql.DataFrame, n: Int) =
    SpanDedup.removeSpans(docs, "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("removeSpans cuts non-first occurrences, merging overlaps") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d q"),
      (3L, "x y z w x y z"),
      (4L, "p q"))
      .toDF("doc_id", "text")
    val out = removed(docs, n = 3)
    // doc 1 holds the first occurrences of "a b c" and "b c d" — intact
    assert(out(1L) == (("a b c d e", 5L, 5L, 0L)), s"got ${out(1L)}")
    // doc 2's copies cover positions 0-2 and 1-3: the union 0-3 is cut
    // once (4 tokens, not 6), leaving the non-duplicated tail
    assert(out(2L) == (("q", 5L, 1L, 4L)), s"got ${out(2L)}")
    // within-doc repeat: second "x y z" (positions 4-6) cut, first kept
    assert(out(3L) == (("x y z w", 7L, 4L, 3L)), s"got ${out(3L)}")
    // short docs contribute no spans and pass through
    assert(out(4L) == (("p q", 2L, 2L, 0L)), s"got ${out(4L)}")
  }

  test("removeSpans: fully-duplicated doc collapses to the empty string") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = removed(docs, n = 3)
    assert(out(1L) == (("a b c", 3L, 3L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == (("", 3L, 0L, 3L)), s"got ${out(2L)}")
  }

  test("removeSpans: a first occurrence can still lose tokens to a different span") {
    // doc2 owns the first "s t u" but its tail is the SECOND "u v w"
    // (first in doc1) — the cut applies even though doc2 is a first
    // occurrence of another span
    val docs = Seq(
      (1L, "u v w"),
      (2L, "s t u v w"),
      (3L, "s t u"))
      .toDF("doc_id", "text")
    val out = removed(docs, n = 3)
    assert(out(1L) == (("u v w", 3L, 3L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == (("s t", 5L, 2L, 3L)), s"got ${out(2L)}")
    assert(out(3L) == (("", 3L, 0L, 3L)), s"got ${out(3L)}")
  }

  test("blockingQuality: hand-computed reduction + completeness; " +
      "null keys block with nothing but count in N") {
    // keys: 1,2 -> x; 3 -> y; 4 -> null.  Blocks {x:2, y:1}: cand = 1
    // of 6 possible -> reduction 833333 ppm.  Truth (1,2),(2,3),(3,4):
    // only (1,2) co-blocks -> completeness 333333 ppm.
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"),
      (4L, null.asInstanceOf[String])).toDF("id", "k")
    val truth = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Linkage.blockingQuality(recs, "id", "k", truth).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
        got.getLong(3), got.getLong(4), got.getLong(5), got.getLong(6),
        got.getLong(7)) ===
      ((4L, 2L, 1L, 6L, 833333L, 3L, 1L, 333333L)), got)
  }
}
