package graft.ops

import graft.SparkSpec

/** Golden-semantics tests for [[TfIdf]] and [[Triangles]] on crafted
  * inputs with hand-computed answers.
  */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdf: idf is 0 for a term in every doc; tf multiplies exactly") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple banana")).toDF("doc_id", "text")
    val out = TfIdf.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(4))).toSet
    // apple: df=3, N=3 → idf_micro = round(1e6·ln(1)) = 0
    // banana: df=2 → round(1e6·ln(1.5)) = 405465; cherry: df=1 → ln 3 = 1098612
    assert(out == Set(
      (1L, "apple", 2L, 0L), (2L, "apple", 1L, 0L), (3L, "apple", 1L, 0L),
      (1L, "banana", 1L, 405465L), (3L, "banana", 1L, 405465L),
      (2L, "cherry", 1L, 1098612L)), s"got $out")
  }

  test("oovRate: boundary tiebreak is (count desc, token asc)") {
    // counts: a=3, b=2, c=2, d=1 → V=2 vocab is {a, b} (b beats c on asc)
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b c d")).toDF("doc_id", "text")
    val out = TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // doc 1: 4 tokens, oov {c} → 1 → 250‰; doc 2: 4 tokens, oov {c,d} → 500‰
    assert(out == Set((1L, 4L, 1L, 250L), (2L, 4L, 2L, 500L)), s"got $out")
  }

  test("triangles: K4 has 4 triangles, 3 per node; extra path adds none") {
    // complete graph on {1,2,3,4} (edges given in mixed orientation,
    // with a duplicate and a self-loop to exercise canonicalization)
    // plus pendant path 4-5-6 which creates no triangle
    val edges = Seq(
      (1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), (5L, 5L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = Triangles.perNode(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $out")
    val g = Triangles.globalCount(edges).collect().head.getLong(0)
    assert(g == 4L, s"got $g")
  }

  test("triangles: star graph (max-degree hub) has none") {
    val edges = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    assert(Triangles.perNode(edges).count() == 0)
  }
}
