package graft.ops

import graft.SparkSpec

/** Hand-computed BM25 semantics for [[Retrieval.bm25TopK]]. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana"),
    (2L, "apple apple cherry"),
    (3L, "banana banana banana durian"))
    .toDF("doc_id", "text")

  test("term frequency beats shorter doc at equal idf") {
    // query 'apple': doc2 (tf=2, dl=3) must outrank doc1 (tf=1, dl=2).
    // By hand: N=3, avgdl=3, df(apple)=2, idf=ln(1.5/2.5+1)=ln(1.6);
    // doc2 ratio 4.4/(2+1.2*1.0)=1.375 > doc1 4.4/2... = 2.2/2.02.
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq((1, "apple")).toDF("qid", "qtext"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L), "only docs containing the term score")
    assert(out(2L) > out(1L), s"tf=2 in dl=3 must beat tf=1 in dl=2: $out")
    val idf = math.round(math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0) * 1e6)
    val d2 = math.round(idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0)))
    assert(out(2L) == d2, s"doc2 score must match the closed form: $out vs $d2")
  }

  test("rare terms dominate common ones; OOV terms contribute nothing") {
    // 'durian' (df=1) outweighs 'banana' (df=2) for doc3; a query term
    // absent from the corpus must not shift any score.
    val q = Seq((1, "durian"), (2, "banana"), (3, "durian zzz")).toDF("qid", "qtext")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1, 3L)) > out((2, 3L)), "df=1 idf must exceed df=2 idf")
    assert(out((3, 3L)) == out((1, 3L)), "OOV term must change nothing")
  }

  test("top-k truncates per query with deterministic tiebreak") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq((1, "banana apple")).toDF("qid", "qtext"), k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(out.size == 2, s"k=2 must keep exactly two docs, got $out")
  }

  test("more-like-this selects characteristic terms and excludes the query doc") {
    // doc2 "apple apple cherry": tfidf(cherry)=ln(3)·1e6 > tfidf(apple)
    // =2·ln(3/2)·1e6 — both selected at mTerms=2; BM25 over
    // "apple cherry" hits docs 1 and 2; self (doc2) must be excluded,
    // leaving doc1 at rank 1 and nothing else
    val out = Retrieval.moreLikeThis(docs, "doc_id", "text",
        queryIds = Seq(2L), mTerms = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(out == Seq((2L, 1L, 1)), s"got $out")
  }

  test("hybrid RRF fuses ranks; symmetric ranks tie and break on doc id") {
    // lexical 'apple': doc2 rank 1, doc1 rank 2 (doc3 absent).
    // semantic vs [1,0]: vec1 rank 1 (cos 1), vec2 rank 2, vec3 rank 3.
    // RRF(c=60): doc1 = round(1e6/62)+round(1e6/61) = 16129+16393 =
    // 32522 == doc2 (mirror ranks) -> tie broken by doc id; doc3 is
    // semantic-only: round(1e6/63) = 15873 with n_rankers 1.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1, "apple", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
    val out = Retrieval.hybridTopK(docs, "doc_id", "text", emb,
        "vec_id", "embedding", queries, k = 3, kEach = 10)
      .orderBy(org.apache.spark.sql.functions.desc("rrf_micro"),
        org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 32522L, 2L), (2L, 32522L, 2L), (3L, 15873L, 1L)),
      s"got $out")
  }

  test("hybrid k truncates the fused list, not the per-ranker lists") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1, "apple", Seq(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qvec")
    val out = Retrieval.hybridTopK(docs, "doc_id", "text", emb,
        "vec_id", "embedding", queries, k = 2, kEach = 10)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(1L, 2L), s"fused top-2 must drop the single-ranker doc: $out")
  }

  test("evalMetrics: hand-computed recall/MRR/nDCG, zero-hit query " +
      "and rank-k truncation") {
    // run for q1: ranks 1..3 = docs 10, 20, 30; gold rel(20)=2,
    // rel(40)=1 → hits only doc 20 at rank 2.
    // q2 retrieves nothing relevant (gold doc 99, run docs 50,60).
    // q3's only relevant doc sits at rank 4 — outside k=3.
    val run = Seq(
      (1, 10L, 1), (1, 20L, 2), (1, 30L, 3),
      (2, 50L, 1), (2, 60L, 2),
      (3, 70L, 1), (3, 80L, 2), (3, 81L, 3), (3, 90L, 4))
      .toDF("qid", "doc_id", "rank")
    val gold = Seq(
      (1, 20L, 2L), (1, 40L, 1L),
      (2, 99L, 3L),
      (3, 90L, 2L))
      .toDF("qid", "doc_id", "rel")
    val out = Retrieval.evalMetrics(run, gold, "qid", "doc_id", "rank",
        "rel", k = 3)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8)))).toMap
    def m(x: Double) = math.round(x * 1e6)
    // q1: dcg = (2^2-1)/log2(3) at rank 2; idcg = 3/1 + 1/log2(3)
    val q1dcg = m(3.0 / (math.log(3) / math.log(2)))
    val q1idcg = m(3.0) + m(1.0 / (math.log(3) / math.log(2)))
    assert(out(1) == ((2L, 1L, 2L, 500000L, 500000L, q1dcg, q1idcg,
      BigDecimal(q1dcg.toDouble / q1idcg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      s"q1: ${out(1)}")
    // q2: no relevant retrieved — all-zero metrics, idcg from gold
    assert(out(2) == ((1L, 0L, 0L, 0L, 0L, 0L, m(7.0), 0.0)), s"q2: ${out(2)}")
    // q3: the relevant doc is at rank 4 > k — truncation must drop it
    assert(out(3) == ((1L, 0L, 0L, 0L, 0L, 0L, m(3.0), 0.0)), s"q3: ${out(3)}")
  }
}
