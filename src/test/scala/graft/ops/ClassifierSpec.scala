package graft.ops


import graft.SparkSpec

/** Golden-semantics tests for [[Classifier.linearScore]] — the weight
  * formula is replayed in plain Scala so every expected value is
  * hand-computable, and the operator's zero-shuffle contract is
  * plan-asserted.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replay of the column pipeline: polynomial char hash →
    * bucket → Knuth-scrambled micro weight.
    */
  private def weight(tok: String, buckets: Int = 4096): Long = {
    val h = tok.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000003L)
    val b = h % buckets
    java.lang.Math.floorMod(b * 2654435761L, 4294967296L) % 2000001L - 1000000L
  }

  test("linearScore matches the Scala replay token-by-token") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, "zebra's 42 apostrophe"),
      (4L, "")).toDF("doc_id", "text")
    val out = Classifier.linearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    val expected = Map(
      1L -> Seq("the", "quick", "brown", "fox"),
      2L -> Seq("the", "the", "the"),
      3L -> Seq("zebra's", "42", "apostrophe"),
      4L -> Seq.empty[String])
    out.foreach { r =>
      val toks = expected(r.getLong(0))
      assert(r.getLong(1) == toks.length, s"n_tokens for doc ${r.getLong(0)}")
      val want = toks.map(weight(_)).sum
      assert(r.getLong(2) == want,
        s"score for doc ${r.getLong(0)}: got ${r.getLong(2)}, want $want")
      assert(r.getBoolean(3) == (want > 0))
    }
  }

  test("repeated token scores exactly n times the single-token weight") {
    val docs = Seq((1L, "alpha"), (2L, "alpha alpha alpha alpha")).toDF("doc_id", "text")
    val byId = Classifier.linearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(2L) == 4 * byId(1L))
  }

  test("scoring is a map-only plan: no Exchange anywhere") {
    val docs = Seq((1L, "one two three")).toDF("doc_id", "text")
    // string-match, not collect: under AQE the wrapper is a leaf and a
    // collect-based negative assert would pass vacuously
    val plan = Classifier.linearScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"linear classifier must not shuffle, plan:\n$plan")
  }

  test("scores are partition-invariant (integer micro arithmetic)") {
    val docs = (1L to 40L).map(i => (i, s"tok$i common word$i here"))
      .toDF("doc_id", "text")
    val once = Classifier.linearScore(docs.repartition(1), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val many = Classifier.linearScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(once == many)
  }
}
