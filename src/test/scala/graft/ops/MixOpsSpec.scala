package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 mix-assembly operators: hard negatives, char entropy,
  * length buckets, token-budget mixture, global row numbers, A-ES
  * weighted sampling.
  */
class MixOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives ranks only different-label vectors; margin = pos - neg") {
    // 1D-ish vectors: label 0 cluster near (1,0), label 1 near (0,1),
    // plus one label-1 vector close to the label-0 cluster — the hard
    // negative a random sample would miss.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f), 0),   // the positive
      (3L, Array(0.9f, 0.43f), 1),    // HARD negative (closest other-label)
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(-1.0f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 1), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq == Seq(3L, 4L),
      "negatives must rank other-label vectors by cosine")
    val r1 = out.head
    val pos = r1.getAs[Double]("pos_cos")
    val neg = r1.getAs[Double]("neg_cos")
    assert(pos > neg, "positive (same-label) must outrank the hard negative here")
    assert(math.abs(r1.getAs[Double]("margin") - (pos - neg)) < 1e-9)
    // the same-label vector 2 never appears among negatives
    assert(!out.map(_.getAs[Long]("corpus_id")).contains(2L))
  }

  test("bitextMargin: mutual best pairs on orthogonal clusters; " +
      "hub candidate loses on margin; sign-split + sentinel paths") {
    val a = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // b5 = (1,1)/sqrt2 is a HUB — decently close to both probes — but
    // the margin normalization by its own crowded neighborhood keeps
    // the axis-aligned true matches on top.
    val b = Seq((11L, Array(1.0f, 0.0f)), (13L, Array(0.0f, 1.0f)),
      (15L, Array(0.7071f, 0.7071f))).toDF("vec_id", "embedding")
    val out = Similarity.bitextMargin(a, b, k = 2)
      .orderBy("a_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
        .toSeq === Seq((0L, 11L, true), (1L, 13L, true)),
      out.mkString("; "))
    // all-negative geometry: combined penalty <= 0 -> sentinel margin
    val neg = Similarity.bitextMargin(
      Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      Seq((1L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding"), k = 1)
      .head()
    assert(neg.getLong(3) === -2000000000L, neg)
    // negative cosine over a positive combined penalty exercises the
    // sign-split division: margin strictly negative, not sentinel
    val mixed = Similarity.bitextMargin(
      Seq((0L, Array(1.0f, 0.0f)), (2L, Array(-0.1f, 0.995f)))
        .toDF("vec_id", "embedding"),
      Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(mixed(0L) > 0L && mixed(2L) < 0L &&
      mixed(2L) > -2000000000L, mixed.toString)
  }

  test("charEntropy: uniform text hits ln(k), constant text hits 0") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L)._3 == math.rint(math.log(2) * 10000) / 10000)
    assert(out(3L)._3 == math.rint(math.log(4) * 10000) / 10000)
    assert(!out.contains(4L), "empty doc contributes no row")
  }

  test("lengthBuckets: smallest edge >= n, truncation past the last edge") {
    val docs = Seq(
      (1L, "a b c"),                       // 3 -> edge 4
      (2L, "a b c d"),                     // 4 -> edge 4 (boundary)
      (3L, "a b c d e"),                   // 5 -> edge 8, pad 3
      (4L, Seq.fill(20)("t").mkString(" "))) // 20 -> edge 8, trunc 12
      .toDF("doc_id", "text")
    val out = PipelineOps.lengthBuckets(docs, "doc_id", "text",
      edges = Seq(4, 8), batchSize = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out(4L) == ((2L, 7L, 1L, 0L, 1L)))  // 2 docs, 3+4 tok, pad 1
    assert(out(8L) == ((2L, 13L, 3L, 12L, 1L))) // 5+8 kept, pad 3, trunc 12
  }

  test("tokenBudgetMixture keeps the straddling doc and stops after") {
    // One domain, budget 5; priority order is by hashed id — compute
    // the expected greedy prefix with the same hash locally.
    val docs = Seq.tabulate(6)(i => (i.toLong, "t " * 3, "d0")) // 3 tokens each
      .toDF("doc_id", "text", "source")
    val out = PipelineOps.tokenBudgetMixture(docs, "doc_id", "text",
      "source", Map("d0" -> 5L))
    val got = out.orderBy("cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // greedy: first doc cum 3 (before=0 < 5), second cum 6 (before=3 < 5),
    // third before=6 >= 5 stops — exactly 2 docs.
    assert(got.length == 2 && got.map(_._2).toSeq == Seq(3L, 6L), got.toSeq)
    val prio = (id: Long) => ((id * 2654435761L) % 1048576L, id)
    val expectedIds = (0L to 5L).sortBy(prio).take(2).toSet
    assert(got.map(_._1).toSet == expectedIds)
    // domains without a budget are excluded entirely
    val none = PipelineOps.tokenBudgetMixture(docs, "doc_id", "text",
      "source", Map("other" -> 5L))
    assert(none.isEmpty)
  }

  test("globalRowNumber == row_number over the same unique order") {
    val df = Seq.tabulate(500)(i => ((i * 37) % 500, s"v$i"))
      .toDF("k", "v")
    val got = PipelineOps.globalRowNumber(df, Seq("k"), numPartitions = 7)
      .select($"k", $"rn").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size == 500)
    assert(got.values.min == 1L && got.values.max == 500L)
    // k values are 0..499 uniquely, so rn(k) must equal k+1
    assert((0 until 500).forall(k => got(k) == k + 1L))
  }

  test("weightedSample: deterministic, k-bounded, matches local A-ES") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"doc$i", 10L + (i * 13) % 50, s"s${i % 3}"))
      .toDF("doc_id", "text", "n_chars", "source")
    def run() = PipelineOps.weightedSample(docs, "doc_id", "n_chars",
      "source", k = 2).select($"source", $"sample_rank", $"doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = run()
    assert(got == run(), "sample must be identical across runs")
    assert(got.groupBy(_._1).forall(_._2.size == 2))
    // local reference of the same keyed ranking
    val local = Seq.tabulate(30) { i =>
      val id = i.toLong; val w = 10L + (i * 13) % 50
      val u = ((id * 2654435761L) % 2147483648L + 1).toDouble / 2147483649.0
      (s"s${i % 3}", math.log(u) / w, id)
    }.groupBy(_._1).flatMap { case (src, rows) =>
      rows.sortBy(r => (-r._2, r._3)).take(2).zipWithIndex
        .map { case (r, j) => (src, j + 1, r._3) }
    }.toSet
    assert(got == local)
  }

  test("survivorship: newest skips nulls, longest/mode tie-breaks exact") {
    import Linkage.SurvivorRule._
    val recs = Seq(
      // cluster 1: newest type is null -> falls back to newest non-null
      (1L, Some("a"), "xx", 1.0, 1L),
      (1L, Some("b"), "yyy", 5.0, 2L),
      (1L, None: Option[String], "zz", 2.0, 3L),
      // cluster 2: mode tie a vs b (1 each) -> smallest wins; longest
      // tie ("pp" vs "qq") -> lexicographically largest wins
      (2L, Some("b"), "pp", -1.0, 4L),
      (2L, Some("a"), "qq", -3.0, 5L))
      .toDF("cluster", "t", "p", "v", "ord")
    val out = Linkage.survivorship(recs, "cluster", Seq(
        ("newest_t", "t", Newest(Seq("ord"))),
        ("longest_p", "p", Longest),
        ("max_v", "v", MaxNum),
        ("mode_t", "t", ModeAsc)))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(out(1L) == (("b", "yyy", 5.0, "a")),
      s"newest non-null must skip the ord=3 null; mode tie -> smallest: ${out(1L)}")
    assert(out(2L) == (("a", "qq", -1.0, "a")), s"${out(2L)}")
  }

  test("rollingAnomalies: integer test flags the spike, not the boundary") {
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    // key 1: three 1.00s then a 100.00 spike (n=3): S1=300, S2=30000,
    // x=10000 -> dev=(3*10000-300)^2=8.82e8 > 9*(3*30000-90000)=0 -> flag.
    // The fifth event equals the window mean -> never flagged.
    val ev = Seq(
      (1L, 1L, t(1), 1.00), (1L, 2L, t(2), 1.00), (1L, 3L, t(3), 1.00),
      (1L, 4L, t(4), 100.00), (1L, 5L, t(5), 34.00),
      // key 2: only two events -> below n, never scored
      (2L, 6L, t(1), 1.00), (2L, 7L, t(2), 99.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.rollingAnomalies(ev, "user_id", "event_id",
        "ts", "value", n = 3, z = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 4L)), s"only the spike flags: ${out.toSeq}")
  }

  test("itemCooccurrence: distinct users, cosine closed-form, floor works") {
    val ui = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),   // duplicate interaction collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"))
      .toDF("user_id", "item")
    val out = GraphOps.itemCooccurrence(ui, "user_id", "item", minUsers = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // a: 3 users, b: 2 users, ab co-seen by users 1 and 2
    assert(out.keySet == Set(("a", "b")), s"floor must drop (a,c): ${out.keySet}")
    val (nab, cos) = out(("a", "b"))
    assert(nab == 2L)
    assert(cos == math.rint(2.0 / math.sqrt(3.0 * 2.0) * 1e6) / 1e6)
  }

  test("sampleCategorical: every draw resolves exactly once, inverse-CDF exact") {
    val weights = Seq(("a", 1L), ("b", 3L), ("c", 6L)).toDF("k", "w")
    val out = PipelineOps.sampleCategorical(weights, "k", "w",
        n = 200L, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 200, "each draw must resolve to exactly one category")
    // local inverse-CDF twin: lo(a)=0, lo(b)=1, lo(c)=4, total=10
    val local = (0L until 200L).map { i =>
      val u = (i * 2654435761L + 7L) % 10L
      i -> (if (u < 1) "a" else if (u < 4) "b" else "c")
    }.toMap
    assert(out == local)
  }

  test("lastTouchAttribution: latest touch wins, no-touch is direct") {
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val ev = Seq(
      // user 1: view then click then purchase -> click (latest) credited
      (1L, t(1), "view", 0.0), (1L, t(2), "click", 0.0),
      (1L, t(3), "purchase", 10.00),
      // user 2: touch AFTER the purchase doesn't count -> direct
      (2L, t(5), "purchase", 7.50), (2L, t(6), "click", 0.0),
      // user 3: view only before -> view credited
      (3L, t(1), "view", 0.0), (3L, t(2), "purchase", 2.25))
      .toDF("user_id", "ts", "event_type", "value")
    val out = TimeSeries.lastTouchAttribution(ev, "user_id", "ts",
        "event_type", "value", "purchase", Seq("click", "view"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map("click" -> ((1L, 10.00)), "direct" -> ((1L, 7.50)),
      "view" -> ((1L, 2.25))), out)
  }

  test("targetEncode: shrinkage interpolates category mean and prior") {
    // cat a: 4 rows of 1.00 (mean 100c); cat b: 1 row of 11.00 (1100c)
    // global: n=5, sum=1500c, mean 300c.  m=1:
    //   a: (400*5 + 1*1500)*1e6 / (5*5) = 140_000_000 -> 140.0 c-micro?
    //   formula: (sum*N + m*T)*1e6 div ((n+m)*N)
    //   a: (400*5 + 1500)*1e6 div (5*5) = 3500e6 div 25 = 140_000_000
    //   b: (1100*5 + 1500)*1e6 div (2*5) = 7000e6 div 10 = 700_000_000
    val df = (Seq.fill(4)(("a", 1.00)) :+ (("b", 11.00)))
      .toDF("cat", "v")
    val out = PipelineOps.targetEncode(df, "cat", "v", m = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("a" -> ((4L, 140000000L)), "b" -> ((1L, 700000000L))),
      out)
    // m=0 degenerates to the exact category mean (micro-cents)
    val raw = PipelineOps.targetEncode(df, "cat", "v", m = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(raw == Map("a" -> 100000000L, "b" -> 1100000000L), raw)
  }
}
