package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-semantics tests for [[CorpusStats]] on crafted corpora where
  * every expected value is hand-computable.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("unigramLogProb: uniform corpus scores ln(1/V) per token, exactly") {
    // 4 docs, each one distinct token — every token has p = 1/4
    val docs = Seq((1L, "aa"), (2L, "bb"), (3L, "cc"), (4L, "dd"))
      .toDF("doc_id", "text")
    val out = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val expected = math.round(math.log(0.25) * 1e6) // -1386294
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(r.getLong(2) == expected, s"got ${r.getLong(2)}")
    }
  }

  test("unigramLogProb: rarer tokens score lower than common ones") {
    // 'common' appears 9 times, 'rare' once
    val docs = ((1 to 9).map(i => (i.toLong, "common")) :+ (10L, "rare"))
      .toDF("doc_id", "text")
    val byId = CorpusStats.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(10L) < byId(1L),
      s"rare doc must score below common doc: ${byId(10L)} vs ${byId(1L)}")
    assert(byId(1L) == math.round(math.log(0.9) * 1e6))
    assert(byId(10L) == math.round(math.log(0.1) * 1e6))
  }

  test("skipGramPairs: window semantics are exact on a known sentence") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val pairs = CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // window 2 over [a b c d]: (a,b) (a,c) (b,c) (b,d) (c,d)
    assert(pairs == Map(("a", "b") -> 1L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("b", "d") -> 1L, ("c", "d") -> 1L))
  }

  test("skipGramPairs: pairs never cross document boundaries") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val pairs = CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y"), ("y", "z")), s"got $pairs")
  }

  test("interleavedOrder round-robins sources: any rank-k prefix is balanced") {
    // 3 sources × 10 docs: within every rank the three sources appear once,
    // so a prefix cut at a full rank has equal per-source counts
    val docs = (0L until 30L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val ordered = CorpusStats.interleavedOrder(docs, "doc_id", "source")
      .orderBy("rn", "hkey", "doc_id").collect()
    val prefix = ordered.take(12) // 4 full ranks × 3 sources
    val bySource = prefix.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource.values.toSet == Set(4), s"unbalanced prefix: $bySource")
    // determinism: a second run yields the identical order
    val again = CorpusStats.interleavedOrder(docs, "doc_id", "source")
      .orderBy("rn", "hkey", "doc_id").collect()
    assert(ordered.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("ppmi: perfect collocation scores ln(N/n) exactly, clamps at 0") {
    // pairs: (a,b)=4 of N=8 total; marginals n_a·=4, n_·b=4
    // PMI(a,b) = ln(4·8 / (4·4)) = ln 2; the uniform filler pairs have
    // PMI = ln(8·1/(2·2)) = ln 2 as well, so craft an anti-correlated
    // pair: (x,y)=1 with n_x·=3 → check exact values instead
    val pairs = Seq(("a", "b", 4L), ("x", "b", 1L), ("x", "y", 3L))
      .toDF("w1", "w2", "n_pairs")
    val out = CorpusStats.ppmi(pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val n = 8.0
    def pmi(ab: Long, a: Long, b: Long): Long =
      math.max(0L, math.round(math.log(ab * n / (a.toDouble * b)) * 1e6))
    assert(out(("a", "b")) == pmi(4, 4, 5))
    assert(out(("x", "b")) == pmi(1, 4, 5)) // ln(8/20) < 0 → clamped to 0
    assert(out(("x", "b")) == 0L)
    assert(out(("x", "y")) == pmi(3, 4, 3))
  }

  test("importanceScores: target-like docs outrank, exact hand values") {
    // target = doc 1 ("aa aa"); corpus adds doc 2 ("bb bb")
    // target model: {aa:2}, t_total=2, V=2; corpus: {aa:2,bb:2}, c_total=4
    val docs = Seq((1L, "aa aa", true), (2L, "bb bb", false))
      .toDF("doc_id", "text", "tgt")
    val out = CorpusStats.importanceScores(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def term(tc: Long, cc: Long): Long =
      math.round(math.log((tc + 1) / 4.0) * 1e6) -
        math.round(math.log(cc / 4.0) * 1e6)
    assert(out(1L) == 2 * term(2, 2), s"got $out")
    assert(out(2L) == 2 * term(0, 2), s"got $out")
    assert(out(1L) > out(2L))
  }

  test("BPE merges match the textbook example, hand-computed") {
    // word freqs: low×5, lower×2, newest×6, widest×3
    // iter1 pair counts: (e,s)=9 (s,t)=9 → lexicographic tie-break (e,s)
    // iter2: (es,t)=9;  iter3: (l,o)=7 (o,w)=7 → (l,o)
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
       Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val rules = Bpe.learnMerges(docs, "text", k = 3).orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rules == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L)), s"got $rules")
  }

  test("applyMerges folds rules in order: 'lowest' → [lo, w, est]") {
    val df = Seq((1L, "lowest")).toDF("id", "text")
    val toks = Bpe.applyMerges(df, "text",
        Seq(("e", "s"), ("es", "t"), ("l", "o")))
      .select("bpe_tokens").collect()(0).getSeq[String](0)
    assert(toks == Seq("lo", "w", "est"), s"got $toks")
  }

  test("BPE tokenization is lossless: tokens concat back to the input") {
    // invariant for ANY merge list — merging only ever fuses adjacent
    // symbols, so concat(tokens) must reproduce the text exactly
    val words = Seq("low", "lowest", "aaa", "aaaa", "xyzzy", "a", "lo")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")
    val merges = Seq(("a", "a"), ("aa", "a"), ("l", "o"), ("lo", "w"),
      ("e", "s"), ("es", "t"))
    val out = Bpe.applyMerges(docs, "text", merges)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2)).toMap
    words.foreach { w =>
      assert(out(w).mkString == w, s"'$w' → ${out(w)} does not reassemble")
    }
    // and the greedy fold actually fused: rule (a,a) applies everywhere
    // BEFORE rule (aa,a) sees the word, so "aaaa" → [aa, aa] and the
    // later (aa,a) rule finds no bare 'a' to fuse — but "aaa" → [aa, a]
    // after rule (a,a), and rule (aa,a) DOES see that adjacent pair, so
    // sequential merge-list semantics fuse it to [aaa]
    assert(out("aaaa") == Seq("aa", "aa"), s"got ${out("aaaa")}")
    assert(out("aaa") == Seq("aaa"), s"got ${out("aaa")}")
    assert(out("lowest") == Seq("low", "est"), s"got ${out("lowest")}")
  }

  test("unigramLogProb is partitioning-invariant (integer micro-nat sums)") {
    val docs = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 3} filler"))
      .toDF("doc_id", "text")
    val one = CorpusStats.unigramLogProb(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val many = CorpusStats.unigramLogProb(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      many.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("bigramLogProb: hand-computed add-one smoothed values") {
    // corpus: doc1 "a b", doc2 "a b", doc3 "a c"
    // bigram counts: (a,b)=2, (a,c)=1; left marginal a=3; vocab {a,b,c}=3
    // doc1/doc2 score = round(ln(3/6)*1e6); doc3 = round(ln(2/6)*1e6)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ab = math.round(math.log(3.0 / 6.0) * 1e6)
    val ac = math.round(math.log(2.0 / 6.0) * 1e6)
    assert(out(1L) == ((1L, ab)), s"got ${out(1L)}")
    assert(out(2L) == ((1L, ab)))
    assert(out(3L) == ((1L, ac)), s"got ${out(3L)}")
  }

  test("bigramLogProb: single-token and empty docs drop (no bigrams)") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }

  test("bigramLogProb is partitioning-invariant") {
    val docs = (1L to 30L).map(i => (i, s"w${i % 5} w${i % 3} w${i % 7} end"))
      .toDF("doc_id", "text")
    val one = CorpusStats.bigramLogProb(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val many = CorpusStats.bigramLogProb(docs.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      many.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("vocabGrowth counts tokens and first-occurrence vocab per cut") {
    import spark.implicits._
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "d")).toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowth(docs, "doc_id", "text",
        cuts = Seq(1L, 2L, 10L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 2L), (2L, 5L, 3L), (10L, 6L, 4L)), s"got $out")
  }

  test("vocabOverlap: exact Jaccard of distinct-token sets per pair") {
    val docs = Seq(
      ("s1", "alpha beta gamma"), ("s1", "alpha beta"),
      ("s2", "beta gamma delta"),
      ("s3", "zeta"))
      .toDF("source", "text")
    val out = CorpusStats.vocabOverlap(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // s1 = {alpha,beta,gamma}, s2 = {beta,gamma,delta}: common 2 of 4
    assert(out(("s1", "s2")) == ((2L, 3L, 3L, 0.5)), out)
    // disjoint pairs are absent (no shared token -> no row)
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
  }

  test("domainReweight: the rarer-token (higher-loss) domain " +
      "upweights; weights softmax to one") {
    // domain A repeats one common token; domain B uses rare ones —
    // B's per-token unigram loss is higher, so DoReMi upweights B
    val docs = Seq(
      (1L, "A", "x x x x x x x x"), (2L, "A", "x x x x x x x x"),
      (3L, "B", "p q r s"), (4L, "B", "t u v w"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.domainReweight(docs, "source", "doc_id",
        "text", eta = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(out("A")._1 == 16L && out("B")._1 == 8L, s"token counts: $out")
    assert(out("B")._2 > out("A")._2,
      s"higher-loss domain must upweight: $out")
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 1000000L) <= 1,
      s"weights must softmax-normalize to 1e6 micro: $total")
  }

  test("vocabCoverage: exact mass at each cut, count-ties by token " +
      "string, oversized cut covers everything") {
    import spark.implicits._
    // counts: a=3, b=1, c=1 (tie broken b<c); total 5.
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", Seq(1, 2, 10))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 5L, 600000L), (2L, 4L, 5L, 800000L),
      (10L, 5L, 5L, 1000000L)))
  }

  test("zipfFit: an exact 1/r corpus fits slope -1; partitioning-" +
      "invariant; all-equal counts have zero x-spread handled by OLS") {
    import spark.implicits._
    // counts 24/12/8/6 for ranks 1..4 = 24/r exactly: ln-ln points on
    // the line y = ln 24 - x, so slope = -1 and ln_c = ln 24 up to the
    // per-point micro-nat rounding (≤ 0.5e-6 per coordinate).
    val text = (Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("id", "text")
    val r = CorpusStats.zipfFit(docs, "text", topV = 500).head()
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4, r)
    assert(math.abs(r.getDouble(2) - math.log(24.0)) < 1e-4, r)
    val shuf = CorpusStats.zipfFit(docs.repartition(5), "text", 500).head()
    assert(shuf.getDouble(1) === r.getDouble(1) &&
      shuf.getDouble(2) === r.getDouble(2))
  }

  test("heapsFit: all-new-tokens corpus fits beta = 1, fixed-template " +
      "corpus fits beta = 0; empty prefixes drop from the fit") {
    import spark.implicits._
    // every doc contributes 4 NEW tokens: vocab == n_tokens at every
    // cut -> y = x exactly -> beta = 1, ln_k = 0.
    val fresh = (0L until 64L).map(i =>
      (i, (0 until 4).map(j => s"w${i}x$j").mkString(" "))).toDF("id", "text")
    val f = CorpusStats.heapsFit(fresh, "id", "text",
      cuts = Seq(4L, 8L, 16L, 32L)).head()
    assert(f.getLong(0) === 4L)
    assert(math.abs(f.getDouble(1) - 1.0) < 1e-6 &&
      math.abs(f.getDouble(2)) < 1e-6, f)
    // the same 3 tokens in every doc: vocab constant -> beta = 0 and
    // ln_k = ln 3; a cut below the first doc id contributes no point.
    val tmpl = (0L until 64L).map(i => (i, "a b c")).toDF("id", "text")
    val t = CorpusStats.heapsFit(tmpl, "id", "text",
      cuts = Seq(4L, 8L, 16L, 32L)).head()
    assert(math.abs(t.getDouble(1)) < 1e-6 &&
      math.abs(t.getDouble(2) - math.log(3.0)) < 1e-4, t)
    val skipEmpty = CorpusStats.heapsFit(
      tmpl.filter(col("id") >= 8L), "id", "text", Seq(4L, 16L, 32L)).head()
    assert(skipEmpty.getLong(0) === 2L, skipEmpty)
  }

  test("sourceJsd: identical sources -> 0; half-overlap pair hits the " +
      "hand-computed ln2/2; disjoint-vocab pair absent") {
    import spark.implicits._
    // A = {x, y}, B = {x, z} (uniform, T = 2 each): JS = ln2/2 nats
    // -> 346573 ppm after the floor.  C duplicates A exactly -> 0.
    // D shares nothing with anyone -> no D rows at all.
    val docs = Seq(
      ("A", "x y"), ("B", "x z"), ("C", "x y"), ("D", "qq ww"))
      .toDF("source", "text")
    val got = CorpusStats.sourceJsd(docs, "source", "text")
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("A", "B", 1L, 2L, 2L, 346573L),
      ("A", "C", 2L, 2L, 2L, 0L),
      ("B", "C", 1L, 2L, 2L, 346573L)))
  }
}
