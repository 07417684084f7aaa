package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed unigram-Viterbi semantics — min-cost beats greedy,
  * lexicographic tie-break, OOV null — plus the EM-round E/M-step
  * arithmetic on a tiny corpus.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(vocab: Seq[(String, Long)], words: String*): Seq[Option[String]] = {
    words.map { w =>
      val r = Seq(Tuple1(w)).toDF("w")
        .select(unigram_viterbi(col("w"), vocab.map(_._1), vocab.map(_._2)))
        .head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
  }

  test("Viterbi picks the min-COST split even when greedy longest-match " +
      "would not") {
    // greedy would take 'ab' (5) then be forced into 'c' (9) = 14;
    // Viterbi finds 'a'(4) + 'bc'(3) = 7
    val v = Seq("ab" -> 5L, "a" -> 4L, "bc" -> 3L, "c" -> 9L, "b" -> 9L)
    assert(seg(v, "abc") == Seq(Some("a bc")))
  }

  test("cost ties break to the lexicographically smallest piece sequence") {
    // 'aa' as 'aa'(6) or 'a a'(3+3): equal cost — 'a a' < 'aa'
    val v = Seq("aa" -> 6L, "a" -> 3L)
    assert(seg(v, "aa") == Seq(Some("a a")))
    // flip the tie the other way lexicographically: 'z z' vs 'zz' —
    // 'z z' still smaller (space < 'z'); make 'zz' strictly cheaper
    assert(seg(Seq("zz" -> 5L, "z" -> 3L), "zz") == Seq(Some("zz")))
  }

  test("unsegmentable words are NULL; empty string segments to empty") {
    val v = Seq("a" -> 1L)
    assert(seg(v, "ax") == Seq(None))
    assert(seg(v, "") == Seq(Some("")))
  }

  test("EM round: frequency-weighted usage counts and re-derived costs") {
    // corpus: 'aa' x3 docs, 'b' x1 — vocab a(3.0), aa(5.0), b(3.0):
    // 'aa' segments to 'aa' (5.0 < 6.0); E-step: aa->3, b->1, total 4
    val docs = Seq("aa", "aa b", "aa").toDF("text")
    val out = graft.ops.Unigram.viterbiEmRound(docs, "text",
        Seq("a" -> 3000000L, "aa" -> 5000000L, "b" -> 3000000L))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    def cost(tot: Long, n: Long) =
      BigDecimal(math.log(tot.toDouble / n) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(out == Map("aa" -> ((3L, cost(4, 3))), "b" -> ((1L, cost(4, 1)))),
      s"got $out")
  }

  test("EM iteration is monotone: corpus Viterbi cost never increases " +
      "across a round") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 150)
    // monotonicity is the cross-entropy argument, which needs the
    // PRIOR to be a normalized distribution (Σ e^-cost = 1) — an
    // unnormalized prior can be "too cheap" overall and beat the
    // re-derived normalized costs.  Uniform over the piece set:
    val pieces0: Seq[String] =
      "abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString) ++
        Seq("ta", "ble", "sc", "an", "val", "ue")
    val uniform = math.round(math.log(pieces0.size.toDouble) * 1e6)
    val v0: Seq[(String, Long)] = pieces0.map(_ -> uniform)
    def corpusCost(vocab: Seq[(String, Long)]): Long = {
      val cmap = vocab.toMap
      val words = docs
        .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
        .withColumn("p", unigram_viterbi(col("w"),
          vocab.map(_._1), vocab.map(_._2)))
        .filter(col("p").isNotNull)
        .collect().map(r => (r.getString(2), r.getLong(1)))
      words.map { case (pieces, wc) =>
        wc * pieces.split(' ').map(cmap).sum
      }.sum
    }
    val round1 = graft.ops.Unigram.viterbiEmRound(docs, "text", v0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // used pieces take the re-derived costs; unused keep their priors
    // (dropping them could strand words and change the comparison set)
    val v1 = v0.map { case (p, c) => p -> round1.getOrElse(p, c) }
    val j0 = corpusCost(v0)
    val j1 = corpusCost(v1)
    assert(j1 <= j0,
      s"hard-EM must not increase the corpus Viterbi cost: $j0 -> $j1")
    assert(j1 < j0, s"on this corpus the round should strictly improve")
  }

  test("expression stays inside whole-stage codegen") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val plan = docs
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .select(unigram_viterbi(col("w"),
        Seq("a", "b"), Seq(1L, 1L)).as("p"))
      .queryExecution.executedPlan
    val inWsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("unigram_viterbi") => w
    }
    assert(inWsc.nonEmpty, s"unigram_viterbi fell out of codegen:\n$plan")
  }
}
