package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def eval(rows: Seq[(Long, Boolean)]) =
    Eval.classifierEval(rows.toDF("p", "y"), "p", "y",
        thresholdMicro = 500000L, bins = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()

  test("perfect separation: P=R=F1=AUC=1, ECE=0") {
    val got = eval(Seq((1000000L, true), (1000000L, true), (0L, false)))
    assert(got === ((3L, 2L, 2L, 0L, 1L, 0L,
      1000000L, 1000000L, 1000000L, 1000000L, 0L)))
  }

  test("empty scored frame: ece_ppm is the -1 sentinel like the other " +
      "ratios, not NULL") {
    val got = Eval.classifierEval(
        Seq.empty[(Long, Boolean)].toDF("p", "y"), "p", "y",
        thresholdMicro = 500000L, bins = 10)
      .select("auc_ppm", "ece_ppm").as[(Long, Long)].head()
    assert(got === ((-1L, -1L)))
  }

  test("hand-computed four-row case: tied AUC pair, exact ECE bins") {
    // (700000,T) (700000,F) (300000,T) (100000,F):
    // confusion at 0.5: tp=1 fp=1 tn=1 fn=1 → P=R=F1=0.5.
    // U = 0.5 (tie) + 1 + 0 + 1 = 2.5 of 4 pairs → AUC = 0.625.
    // ECE bins: b7 |1400000−1000000| + b3 |300000−1000000| +
    //           b1 |100000−0| = 1200000 over n=4 → 300000.
    val got = eval(Seq((700000L, true), (700000L, false),
      (300000L, true), (100000L, false)))
    assert(got === ((4L, 2L, 1L, 1L, 1L, 1L,
      500000L, 500000L, 500000L, 625000L, 300000L)))
  }

  test("degenerate cases report -1 sentinels, never divide by zero") {
    // single class → AUC = -1; nothing predicted positive → P = -1
    val got = eval(Seq((100000L, true), (200000L, true)))
    assert(got._7 === -1L, s"precision sentinel: $got")   // tp+fp = 0
    assert(got._10 === -1L, s"auc sentinel: $got")        // n_b = 0
    assert(got._8 === 0L && got._9 === 0L)                // recall/f1 = 0
  }

  test("prCurve: hand-computed sweep, monotone tp, recall ends at 1") {
    // scores desc: 900000(T) 700000(F) 700000(T) 300000(F):
    //   t=900000: tp=1 fp=0 → P=1,       R=1/2
    //   t=700000: tp=2 fp=1 → P=2/3,     R=1
    //   t=300000: tp=2 fp=2 → P=1/2,     R=1
    val got = Eval.prCurve(Seq((900000L, true), (700000L, false),
        (700000L, true), (300000L, false)).toDF("p", "y"), "p", "y")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (900000L, 1L, 0L, 1000000L, 500000L),
      (700000L, 2L, 1L, 666666L, 1000000L),
      (300000L, 2L, 2L, 500000L, 1000000L)))
  }

  test("calibrationBins: per-bin conf/acc/signed gap, hand-computed") {
    // bin 7: (700000,T)(700000,F) → conf 700000, acc 500000, gap +200000
    // bin 3: (300000,T)           → conf 300000, acc 1000000, gap −700000
    // bin 1: (100000,F)           → conf 100000, acc 0, gap +100000
    val got = Eval.calibrationBins(Seq((700000L, true), (700000L, false),
        (300000L, true), (100000L, false)).toDF("p", "y"), "p", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0L, 100000L, 0L, 100000L),
      (3L, 1L, 1L, 300000L, 1000000L, -700000L),
      (7L, 2L, 1L, 700000L, 500000L, 200000L)))
  }

  test("prCurve: no positives reports -1 recall at every threshold") {
    val got = Eval.prCurve(Seq((800000L, false), (200000L, false))
        .toDF("p", "y"), "p", "y")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._5).forall(_ == -1L), s"$got")
    assert(got.map(_._4).forall(_ == 0L), "precision 0 with tp = 0")
  }

  test("persistenceBaseline: hand-computed negative R² and the " +
      "constant-series sentinel") {
    // key A: 1 → 3 → 2.  Forecast rows: (3←1, err 2), (2←3, err 1):
    // n=2 sae=3 sse=5; targets y = (3,2): SStot·n = 2·13 − 25 = 1,
    // n·SSres = 10 → R² = (1 − 10)/1 = −9 → −9_000_000 ppm exactly.
    val ev = Seq((1L, 1L, 1L, 1L), (1L, 2L, 2L, 3L), (1L, 3L, 3L, 2L))
      .toDF("k", "t", "tie", "v")
    val got = Eval.persistenceBaseline(ev, "k", "t", "tie", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((2L, 3L, 5L, -9000000L)))
    // constant series: perfect persistence but R² undefined (SStot=0)
    val const = Seq((1L, 1L, 1L, 5L), (1L, 2L, 2L, 5L), (1L, 3L, 3L, 5L))
      .toDF("k", "t", "tie", "v")
    val g2 = Eval.persistenceBaseline(const, "k", "t", "tie", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(g2 === ((2L, 0L, 0L, -1000001L)))
  }

  test("persistenceBaseline == local BigInt replay on random series (2 seeds)") {
    for (seed <- Seq(13, 47)) {
      val rnd = new scala.util.Random(seed)
      val rows = for (k <- 0L until 8L; t <- 0L until (5 + rnd.nextInt(20)))
        yield (k, t, t, rnd.between(-500L, 500L))
      val fc = rows.groupBy(_._1).values.toSeq.flatMap { series =>
        series.sortBy(r => (r._2, r._3)).sliding(2).collect {
          case Seq(a, b) => (b._4, a._4)
        }
      }
      val n = BigInt(fc.size)
      val sae = fc.map { case (y, p) => (BigInt(y) - p).abs }.sum
      val sse = fc.map { case (y, p) => (BigInt(y) - p).pow(2) }.sum
      val sy = fc.map(f => BigInt(f._1)).sum
      val syy = fc.map(f => BigInt(f._1).pow(2)).sum
      val tot = n * syy - sy * sy
      val num = tot - n * sse
      val want = if (tot == 0) BigInt(-1000001)
        else if (num < 0) -((-num * 1000000) / tot)
        else (num * 1000000) / tot
      val got = Eval.persistenceBaseline(rows.toDF("k", "t", "tie", "v"),
        "k", "t", "tie", "v").as[(Long, Long, Long, Long)].head()
      assert(got === ((n.toLong, sae.toLong, sse.toLong, want.toLong)),
        s"seed=$seed")
    }
  }

  test("AUC equals the closed form on a random score set (2 seeds)") {
    for (seed <- Seq(9, 31)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(300)(
        (rnd.nextInt(21).toLong * 50000L, rnd.nextBoolean()))
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
      val want = (BigInt(u2) * 1000000 /
        (BigInt(2) * pos.size * neg.size)).toLong
      assert(eval(rows)._10 === want, s"seed=$seed")
    }
  }

  private def pairs(rows: (Long, String, String)*) =
    rows.toDF("id", "cand", "ref")
      .selectExpr("id", "split(cand, ' ') AS c", "split(ref, ' ') AS r")

  test("ngramOverlap: the Papineni clipping example — repeated gram " +
      "cannot farm precision") {
    // cand "the the the" vs ref "the cat": unigram matched clips to 1
    // of 3 (not 3); bigram "the the"×2 matches nothing.
    val got = Eval.ngramOverlap(pairs((1L, "the the the", "the cat")),
        "id", "c", "r", maxN = 2)
      .orderBy("n").as[(Int, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      (1, 1L, 3L, 2L, 333333L, 500000L, 400000L),
      (2, 0L, 2L, 1L, 0L, 0L, 0L)))
  }

  test("ngramOverlap clips per pair, not across the corpus") {
    // Two pairs each with one 'a' in cand and ref: per-pair clip gives
    // matched=2; a corpus-level clip would give 2 as well, so add a
    // third pair where cand repeats: per-pair clipping caps it at 1.
    val got = Eval.ngramOverlap(pairs(
        (1L, "a", "a"), (2L, "a", "a"), (3L, "a a", "a b")),
        "id", "c", "r", maxN = 1)
      .as[(Int, Long, Long, Long, Long, Long, Long)].head()
    assert(got._2 === 3L && got._3 === 4L && got._4 === 4L)
  }

  test("corpusBleu: identical corpus scores exactly 1.0; any zero " +
      "order zeroes BLEU; brevity penalty bites a short candidate") {
    val same = "one two three four five six"
    assert(Eval.corpusBleu(pairs((1L, same, same)), "id", "c", "r")
      .select("bleu").as[Double].head() === 1.0)
    // 3-token candidate has no 4-grams -> m4 = 0 -> BLEU = 0.
    assert(Eval.corpusBleu(pairs((1L, "one two three", same)),
      "id", "c", "r").select("bleu").as[Double].head() === 0.0)
    // 5-of-6-token perfect prefix: all precisions 1, BP = e^(1-6/5).
    val bp = Eval.corpusBleu(pairs((1L, "one two three four five", same)),
      "id", "c", "r").select("bleu").as[Double].head()
    assert(bp === BigDecimal(math.exp(1.0 - 6.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pairedBootstrap: all-positive diffs give unanimous wins and a " +
      "positive CI; swapping systems mirrors the verdict") {
    val df = (1 to 50).map(i => (i.toLong, 10.0 + (i % 3), 1.0))
      .toDF("id", "a", "b")
    val r = Eval.pairedBootstrap(df, "id", "a", "b", b = 50, seed = 3L)
      .as[(Long, Long, Double, Double, Double, Long, Long, Long)].head()
    assert(r._1 === 50L)
    assert(r._6 === r._2 && r._7 === 0L && r._8 === 0L,
      s"every resample of strictly positive diffs must favor A: $r")
    assert(r._4 > 0 && r._4 <= r._5, s"CI must be positive-ordered: $r")
    val m = Eval.pairedBootstrap(df, "id", "b", "a", b = 50, seed = 3L)
      .as[(Long, Long, Double, Double, Double, Long, Long, Long)].head()
    assert(m._3 === -r._3 && m._6 === 0L && m._8 === r._6,
      s"swapped systems must mirror: $m vs $r")
  }

  test("chrF: whitespace stripped, per-order clipped sums, exact " +
      "one-division F2, absent orders absent") {
    // cand "ab" vs ref "ab c" -> stripped "abc".  n=1: m=2,c=2,r=3,
    // F2 = 5e6*2/(4*3+2) = 714285; n=2: m=1,c=1,r=2 -> 5e6/9 = 555555;
    // n=3: cand empty -> m=0,c=0,r=1 -> 0; n>=4: no units, row absent.
    val got = Eval.chrF(Seq((1L, "ab", "ab c")).toDF("id", "c", "r"),
        "id", "c", "r")
      .orderBy("n").as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1, 2L, 2L, 3L, 714285L),
      (2, 1L, 1L, 2L, 555555L), (3, 0L, 0L, 1L, 0L)))
    // identical sides: F2 = 1e6 at every order.
    val same = Eval.chrF(Seq((1L, "abcd", "abcd")).toDF("id", "c", "r"),
        "id", "c", "r")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(same.length === 4 && same.forall(_._5 === 1000000L))
  }

  private def localLcs(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length).toLong
  }

  private def rouge(rows: (String, String)*) =
    Eval.rougeL(pairs(rows.zipWithIndex.map { case ((c, r), i) =>
        (i.toLong, c, r) }: _*), "c", "r")
      .as[(Long, Long, Long, Long, Long, Long)].head()

  test("rougeL: hand-computed corpus sums, crossing duplicate " +
      "re-match, and empty-side sentinels") {
    // ("the cat sat" vs "the dog sat" -> LCS 2) + ("a" vs "b a" -> 1):
    // totals 3/4/5 -> P 750000, R 600000, F1 2*3e6/9 = 666666.
    assert(rouge(("the cat sat", "the dog sat"), ("a", "b a")) ===
      ((3L, 4L, 5L, 750000L, 600000L, 666666L)))
    // the corrupted middle token must re-match ACROSS: [x a] vs
    // [a x a] keeps "x a" (2), not the positional 1.
    assert(rouge(("x a", "a x a"))._1 === 2L)
    // split("") yields [""], so build genuinely empty arrays directly.
    val empty = Seq((Array.empty[String], Array("a", "b")))
      .toDF("c", "r")
    assert(Eval.rougeL(empty, "c", "r")
      .as[(Long, Long, Long, Long, Long, Long)].head() ===
      ((0L, 0L, 2L, -1L, 0L, 0L)))
  }

  test("rougeL kernel matches a local DP on randomized token arrays") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 60).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(12))(s"t${rnd.nextInt(4)}")
      (arr(), arr())
    }
    val got = cases.toDF("c", "r")
      .select(graft.functions.lcs_len(col("c"), col("r")))
      .as[Long].collect().toSeq
    assert(got === cases.map { case (c, r) => localLcs(c, r) })
  }

  test("lcs_len fails loudly past the 4096-token cap") {
    val big = Seq((Seq.fill(4097)("x"), Seq("x"))).toDF("c", "r")
    val e = intercept[Exception] {
      big.select(graft.functions.lcs_len(col("c"), col("r"))).collect()
    }
    assert(e.getMessage.contains("4096"))
  }

  test("distinctNgramRatio: hand counts on a repetitive doc; " +
      "gram-free slices absent") {
    // "a b a b": 4 unigrams (2 distinct), 3 bigrams "a b"/"b a"/"a b"
    // (2 distinct).  The single-token group has no bigram row.
    val docs = Seq(("r", "a b a b"), ("s", "x")).toDF("src", "text")
    val got = Eval.distinctNgramRatio(docs, "src", "text", maxN = 2)
      .orderBy("src", "n")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("r", 1, 4L, 2L, 500000L),
      ("r", 2, 3L, 2L, 666666L),
      ("s", 1, 1L, 1L, 1000000L)))
  }

  test("selfOverlap: hand-computed pairwise clipped overlap, k cap by " +
      "id, gram-free orders absent") {
    // Group X: "a b" vs "a c" both directions — unigram matched 2 of
    // 4, bigram 0 of 2.  Group Y has 3 docs but k = 2 keeps ids 1, 2
    // ("x" vs "x": matched 2 of 2); the single-token docs produce no
    // bigrams, so Y's n = 2 row must be ABSENT, not zero.
    val docs = Seq(
      ("X", 1L, "a b"), ("X", 2L, "a c"),
      ("Y", 1L, "x"), ("Y", 2L, "x"), ("Y", 3L, "z z z"))
      .toDF("src", "id", "text")
    val got = Eval.selfOverlap(docs, "src", "id", "text", k = 2, maxN = 2)
      .orderBy("src", "n")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("X", 1, 2L, 4L, 500000L),
      ("X", 2, 0L, 2L, 0L),
      ("Y", 1, 2L, 2L, 1000000L)))
  }
}
