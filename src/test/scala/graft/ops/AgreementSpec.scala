package graft.ops

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa matches the textbook 2x2 example exactly") {
    // 50 items: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes.
    // po = 35/50, a = (25, 25), b = (30, 20), pe_num = 25·30 + 25·20 =
    // 1250, κ = (50·35 − 1250)/(2500 − 1250) = 500/1250 = 0.4.
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val got = Agreement.cohenKappa(rows.toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got === ((50L, 35L, 700000L, 500000L, 500L, 1250L, 400000L)))
  }

  test("cohenKappa handles worse-than-chance (negative) agreement") {
    // Perfect disagreement on 2 items: κ = (2·0 − 2)/(4 − 2) = −1.
    val rows = Seq(("x", "y"), ("y", "x"))
    val got = Agreement.cohenKappa(rows.toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._5 === -2L)          // kappa_num
    assert(got._6 === 2L)           // kappa_den
    assert(got._7 === -1000000L)    // kappa_ppm — sign-split exact
  }

  test("cohenKappaWeighted: hand-computed ordinal case, perfect, sentinel") {
    // (0,0) (1,2) (2,2): So = 1, n = 3, Se = Σ|i−j|·a_i·b_j = 9 →
    // κ_w = (9 − 3)/9 = 2/3 = 666666 ppm exactly.
    val got = Agreement.cohenKappaWeighted(
        Seq((0L, 0L), (1L, 2L), (2L, 2L)).toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((3L, 1L, 9L, 666666L)))
    // perfect agreement on a 2-level scale → exactly 1
    val perfect = Agreement.cohenKappaWeighted(
        Seq((0L, 0L), (5L, 5L)).toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long)].head()
    assert(perfect === ((2L, 0L, 10L, 1000000L)))
    // single marginal level → Se = 0 → undefined sentinel
    val degen = Agreement.cohenKappaWeighted(
        Seq((3L, 3L), (3L, 3L)).toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long)].head()
    assert(degen._4 === -1000001L)
  }

  test("cohenKappaWeighted rewards near-misses plain kappa cannot see") {
    // raters ALWAYS one notch apart on a 5-level scale: unweighted κ is
    // deeply negative (zero agreement), weighted κ is much closer to 0.
    val rows = (0L until 4L).map(i => (i, i + 1))
    val plain = Agreement.cohenKappa(rows.toDF("labelA", "labelB"))
      .select("kappa_ppm").as[Long].head()
    val weighted = Agreement.cohenKappaWeighted(rows.toDF("labelA", "labelB"))
      .select("kappa_ppm").as[Long].head()
    assert(weighted > plain,
      s"weighted $weighted should exceed plain $plain on near-miss raters")
  }

  test("fleissKappa matches the Fleiss (1971) worked example") {
    // The classic 10-subject × 14-rater × 5-category table (κ ≈ 0.210).
    val table = Seq(
      Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
      Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
      Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
      Seq(0, 2, 2, 3, 7))
    val ratings = for {
      (row, item) <- table.zipWithIndex
      (cnt, cat) <- row.zipWithIndex
      _ <- 0 until cnt
    } yield (item.toLong, s"c$cat")
    val got = Agreement.fleissKappa(ratings.toDF("item", "category"), r = 14)
      .as[(Long, Long, Long, Long, Long)].head()
    // Exact integer replication: A = Σn² − NR, B = NR(R−1), C = ΣS_k²,
    // D = (NR)², κ_ppm = trunc(10^6 · (AD − BC)/(B(D − C))).
    val n = BigInt(10); val r = BigInt(14)
    val sumSq = BigInt(table.flatten.map(c => c * c).sum)
    val sk = (0 until 5).map(k => BigInt(table.map(_(k)).sum))
    val a = sumSq - n * r; val b = n * r * (r - 1)
    val c = sk.map(s => s * s).sum; val d = (n * r) * (n * r)
    val kappaPpm = ((a * d - b * c) * 1000000) / (b * (d - c))
    assert(got._1 === 10L && got._2 === 14L)
    assert(got._3 === (a * 1000000 / b).toLong)        // po_ppm
    assert(got._4 === (c * 1000000 / d).toLong)        // pe_ppm
    assert(got._5 === kappaPpm.toLong)
    // and the published value really is ~0.210
    assert(got._5 > 200000L && got._5 < 220000L)
  }

  test("cohenKappa: single observed category (Pe = 1) returns the " +
      "-1000001 sentinel, not DIVIDE_BY_ZERO") {
    // Both raters say "yes" on every item → pe_num = n², kappa_den = 0.
    val got = Agreement.cohenKappa(
        Seq.fill(4)(("yes", "yes")).toDF("labelA", "labelB"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._6 === 0L)           // kappa_den
    assert(got._7 === -1000001L)    // sentinel, ANSI-div-safe
  }

  test("fleissKappa: single observed category returns the -1000001 " +
      "sentinel, not DIVIDE_BY_ZERO") {
    // Every rating in one category → Σ S_k² = (NR)², 1 − Pe = 0.
    val ratings = (0 until 5).flatMap(i => Seq.fill(3)((i.toLong, "a")))
    val got = Agreement.fleissKappa(ratings.toDF("item", "category"), r = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._4 === 1000000L)     // pe_ppm
    assert(got._5 === -1000001L)    // kappa_ppm sentinel
  }

  test("fleissKappa: unanimous panel is exactly 1") {
    val ratings = (0 until 6).flatMap(i =>
      Seq.fill(3)((i.toLong, if (i % 2 == 0) "a" else "b")))
    val got = Agreement.fleissKappa(ratings.toDF("item", "category"), r = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._3 === 1000000L)     // po_ppm
    assert(got._5 === 1000000L)     // kappa_ppm
  }

  private def alpha(rows: (Long, String)*) =
    Agreement.krippendorffAlpha(rows.toDF("u", "l"), "u", "l")
      .as[(Long, Long, Long, Long)].head()

  test("krippendorffAlpha: hand-computed variable-panel case") {
    // u1 {a,a} u2 {a,b} u3 {b,b,b}: N=7, Σ P_u·L/(m_u−1) = 2L,
    // n_a=3 n_b=4 → De core = 49−25 = 24, α = 1 − 6·2/24 = 0.5.
    val got = alpha((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"))
    assert(got === ((3L, 7L, 2L, 500000L)))
  }

  test("krippendorffAlpha: single-rating units drop as unpairable; " +
      "null labels are missing ratings") {
    val got = alpha((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"),
      (9L, "zzz"),            // 1 rating: unpairable, must not shift α
      (10L, null.asInstanceOf[String]))
    assert(got === ((3L, 7L, 2L, 500000L)))
  }

  test("krippendorffAlpha: perfect agreement on 2+ categories is 1; " +
      "a single observed category is the undefined sentinel") {
    val one = alpha((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
    assert(one._4 === 1000000L)
    val degenerate = alpha((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
    assert(degenerate._4 === -2000000L)
  }

  test("krippendorffAlpha: systematic disagreement goes negative " +
      "exactly") {
    // u1 {a,b} u2 {a,b}: N=4, P_u = 4−2 = 2 each → Σ = 4L (m_u−1=1),
    // n_a=n_b=2 → core 16−8=8, α = 1 − 3·4/8 = −0.5.
    val got = alpha((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    assert(got._4 === -500000L)
  }

  test("krippendorffAlpha fails loudly on a unit with > 13 ratings") {
    val big = (1 to 14).map(i => (1L, if (i % 2 == 0) "a" else "b")) ++
      Seq((2L, "a"), (2L, "b"))
    val e = intercept[Exception] {
      Agreement.krippendorffAlpha(big.toDF("u", "l"), "u", "l").collect()
    }
    assert(e.getMessage.contains("13"))
  }
}
