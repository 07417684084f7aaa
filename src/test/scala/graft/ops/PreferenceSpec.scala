package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("single duel reaches the hand-computed MM fixed point") {
    // A beats B once.  Smoothed: w'_AB = 2, w'_BA = 1, n = 3,
    // W_A = 2, W_B = 1.  Round 1: inv = (3e12) div 2e6 = 1_500_000 for
    // both sides, so s_A = 2e12 div 1.5e6 = 1_333_333 and
    // s_B = 666_666.  Round 2: s_A + s_B = 1_999_999, inv =
    // floor(3e12 / 1_999_999) = 1_500_000 again — fixed point.
    val duels = Seq(("A", "B")).toDF("winner", "loser")
    val got = Preference.bradleyTerry(duels, rounds = 3)
      .orderBy("item").as[(String, Long, Long)].collect.toSeq
    assert(got === Seq(("A", 2L, 1333333L), ("B", 1L, 666666L)))
  }

  test("transitive dominance orders strengths A > B > C") {
    val duels = (
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A"))
    ).toDF("winner", "loser")
    val s = Preference.bradleyTerry(duels, rounds = 3)
      .collect.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s("A") > s("B") && s("B") > s("C"),
      s"expected A > B > C, got $s")
  }

  test("symmetric duels yield equal strengths") {
    val duels = (Seq.fill(5)(("A", "B")) ++ Seq.fill(5)(("B", "A")))
      .toDF("winner", "loser")
    val s = Preference.bradleyTerry(duels, rounds = 3)
      .collect.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s("A") === s("B"))
  }

  test("strengths are invariant to input partitioning and row order") {
    val duels = (0 until 200).map { i =>
      val a = s"m${i % 7}"; val b = s"m${(i * 3 + 1) % 7}"
      if (a != b) (a, b) else (s"m${i % 7}", s"m${(i + 1) % 7}")
    }.filter(p => p._1 != p._2)
    val base = Preference.bradleyTerry(
      duels.toDF("winner", "loser"), rounds = 3)
      .collect.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val shuffled = Preference.bradleyTerry(
      scala.util.Random.shuffle(duels).toDF("winner", "loser")
        .repartition(7), rounds = 3)
      .collect.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(base === shuffled)
  }

  private def mine(minMargin: Long, rows: (String, Long, java.lang.Long)*) =
    Preference.dpoPairs(rows.toDF("p", "id", "s"), "p", "id", "s", minMargin)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet

  test("dpoPairs picks the exact extremes with min-id / max-id " +
      "tiebreaks and computes the margin") {
    // Max score 30 is tied between ids 2 and 3 → chosen = 2 (min id);
    // unique min 5 at id 4 → rejected = 4.
    val got = mine(0L, ("P", 1L, 10L), ("P", 2L, 30L), ("P", 3L, 30L),
      ("P", 4L, 5L))
    assert(got === Set(("P", 2L, 30L, 4L, 5L, 25L, 4L)))
  }

  test("dpoPairs pairs two DISTINCT rows even on an all-tied prompt") {
    val got = mine(0L, ("P", 1L, 7L), ("P", 2L, 7L), ("P", 3L, 7L))
    assert(got === Set(("P", 1L, 7L, 3L, 7L, 0L, 3L)))
  }

  test("dpoPairs drops below-margin prompts, single-candidate " +
      "prompts, and null-scored candidates") {
    val got = mine(26L,
      ("A", 1L, 10L), ("A", 2L, 30L),            // margin 20 < 26
      ("B", 1L, 0L), ("B", 2L, 100L),            // margin 100: kept
      ("C", 1L, 50L),                            // single candidate
      ("D", 1L, 50L), ("D", 2L, null))           // null drops -> single
    assert(got === Set(("B", 2L, 100L, 1L, 0L, 100L, 2L)))
  }

  test("grpoAdvantage matches the hand-computed cross-multiplied " +
      "normalization; degenerate groups are kept at 0") {
    // Group G: rewards 100/200/300 cents.  n=3, Σr=600, Σr²=140000,
    // radicand = 3·140000 − 600² = 60000, √60000 = 244.9489742783178.
    // A(100) = (300−600)/√60000 = −1.224745 (6 dp), A(200) = 0,
    // A(300) = +1.224745.  Group S is a single sample, group Z has
    // zero variance — both flagged degenerate with advantage 0.
    val rows = Seq(("G", 1L, 100L), ("G", 2L, 200L), ("G", 3L, 300L),
      ("S", 4L, 999L), ("Z", 5L, 7L), ("Z", 6L, 7L))
      .toDF("p", "id", "cents")
    val got = Preference.grpoAdvantage(rows, "p", "id", "cents")
      .as[(String, Long, Long, Long, Boolean, Double)].collect().toSet
    assert(got === Set(
      ("G", 1L, 100L, 3L, false, -1.224745),
      ("G", 2L, 200L, 3L, false, 0.0),
      ("G", 3L, 300L, 3L, false, 1.224745),
      ("S", 4L, 999L, 1L, true, 0.0),
      ("Z", 5L, 7L, 2L, true, 0.0),
      ("Z", 6L, 7L, 2L, true, 0.0)))
  }

  test("grpoAdvantage advantages sum to ~0 per non-degenerate group " +
      "and are partitioning-invariant") {
    val rows = (0 until 400).map(i =>
      (s"p${i % 13}", i.toLong, ((i * 37) % 500 + 1).toLong))
    val df = rows.toDF("p", "id", "cents")
    val a = Preference.grpoAdvantage(df, "p", "id", "cents")
    val sums = a.filter(!col("degenerate")).groupBy("p")
      .agg(sum("advantage").as("s")).as[(String, Double)].collect()
    sums.foreach { case (p, s) =>
      assert(math.abs(s) < 1e-3, s"group $p advantage sum $s")
    }
    val b = Preference.grpoAdvantage(df.repartition(7), "p", "id", "cents")
      .as[(String, Long, Long, Long, Boolean, Double)].collect().toSet
    assert(b === a.as[(String, Long, Long, Long, Boolean, Double)]
      .collect().toSet)
  }
}
