package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the label-quality gate of a supervised /
  * preference-data pipeline.  Before labels train anything, the
  * pipeline must know whether raters agree beyond chance; Cohen's κ
  * (two raters) and Fleiss' κ (R raters) are the standard statistics
  * (J. Cohen 1960; J. L. Fleiss 1971).
  *
  * Both are computed EXACTLY: every count, marginal product and
  * cross-multiplied numerator/denominator is integer arithmetic
  * (DECIMAL(38,0) where products can pass 2^63), and the reported ppm
  * value uses sign-extracted integral division — `sign·(|num|·10^6 div
  * den)` — so truncation-vs-floor never diverges across engines on
  * negative κ (worse-than-chance agreement is a real outcome the gate
  * must represent).  The exact rational (kappa_num, kappa_den) is
  * returned alongside the ppm so downstream thresholds can compare
  * without any rounding at all.
  *
  * Scale shape: one hash aggregation to the label-pair (resp.
  * item×category) contingency table, one aggregation over its
  * value-cardinality-bounded rows — the raw rating log is scanned once
  * and never re-shuffled.
  */
object Agreement {

  private def ppmExpr(num: String, den: String): String =
    s"CAST(CASE WHEN $num < 0 THEN -((-($num) * 1000000) div ($den)) " +
      s"ELSE (($num) * 1000000) div ($den) END AS BIGINT)"

  /** Cohen's κ for two raters labelling the same items.
    *
    * `labelled` must have (labelA, labelB) columns — one row per item.
    * Rows with a null label are dropped (a null is a missing rating,
    * not a category).  Returns one row: n, n_agree, po_ppm,
    * pe_ppm, kappa_num = n·agree − Σ_k a_k·b_k, kappa_den = n² − Σ_k
    * a_k·b_k, kappa_ppm.
    */
  def cohenKappa(labelled: DataFrame): DataFrame = {
    // (labelA, labelB) contingency cells — the only shuffle over the
    // item-sized input; everything after is over k² cells.  Null labels
    // are missing ratings, not categories: dropped HERE so n/agree and
    // the marginals stay consistent (a null cell would count toward n
    // but silently vanish from the inner marginal join).
    val cells = labelled
      .filter(col("labelA").isNotNull && col("labelB").isNotNull)
      .groupBy(col("labelA"), col("labelB")).agg(count(lit(1)).as("c"))
    // Marginal products Σ_k a_k·b_k via a label-keyed self-join of the
    // two marginal vectors (k rows each).
    val aMarg = cells.groupBy(col("labelA").as("k")).agg(sum("c").as("a_k"))
    val bMarg = cells.groupBy(col("labelB").as("k")).agg(sum("c").as("b_k"))
    val peNum = aMarg.join(bMarg, "k")
      .agg(sum(expr("CAST(a_k AS DECIMAL(38,0)) * b_k")).as("pe_num"))
    val totals = cells.agg(
      sum("c").as("n"),
      sum(when(col("labelA") === col("labelB"), col("c")).otherwise(0L))
        .as("n_agree"))
    totals.crossJoin(peNum).selectExpr(
      "CAST(n AS BIGINT) AS n",
      "CAST(n_agree AS BIGINT) AS n_agree",
      "CAST((CAST(n_agree AS DECIMAL(38,0)) * 1000000) div n AS BIGINT) AS po_ppm",
      "CAST((pe_num * 1000000) div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT) AS pe_ppm",
      "CAST(CAST(n AS DECIMAL(38,0)) * n_agree - pe_num AS DECIMAL(38,0)) AS kappa_num",
      "CAST(CAST(n AS DECIMAL(38,0)) * n - pe_num AS DECIMAL(38,0)) AS kappa_den",
      // kappa_den = 0 (Pe = 1: a single observed category on both
      // sides) leaves κ undefined — the sibling sentinel (-1000001,
      // matching cohenKappaWeighted's Se = 0 case) instead of an ANSI
      // DIVIDE_BY_ZERO at runtime.
      "CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * n - pe_num = 0 " +
        "THEN -1000001 ELSE " +
        ppmExpr("CAST(n AS DECIMAL(38,0)) * n_agree - pe_num",
          "CAST(n AS DECIMAL(38,0)) * n - pe_num") +
        " END AS BIGINT) AS kappa_ppm")
      .selectExpr("n", "n_agree", "po_ppm", "pe_ppm",
        // exact rational reported as BIGINT — fine up to ~3·10^9 items
        // (n² < 2^63 pre-division is avoided: num/den are emitted after
        // the DECIMAL computation, cast for a hashable dtype)
        "CAST(kappa_num AS BIGINT) AS kappa_num",
        "CAST(kappa_den AS BIGINT) AS kappa_den",
        "kappa_ppm")
  }

  /** Linear-weighted Cohen's κ for ORDINAL labels — near-misses on a
    * rating scale count partially (weight v_ij = |i−j|), so a rater
    * pair that is consistently one notch apart scores far better than
    * one scattering across the scale; unweighted κ cannot tell them
    * apart.  With disagreement weights the statistic collapses to
    * κ_w = 1 − n·So/Se = (Se − n·So)/Se with So = Σ|i−j|·o_ij (observed
    * weighted disagreement) and Se = Σ|i−j|·a_i·b_j (chance) — both
    * exact integers, ppm via the shared sign-split division.
    *
    * `labelled` must have integer-ordinal (labelA, labelB) columns;
    * null labels are dropped as in [[cohenKappa]].  Returns one row:
    * (n, so, se, kappa_ppm) with kappa_ppm = -1000001 when Se = 0
    * (fewer than two distinct marginal levels — κ_w undefined).
    */
  def cohenKappaWeighted(labelled: DataFrame): DataFrame = {
    val cells = labelled
      .filter(col("labelA").isNotNull && col("labelB").isNotNull)
      .groupBy(col("labelA").cast("long").as("la"),
        col("labelB").cast("long").as("lb"))
      .agg(count(lit(1)).as("c"))
    val aMarg = cells.groupBy(col("la").as("i")).agg(sum("c").as("a_i"))
    val bMarg = cells.groupBy(col("lb").as("j")).agg(sum("c").as("b_j"))
    // Se folds over the FULL ka×kb marginal grid (weight applies to
    // zero-observed cells too) — the category-cardinality cross, the
    // same bounded shape as chiSquared's contingency grid.
    val se = aMarg.crossJoin(bMarg)
      .agg(sum(expr(
        "abs(i - j) * CAST(a_i AS DECIMAL(38,0)) * b_j")).as("se"))
    val obs = cells.agg(
      sum("c").as("n"),
      sum(expr("abs(la - lb) * CAST(c AS DECIMAL(38,0))")).as("so"))
    obs.crossJoin(se).selectExpr(
      "CAST(n AS BIGINT) AS n",
      "CAST(so AS BIGINT) AS so",
      "CAST(se AS BIGINT) AS se",
      "CAST(CASE WHEN se = 0 THEN -1000001 ELSE " +
        ppmExpr("se - CAST(n AS DECIMAL(38,0)) * so", "se") +
        " END AS BIGINT) AS kappa_ppm")
  }

  /** Fleiss' κ for R raters per item.
    *
    * `ratings` must have (item, category) columns — exactly `r` rows
    * per item (the fixed-panel contract of the statistic; enforce
    * upstream, e.g. take the first r ratings per item).  Returns one
    * row: n_items, r, po_ppm, pe_ppm, kappa_ppm where
    * Po = (Σ_ik n_ik² − N·R) / (N·R·(R−1)) and Pe = Σ_k S_k² / (N·R)²
    * and κ = (Po−Pe)/(1−Pe) cross-multiplied into integer num/den.
    */
  def fleissKappa(ratings: DataFrame, r: Int): DataFrame = {
    require(r >= 2, s"need at least 2 raters per item, got $r")
    // item×category counts n_ik — the one shuffle over the rating log.
    // A null category is a missing rating (dropping it would break the
    // exactly-r panel contract for that item, so fail the contract
    // upstream rather than skew Po here): filtered for consistency
    // with cohenKappa.
    val nik = ratings
      .filter(col("item").isNotNull && col("category").isNotNull)
      .groupBy(col("item"), col("category"))
      .agg(count(lit(1)).as("n_ik"))
    // Σ_ik n_ik² and N from one pass over the cells.
    val sq = nik.agg(
      sum(expr("CAST(n_ik AS DECIMAL(38,0)) * n_ik")).as("sum_sq"),
      count_distinct(col("item")).as("n_items"))
    // Category totals S_k, then Σ_k S_k² over the k-row frame.
    val sk = nik.groupBy("category").agg(sum("n_ik").as("s_k"))
      .agg(sum(expr("CAST(s_k AS DECIMAL(38,0)) * s_k")).as("sum_sk_sq"))
    // κ = (A·D − B·C) / (B·(D − C)) with A = Σn_ik²−NR, B = NR(R−1),
    // C = Σ S_k², D = (NR)² — all DECIMAL(38,0) exact.
    sq.crossJoin(sk).selectExpr(
      "CAST(n_items AS BIGINT) AS n_items",
      s"CAST($r AS BIGINT) AS r",
      s"CAST(((sum_sq - n_items * $r) * 1000000) div " +
        s"(CAST(n_items AS DECIMAL(38,0)) * $r * ($r - 1)) AS BIGINT) AS po_ppm",
      s"CAST((sum_sk_sq * 1000000) div " +
        s"(CAST(n_items AS DECIMAL(38,0)) * $r * n_items * $r) AS BIGINT) AS pe_ppm",
      // 1 − Pe = 0 (every rating in one category: (NR)² = Σ S_k²)
      // leaves κ undefined — the -1000001 sentinel, matching
      // cohenKappa / cohenKappaWeighted, instead of DIVIDE_BY_ZERO.
      s"CAST(CASE WHEN CAST(n_items AS DECIMAL(38,0)) * $r * ($r - 1) * " +
        s"(CAST(n_items AS DECIMAL(38,0)) * $r * n_items * $r - sum_sk_sq) = 0 " +
        "THEN -1000001 ELSE " +
        ppmExpr(
          s"(sum_sq - n_items * $r) * (CAST(n_items AS DECIMAL(38,0)) * $r * n_items * $r)" +
            s" - CAST(n_items AS DECIMAL(38,0)) * $r * ($r - 1) * sum_sk_sq",
          s"CAST(n_items AS DECIMAL(38,0)) * $r * ($r - 1) * " +
            s"(CAST(n_items AS DECIMAL(38,0)) * $r * n_items * $r - sum_sk_sq)") +
        " END AS BIGINT) AS kappa_ppm")
  }

  /** Krippendorff's α (nominal) — the agreement statistic for the
    * messy real case [[cohenKappa]] and [[fleissKappa]] exclude:
    * VARIABLE raters per unit and missing ratings (Krippendorff 2004).
    * Units with fewer than 2 ratings are unpairable and drop out, as
    * the statistic defines.
    *
    * Exactness device: α = 1 − (N−1)·Σ_u P_u/(m_u−1) / (N² − Σ_c n_c²)
    * where m_u = ratings in unit u, P_u = m_u² − Σ_c n_uc² (disagreeing
    * ordered pairs in u), N = Σ m_u, n_c = category totals.  The only
    * fractions are the per-unit 1/(m_u−1) weights; scaling every term
    * by L = lcm(1..12) = 27720 makes them integers EXACTLY, provided
    * m_u ≤ 13 — enforced loudly per unit (bound the panel upstream with
    * a [[graft.plans.TopKPerKey]] take, the [[fleissKappa]] contract).
    * Everything then runs in DECIMAL(38,0): at N = 10¹², R = 13 the
    * worst term (N−1)·Σ P_u·L/(m_u−1) ≤ N²·R·L ≈ 4·10³⁰ — five digits
    * of headroom before the ppm multiply.
    *
    * @param ratings one row per rating with (unitCol, labelCol); null
    *        labels are missing ratings and drop (the statistic's own
    *        convention — that is its point)
    * @return one row: (n_units, n_pairable, n_categories, alpha_ppm) —
    *         alpha_ppm is the sentinel −2000000 when De = 0 (a single
    *         observed category: α undefined).  The scaled rationals
    *         stay internal (DECIMAL(38,0) exceeds a BIGINT report
    *         column); the exactness is in the ppm itself.
    */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
      labelCol: String): DataFrame = {
    val L = 27720L // lcm(1..12): exact per-unit weights for m_u <= 13
    // unit×category counts — the one shuffle over the rating log.
    val nuc = ratings
      .filter(col(unitCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    // Per-unit m_u and Σ n_uc²; pairable units only (m_u >= 2).
    val units = nuc.groupBy(col("__u"))
      .agg(sum(col("__n")).as("__m"),
        sum(expr("CAST(__n AS DECIMAL(38,0)) * __n")).as("__sq"))
      .filter(col("__m") >= 2L)
      .withColumn("__m", when(col("__m") <= 13L, col("__m"))
        .otherwise(raise_error(concat(
          lit("krippendorffAlpha: unit with > 13 ratings (m_u = "),
          col("__m").cast("string"),
          lit(") — bound the panel upstream (TopKPerKey)")))))
    val doN = units.agg(
      count(lit(1)).as("n_units"),
      sum(col("__m")).as("__bign"),
      sum((expr("CAST(__m AS DECIMAL(38,0)) * __m") - col("__sq")) *
        expr(s"CAST($L div (__m - 1) AS DECIMAL(38,0))")).as("do_num"))
    // Category totals over PAIRABLE units only, then Σ n_c².
    val sk = nuc.join(units.select(col("__u")), Seq("__u"))
      .groupBy(col("__c")).agg(sum(col("__n")).as("__nc"))
      .agg(count(lit(1)).as("n_categories"),
        sum(expr("CAST(__nc AS DECIMAL(38,0)) * __nc")).as("__sk"))
    doN.crossJoin(sk).selectExpr(
      "CAST(n_units AS BIGINT) AS n_units",
      "CAST(__bign AS BIGINT) AS n_pairable",
      "CAST(n_categories AS BIGINT) AS n_categories",
      "CAST(CASE WHEN CAST(__bign AS DECIMAL(38,0)) * __bign - __sk = 0 " +
        "THEN -2000000 ELSE " +
        ppmExpr(
          s"$L * (CAST(__bign AS DECIMAL(38,0)) * __bign - __sk) " +
            "- (__bign - 1) * do_num",
          s"$L * (CAST(__bign AS DECIMAL(38,0)) * __bign - __sk)") +
        " END AS BIGINT) AS alpha_ppm")
  }
}
