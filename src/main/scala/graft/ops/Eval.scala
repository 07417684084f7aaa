package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation — the model-quality gate a pipeline runs on
  * its quality/toxicity/language filters before trusting them to
  * curate data.  Complements [[Retrieval]]'s ranking metrics
  * (recall@k / MRR / nDCG) with the supervised side: confusion counts,
  * precision/recall/F1, exact AUC, and expected calibration error.
  *
  * Everything is integer-exact, so the whole report is bit-identical
  * under any partitioning and directly oracle-checkable:
  *
  *  - AUC is the tie-corrected Mann–Whitney statistic the engine
  *    already computes exactly ([[Drift.rankSumU]]'s integer 2U over
  *    the merged distinct-score frame): AUC = U / (P·N), reported as
  *    `u2·10^6 div (2·P·N)`.  No trapezoid sweep, no float ranks.
  *  - ECE over B equal-width probability bins telescopes to
  *    `Σ_b |Σp − 10^6·pos_b| div N` in micro-units — the per-bin
  *    |confidence − accuracy| times n_b is an exact integer before
  *    any division.
  *
  * Scale shape: one pass for the confusion row (map-side-combined
  * aggregation), one distinct-value aggregation for AUC (shuffle
  * bounded by score cardinality, never row count), one B-row
  * aggregation for ECE; the three 1-row results cross-join into the
  * single report row.
  */
object Eval {

  /** Evaluate micro-unit probability scores against boolean labels.
    *
    * `probCol` must be an integer micro-unit probability in
    * [0, 1_000_000] (squash an unbounded score upstream — a clamped
    * affine map keeps everything integer); `labelCol` boolean.  Rows
    * with a null score or label are dropped.  Both classes must be
    * present for AUC (reported as -1 when one is empty, as are the
    * P/R/F1 ratios when their denominator is zero — a sentinel, never
    * a divide-by-zero).
    *
    * @return one row: (n, n_pos, tp, fp, tn, fn, precision_ppm,
    *         recall_ppm, f1_ppm, auc_ppm, ece_ppm)
    */
  def classifierEval(scored: DataFrame, probCol: String, labelCol: String,
      thresholdMicro: Long, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of range: $bins")
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"thresholdMicro out of range: $thresholdMicro")
    // Four consumers read the (score, label) projection — the confusion
    // row, BOTH rankSumU sides, and the ECE bins — and `scored` is
    // typically an expensive scoring expression (a per-character fold
    // in the quality-classifier gate).  Materialize the 9-byte-per-row
    // projection once instead of re-scoring the corpus four times;
    // lineage still traces through via the captured checkpoint.
    val base = CacheScope.traced(scored
      .select(col(probCol).cast("long").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull))
    val conf = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("__y") && col("__p") >= thresholdMicro, 1L)
        .otherwise(0L)).as("tp"),
      sum(when(!col("__y") && col("__p") >= thresholdMicro, 1L)
        .otherwise(0L)).as("fp"),
      sum(when(!col("__y") && col("__p") < thresholdMicro, 1L)
        .otherwise(0L)).as("tn"),
      sum(when(col("__y") && col("__p") < thresholdMicro, 1L)
        .otherwise(0L)).as("fn"))
    val auc = Drift
      .rankSumU(base.filter(col("__y")), base.filter(!col("__y")), "__p")
      .selectExpr(
        "CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN " +
          "(CAST(u2 AS DECIMAL(38,0)) * 1000000) div " +
          "(CAST(2 AS DECIMAL(38,0)) * n_a * n_b) " +
          "ELSE -1 END AS BIGINT) AS auc_ppm")
    val ece = base
      .selectExpr(s"least((__p * $bins) div 1000000, ${bins - 1}) AS __b",
        "__p", "__y")
      .groupBy("__b").agg(
        count(lit(1)).as("nb"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pb"),
        sum(col("__p")).as("sp"))
      .agg(sum(expr(
        "abs(CAST(sp AS DECIMAL(38,0)) - CAST(pb AS DECIMAL(38,0)) * 1000000)"))
        .as("num"), sum("nb").as("den"))
      // empty scored frame → den NULL: report the same -1 sentinel as
      // auc/precision/recall/f1 rather than a NULL that poisons joins.
      .selectExpr("CAST(CASE WHEN den > 0 THEN num div den " +
        "ELSE -1 END AS BIGINT) AS ece_ppm")
    conf.crossJoin(auc).crossJoin(ece).selectExpr(
      "CAST(n AS BIGINT) AS n",
      "CAST(n_pos AS BIGINT) AS n_pos",
      "CAST(tp AS BIGINT) AS tp", "CAST(fp AS BIGINT) AS fp",
      "CAST(tn AS BIGINT) AS tn", "CAST(fn AS BIGINT) AS fn",
      "CAST(CASE WHEN tp + fp > 0 THEN " +
        "(CAST(tp AS DECIMAL(38,0)) * 1000000) div (tp + fp) " +
        "ELSE -1 END AS BIGINT) AS precision_ppm",
      "CAST(CASE WHEN tp + fn > 0 THEN " +
        "(CAST(tp AS DECIMAL(38,0)) * 1000000) div (tp + fn) " +
        "ELSE -1 END AS BIGINT) AS recall_ppm",
      "CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN " +
        "(CAST(tp AS DECIMAL(38,0)) * 2000000) div (2 * tp + fp + fn) " +
        "ELSE -1 END AS BIGINT) AS f1_ppm",
      "auc_ppm", "ece_ppm")
  }

  /** Forecast-baseline evaluation — the sanity floor every trained
    * forecaster must beat (the MASE denominator idea): predict each
    * event's integer value by the key's PREVIOUS value (persistence)
    * and report exact error sums plus R² against the global-mean
    * predictor.
    *
    * All integer: per-key lag-1 residuals in value units, error sums
    * exact, and R² = 1 − SSres/SStot cross-multiplied to
    * `((n·Σy² − (Σy)²) − n·SSres)·10^6 div (n·Σy² − (Σy)²)` with
    * sign-split division — persistence on anti-correlated series is
    * legitimately WORSE than the mean, so negative R² must be exact
    * too.  First event of each key has no prediction and is excluded
    * from both SSres and SStot (the compared predictors see the same
    * rows).
    *
    * Scale shape: one per-key lag (per-key row counts bounded by the
    * feed contract — the rollingAnomalies bound), one
    * map-side-combined aggregation to the report row.
    *
    * @return one row: (n, sum_abs_err, sum_sq_err, r2_ppm)
    */
  def persistenceBaseline(events: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(valueCol).cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .withColumn("__prev", lag(col("__y"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(abs(col("__y") - col("__prev"))).as("sae"),
        sum(expr(
          "CAST(__y - __prev AS DECIMAL(38,0)) * (__y - __prev)")).as("sse"),
        sum(col("__y")).as("sy"),
        sum(expr("CAST(__y AS DECIMAL(38,0)) * __y")).as("syy"))
      .selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(sae AS BIGINT) AS sum_abs_err",
        "CAST(sse AS BIGINT) AS sum_sq_err",
        "CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * syy - " +
          "CAST(sy AS DECIMAL(38,0)) * sy = 0 THEN -1000001 " +
          "WHEN (CAST(n AS DECIMAL(38,0)) * syy - " +
          "CAST(sy AS DECIMAL(38,0)) * sy) - n * sse < 0 THEN " +
          "-((n * sse - (CAST(n AS DECIMAL(38,0)) * syy - " +
          "CAST(sy AS DECIMAL(38,0)) * sy)) * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy)) " +
          "ELSE ((CAST(n AS DECIMAL(38,0)) * syy - " +
          "CAST(sy AS DECIMAL(38,0)) * sy) - n * sse) * 1000000 div " +
          "(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy) " +
          "END AS BIGINT) AS r2_ppm")
  }

  /** Reliability table — the per-bin view the scalar ECE summarizes:
    * for each of B equal-width probability bins, the support, positive
    * count, mean confidence, empirical accuracy, and the signed
    * confidence−accuracy gap (all exact integral ppm; the gap uses the
    * same sign-split division as [[Agreement]] so over- and
    * under-confident bins never hit floor-vs-trunc divergence).  One
    * map-side-combined aggregation to B rows.
    */
  def calibrationBins(scored: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins out of range: $bins")
    scored
      .select(col(probCol).cast("long").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .selectExpr(s"least((__p * $bins) div 1000000, ${bins - 1}) AS bin",
        "__p", "__y")
      .groupBy("bin").agg(
        count(lit(1)).cast("long").as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).cast("long").as("n_pos"),
        sum(col("__p")).as("__sp"))
      .selectExpr("bin", "n", "n_pos",
        "CAST((CAST(__sp AS DECIMAL(38,0))) div n AS BIGINT) AS conf_ppm",
        "CAST((CAST(n_pos AS DECIMAL(38,0)) * 1000000) div n AS BIGINT)" +
          " AS acc_ppm",
        "CAST(CASE WHEN CAST(__sp AS DECIMAL(38,0)) " +
          "- CAST(n_pos AS DECIMAL(38,0)) * 1000000 < 0 THEN " +
          "-((CAST(n_pos AS DECIMAL(38,0)) * 1000000 - __sp) div n) " +
          "ELSE (CAST(__sp AS DECIMAL(38,0)) " +
          "- CAST(n_pos AS DECIMAL(38,0)) * 1000000) div n " +
          "END AS BIGINT) AS gap_ppm")
      .orderBy("bin")
  }

  /** Precision–recall curve over every distinct score threshold — the
    * artifact a pipeline reads to PICK the filter threshold the
    * confusion row then reports at.
    *
    * One aggregation collapses the row count to the distinct-score
    * frame (ca/cb per score); cumulative tp/fp at each threshold come
    * from ONE [[PipelineOps.segmentedPrefixSums]] pass over that frame
    * ordered by DESCENDING threshold (negated key) — for a CONTINUOUS
    * score column distinct ≈ rows, so the cumulative scan must be
    * partition-bounded, never an unpartitioned ordered window (the
    * same reshape as [[Drift.ksStatistic]]).  The positive total is a
    * 1-row scalar aggregate broadcast back.  All ratios are exact
    * integral ppm.
    *
    * @return (threshold_micro, tp, fp, precision_ppm, recall_ppm),
    *         descending thresholds; `recall_ppm` is -1 when there are
    *         no positive labels at all.
    */
  def prCurve(scored: DataFrame, probCol: String,
      labelCol: String): DataFrame = {
    val base = scored
      .select(col(probCol).cast("long").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
    val cnt = base.groupBy(col("__p").as("threshold_micro")).agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__ca"),
      sum(when(col("__y"), 0L).otherwise(1L)).as("__cb"))
    val tot = cnt.agg(sum(col("__ca")).cast("long").as("__pos"))
    PipelineOps.segmentedPrefixSums(
        cnt.withColumn("__seg", lit(1))
          .withColumn("__negt", -col("threshold_micro")),
        Seq("__seg"), Seq("__negt"), Seq("__ca", "__cb"))
      .withColumn("tp", (col("__before___ca") + col("__ca")).cast("long"))
      .withColumn("fp", (col("__before___cb") + col("__cb")).cast("long"))
      .crossJoin(broadcast(tot))
      .selectExpr("threshold_micro", "tp", "fp",
        "CAST((CAST(tp AS DECIMAL(38,0)) * 1000000) div (tp + fp) AS BIGINT)" +
          " AS precision_ppm",
        "CAST(CASE WHEN __pos > 0 THEN " +
          "(CAST(tp AS DECIMAL(38,0)) * 1000000) div __pos " +
          "ELSE -1 END AS BIGINT) AS recall_ppm")
      .orderBy(col("threshold_micro").desc)
  }

  /** Corpus-level clipped n-gram overlap between candidate and
    * reference token sequences — the shared kernel of BLEU (Papineni
    * et al. 2002: modified n-gram PRECISION with per-gram clipping)
    * and ROUGE-n (Lin 2004: the same clipped matches read as RECALL
    * against the reference), evaluated for every n in 1..maxN at once.
    *
    * `matched_n = Σ_pair Σ_gram min(cand_count, ref_count)` — the
    * clipping is per (pair, gram), so a candidate repeating a rare
    * reference gram cannot farm precision.  All three corpus sums are
    * exact integers; precision/recall/F1 are exact ppm via integral
    * division (F1 = 2·matched/(cand_total+ref_total) shares the
    * matched numerator, so it needs no float composition either).
    *
    * Scale shape: ZERO-shuffle scan — candidate and reference live on
    * the same pair row, so the per-gram clip happens inside the row
    * via the codegen [[graft.functions.ClippedMatchCount]] hash-count
    * kernel (O(|c|+|r|) per order, exact string equality — no hash
    * collisions even in principle), and the only exchange is the
    * final maxN-row scalar aggregate.  Nothing gram-shaped ever
    * shuffles.
    *
    * @param pairs one row per (candidate, reference) pair
    * @return maxN rows: (n, matched, cand_total, ref_total, prec_ppm,
    *         recall_ppm, f1_ppm); ppm are -1 when their denominator
    *         is 0
    */
  def ngramOverlap(pairs: DataFrame, idCol: String, candToksCol: String,
      refToksCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in 1..8, got $maxN")
    // gram arrays materialized in their own projection; the clip
    // happens INSIDE each row (both sides live there) via the codegen
    // [[graft.functions.ClippedMatchCount]] hash-count kernel, so the
    // whole metric is a zero-shuffle scan + one maxN-row aggregate —
    // the former (pair, n, gram) cell aggregation shuffled O(corpus
    // grams) for nothing.
    val grams = pairs.select(
      (1 to maxN).flatMap { n =>
        Seq(PipelineOps.wordNgrams(col(candToksCol), n).as(s"__c$n"),
          PipelineOps.wordNgrams(col(refToksCol), n).as(s"__r$n"))
      }: _*)
    val aggs = (1 to maxN).flatMap { n =>
      Seq(
        coalesce(sum(graft.functions.clipped_match_count(
          col(s"__c$n"), col(s"__r$n"))), lit(0L))
          .cast("long").as(s"__m$n"),
        coalesce(sum(size(col(s"__c$n")).cast("long")), lit(0L))
          .cast("long").as(s"__ct$n"),
        coalesce(sum(size(col(s"__r$n")).cast("long")), lit(0L))
          .cast("long").as(s"__rt$n"))
    }
    grams.agg(aggs.head, aggs.tail: _*)
      .select(explode(array((1 to maxN).map { n =>
        struct(lit(n).as("n"), col(s"__m$n").as("matched"),
          col(s"__ct$n").as("cand_total"), col(s"__rt$n").as("ref_total"))
      }: _*)).as("__p"))
      .select(col("__p.n").as("n"), col("__p.matched").as("matched"),
        col("__p.cand_total").as("cand_total"),
        col("__p.ref_total").as("ref_total"))
      // an order with no grams on EITHER side never existed as a row
      // in the cell-aggregation formulation — keep that contract.
      .filter(col("cand_total") + col("ref_total") > 0L)
      .selectExpr("n", "matched", "cand_total", "ref_total",
        "CAST(CASE WHEN cand_total > 0 THEN " +
          "(CAST(matched AS DECIMAL(38,0)) * 1000000) div cand_total " +
          "ELSE -1 END AS BIGINT) AS prec_ppm",
        "CAST(CASE WHEN ref_total > 0 THEN " +
          "(CAST(matched AS DECIMAL(38,0)) * 1000000) div ref_total " +
          "ELSE -1 END AS BIGINT) AS recall_ppm",
        "CAST(CASE WHEN cand_total + ref_total > 0 THEN " +
          "(CAST(matched AS DECIMAL(38,0)) * 2000000) div " +
          "(cand_total + ref_total) ELSE -1 END AS BIGINT) AS f1_ppm")
  }

  /** Self-BLEU-style within-group n-gram overlap — the DIVERSITY read
    * on a corpus slice (Zhu et al. 2018, "Texygen", arXiv:1802.01886):
    * how much of each document's n-gram mass reappears in its sibling
    * documents.  High self-overlap flags templated/boilerplate
    * sources that token-level dedup misses; low overlap means the
    * slice is genuinely diverse.
    *
    * Each group contributes its first `k` docs by id (a bounded-heap
    * [[graft.plans.TopKPerKey]] pass — never a per-group window), all
    * k·(k−1) ordered (candidate, reference) pairs are formed by a
    * group-keyed equi-join, and per n the clipped multiset match runs
    * INSIDE each pair row via the codegen
    * [[graft.functions.ClippedMatchCount]] kernel — zero gram
    * shuffling, one aggregation per group.  All counts exact integers;
    * the ratio is one integral ppm division.
    *
    * @return per (groupCol, n): (matched, cand_total, self_ppm) —
    *         self_ppm = ⌊10⁶·matched/cand_total⌋; orders with no
    *         candidate grams in the whole group are absent
    */
  def selfOverlap(docs: DataFrame, groupCol: String, idCol: String,
      textCol: String, k: Int, maxN: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2, 64], got $k")
    require(maxN >= 1 && maxN <= 8, s"maxN must be in 1..8, got $maxN")
    val sample = graft.plans.TopK.perKey(
      docs.select(col(groupCol).as("__g"), col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__toks")),
      Seq(col("__g")), Seq(col("__id").asc), k)
    val a = sample.select(col("__g"), col("__id").as("__ca"),
      col("__toks").as("__ct"))
    val b = sample.select(col("__g").as("__g2"), col("__id").as("__rb"),
      col("__toks").as("__rt"))
    val pairs = a.join(b,
      col("__g") === col("__g2") && col("__ca") =!= col("__rb"))
    val grams = pairs.select(col("__g") +: (1 to maxN).flatMap { n =>
      Seq(PipelineOps.wordNgrams(col("__ct"), n).as(s"__c$n"),
        PipelineOps.wordNgrams(col("__rt"), n).as(s"__r$n"))
    }: _*)
    val aggs = (1 to maxN).flatMap { n =>
      Seq(
        coalesce(sum(graft.functions.clipped_match_count(
          col(s"__c$n"), col(s"__r$n"))), lit(0L))
          .cast("long").as(s"__m$n"),
        coalesce(sum(size(col(s"__c$n")).cast("long")), lit(0L))
          .cast("long").as(s"__t$n"))
    }
    grams.groupBy(col("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__g").as(groupCol),
        explode(array((1 to maxN).map { n =>
          struct(lit(n).as("n"), col(s"__m$n").as("matched"),
            col(s"__t$n").as("cand_total"))
        }: _*)).as("__p"))
      .select(col(groupCol), col("__p.n").as("n"),
        col("__p.matched").as("matched"),
        col("__p.cand_total").as("cand_total"))
      .filter(col("cand_total") > 0L)
      .withColumn("self_ppm", expr(
        "CAST((CAST(matched AS DECIMAL(38,0)) * 1000000) div cand_total " +
          "AS BIGINT)"))
  }

  /** Distinct-n diversity ratio per group (Li et al. 2016, "A
    * Diversity-Promoting Objective Function for Neural Conversation
    * Models" — the distinct-1/distinct-2 metrics): distinct n-grams
    * over total n-grams.  The cheap corpus-wide complement to
    * [[selfOverlap]] (which is pairwise and sample-bounded): a
    * templated slice shows a low ratio long before pairwise overlap
    * is computed.
    *
    * Exact distinct by construction (count-distinct over the (group,
    * n, gram) frame — gram-cardinality shuffle; at whole-corpus scale
    * swap in the HLL sketch ops for the approximate read).  Counts
    * exact integers; the ratio is one integral ppm division.
    *
    * @return per (groupCol, n): (total_grams, distinct_grams,
    *         distinct_ppm); (group, n) slices with zero grams are
    *         absent
    */
  def distinctNgramRatio(docs: DataFrame, groupCol: String,
      textCol: String, maxN: Int): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in 1..8, got $maxN")
    val toks = docs.select(col(groupCol).as("__g"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col("__g"), explode(flatten(array(
        (1 to maxN).map(n =>
          transform(PipelineOps.wordNgrams(col("__toks"), n),
            g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("__p"))
      .select(col("__g"), col("__p.n").as("n"), col("__p.gram").as("__gram"))
    grams.groupBy(col("__g"), col("n"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("__gram")).as("distinct_grams"))
      .select(col("__g").as(groupCol), col("n"),
        col("total_grams"), col("distinct_grams"),
        expr("CAST((CAST(distinct_grams AS DECIMAL(38,0)) * 1000000) " +
          "div total_grams AS BIGINT)").as("distinct_ppm"))
  }

  /** Paired bootstrap comparison of two per-item scores — THE standard
    * "is system A actually better than system B?" test (Koehn 2004 for
    * MT; same mechanics for any paired metric): resample the ITEMS
    * with deterministic Poisson(1) weights (Chamandy et al. one-pass
    * bootstrap, the [[Checks.bootstrapMeanCI]] device) and read off
    * (a) the CI of the mean paired difference and (b) how many
    * resamples each system wins — the win fraction IS the bootstrap
    * p-value's complement.
    *
    * Exactness: per-resample Σw·d sums are exact integers in cents, so
    * wins/ties/losses are exact; only the b quantile means divide (the
    * same double division both engines replay identically).
    *
    * Scale shape: one scan explodes each pair row to its b weighted
    * copies (b is a config constant), one map-side-combined aggregation
    * to b rows, one window over that b-row frame.  No driver state, no
    * per-item global rank.
    *
    * @return one row: (n_rows, b_eff, mean_diff, ci_lo, ci_hi, wins_a,
    *         ties, wins_b); diff = a − b in the caller's money units
    */
  def pairedBootstrap(df: DataFrame, idCol: String, aCol: String,
      bCol: String, b: Int, seed: Long, loP: Double = 0.025,
      hiP: Double = 0.975): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(b >= 2 && b <= 10000, s"resample count out of range: $b")
    require(seed >= 0 && loP > 0 && hiP < 1 && loP < hiP)
    val rLo = math.ceil(loP * b).toLong
    val rHi = math.ceil(hiP * b).toLong
    val cents = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(idCol).cast("long").as("__i"),
        (round(col(aCol) * 100).cast("long") -
          round(col(bCol) * 100).cast("long")).as("__d"))
    val res = cents
      .select(col("__i"), col("__d"),
        explode(sequence(lit(0), lit(b - 1))).as("__j"))
      .withColumn("__u1", pmod(
        col("__i") * 2654435761L + col("__j") * 40503L + seed,
        lit(2147483648L)))
      .withColumn("__u", pmod(col("__u1") * 48271L + col("__j"),
        lit(2147483648L)))
      .withColumn("__w", when(col("__u") < 790015084L, 0L)
        .when(col("__u") < 1580030169L, 1L)
        .when(col("__u") < 1975037711L, 2L)
        .when(col("__u") < 2106706892L, 3L)
        .when(col("__u") < 2139624187L, 4L)
        .otherwise(5L))
      .groupBy(col("__j"))
      .agg(sum(col("__w") * col("__d")).as("__s"),
        sum(col("__w")).as("__n"))
      .filter(col("__n") > 0)
    val ranked = res
      .select(col("__j"), col("__s"),
        (col("__s").cast("double") / col("__n").cast("double")).as("__mv"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__mv"), col("__j"))))
    val ci = ranked.agg(count(lit(1)).as("b_eff"),
      max(when(col("__r") === rLo, col("__mv"))).as("__lo"),
      max(when(col("__r") === rHi, col("__mv"))).as("__hi"),
      sum(when(col("__s") > 0L, 1L).otherwise(0L)).cast("long")
        .as("wins_a"),
      sum(when(col("__s") === 0L, 1L).otherwise(0L)).cast("long")
        .as("ties"),
      sum(when(col("__s") < 0L, 1L).otherwise(0L)).cast("long")
        .as("wins_b"))
    cents.agg(count(lit(1)).as("n_rows"), sum(col("__d")).as("__ts"))
      .crossJoin(ci)
      .select(col("n_rows"), col("b_eff"),
        round(col("__ts").cast("double") / 100d / col("n_rows"), 6)
          .as("mean_diff"),
        round(col("__lo") / 100d, 6).as("ci_lo"),
        round(col("__hi") / 100d, 6).as("ci_hi"),
        col("wins_a"), col("ties"), col("wins_b"))
  }

  /** Corpus chrF (Popović 2015): character n-gram F-β over
    * (candidate, reference) string pairs — the tokenization-free
    * metric that credits morphological near-misses BLEU's word grams
    * score zero.  Whitespace is stripped first (the chrF convention:
    * spaces are segmentation, not content), then the clipped-overlap
    * kernel of [[ngramOverlap]] runs on character arrays for
    * n = 1..`maxN`.
    *
    * Exactness device: per order, F-β reduces over the exact integer
    * corpus sums to `(1+β²)·m / (β²·r + c)` — ONE integral division —
    * so unlike float-composed P·R/(βP+R) the whole metric (and its
    * order-mean, if the caller averages the ppm column) stays
    * bit-exact across engines.
    *
    * @return maxN rows: (n, matched, cand_total, ref_total, fbeta_ppm);
    *         fbeta_ppm is -1 when β²·r + c = 0 (no grams on either side)
    */
  def chrF(pairs: DataFrame, idCol: String, candStrCol: String,
      refStrCol: String, maxN: Int = 6, beta: Int = 2): DataFrame = {
    require(beta >= 1 && beta <= 10, s"beta must be in 1..10, got $beta")
    // whitespace-strip in its OWN projection, char explode in the
    // next — a regexp captured inside the transform lambda would
    // re-evaluate per character (the repo-wide HOF gotcha).
    val cleaned = pairs.select(col(idCol),
      regexp_replace(col(candStrCol), "\\s+", "").as("__cs"),
      regexp_replace(col(refStrCol), "\\s+", "").as("__rs"))
    def chars(c: String) = when(length(col(c)) > 0,
      transform(sequence(lit(1), length(col(c))),
        i => substring(col(c), i, lit(1))))
      .otherwise(array().cast("array<string>"))
    val b2 = beta.toLong * beta
    ngramOverlap(
        cleaned.select(col(idCol), chars("__cs").as("__cch"),
          chars("__rs").as("__rch")),
        idCol, "__cch", "__rch", maxN)
      .selectExpr("n", "matched", "cand_total", "ref_total",
        s"CAST(CASE WHEN $b2 * ref_total + cand_total > 0 THEN " +
          s"(CAST(matched AS DECIMAL(38,0)) * ${(1 + b2) * 1000000L}) " +
          s"div ($b2 * ref_total + cand_total) " +
          "ELSE -1 END AS BIGINT) AS fbeta_ppm")
  }

  /** Corpus ROUGE-L (Lin 2004): micro-averaged LCS recall / precision /
    * F1 over (candidate, reference) token pairs — the ORDER-AWARE
    * complement of [[ngramOverlap]] (a shuffled candidate keeps its
    * clipped unigram overlap but loses its LCS).  The per-pair LCS
    * length comes from the codegen [[graft.functions.LcsLen]] dynamic
    * program, so the whole metric is ONE scan: pair row → lcs/|c|/|r|
    * in the projection → one map-side-combined aggregation to a single
    * report row.  All sums are exact integers; ppm ratios are integral
    * division (non-negative, so floor == truncate in any engine).
    *
    * Scale contract (inherited from the kernel): token arrays must be
    * capped upstream — per-row DP cost is |c|·|r|; the kernel fails
    * loudly past 4096 a side.
    *
    * @return one row: (lcs_total, cand_total, ref_total, prec_ppm,
    *         recall_ppm, f1_ppm); ppm are -1 when their denominator is 0
    */
  def rougeL(pairs: DataFrame, candToksCol: String,
      refToksCol: String): DataFrame =
    pairs
      .select(
        graft.functions.lcs_len(col(candToksCol), col(refToksCol))
          .as("__lcs"),
        size(col(candToksCol)).cast("long").as("__nc"),
        size(col(refToksCol)).cast("long").as("__nr"))
      .agg(sum(col("__lcs")).cast("long").as("lcs_total"),
        sum(col("__nc")).cast("long").as("cand_total"),
        sum(col("__nr")).cast("long").as("ref_total"))
      .selectExpr("lcs_total", "cand_total", "ref_total",
        "CAST(CASE WHEN cand_total > 0 THEN " +
          "(CAST(lcs_total AS DECIMAL(38,0)) * 1000000) div cand_total " +
          "ELSE -1 END AS BIGINT) AS prec_ppm",
        "CAST(CASE WHEN ref_total > 0 THEN " +
          "(CAST(lcs_total AS DECIMAL(38,0)) * 1000000) div ref_total " +
          "ELSE -1 END AS BIGINT) AS recall_ppm",
        "CAST(CASE WHEN cand_total + ref_total > 0 THEN " +
          "(CAST(lcs_total AS DECIMAL(38,0)) * 2000000) div " +
          "(cand_total + ref_total) ELSE -1 END AS BIGINT) AS f1_ppm")

  /** Corpus BLEU-4 (Papineni et al. 2002): geometric mean of the four
    * clipped n-gram precisions times the brevity penalty
    * `BP = min(1, e^(1 − r/c))`.  Composed from [[ngramOverlap]]'s
    * exact integer sums, so the only floating-point is the single
    * final exp/ln composition over one 4-row frame (rounded to 6 dp;
    * each ln argument is a ratio of two exact integers, identical in
    * any engine).  BLEU is 0 when any order has zero matches — the
    * standard uncomforted definition.
    *
    * @return one row: (c_len, r_len, m1..m4, t1..t4, bleu)
    */
  def corpusBleu(pairs: DataFrame, idCol: String, candToksCol: String,
      refToksCol: String): DataFrame = {
    val per = ngramOverlap(pairs, idCol, candToksCol, refToksCol, maxN = 4)
    def at(n: Int, c: String) = max(when(col("n") === n, col(c)))
    per.agg(
        at(1, "cand_total").as("c_len"), at(1, "ref_total").as("r_len"),
        at(1, "matched").as("m1"), at(2, "matched").as("m2"),
        at(3, "matched").as("m3"), at(4, "matched").as("m4"),
        at(1, "cand_total").as("t1"), at(2, "cand_total").as("t2"),
        at(3, "cand_total").as("t3"), at(4, "cand_total").as("t4"))
      .selectExpr("c_len", "r_len", "m1", "m2", "m3", "m4",
        "t1", "t2", "t3", "t4",
        "CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN " +
          "round(least(CAST(1.0 AS DOUBLE), " +
          "exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))) * " +
          "exp((ln(CAST(m1 AS DOUBLE) / t1) + ln(CAST(m2 AS DOUBLE) / t2)" +
          " + ln(CAST(m3 AS DOUBLE) / t3) + ln(CAST(m4 AS DOUBLE) / t4))" +
          " / 4.0), 6) ELSE CAST(0.0 AS DOUBLE) END AS bleu")
  }
}
