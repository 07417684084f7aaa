package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two snapshots of a corpus —
  * the monitoring step that catches a data feed going bad between
  * training runs.
  *
  * Population Stability Index over FIXED bin edges: each side
  * aggregates to exact per-bin counts (one scan + one partial-agg tree
  * per side, shuffling only #bins rows), the tiny bin tables full-outer
  * join, and the per-bin contribution `(p_a - p_b) * ln(p_a / p_b)`
  * is pure scalar math over exact ratios.  Empty bins clamp to
  * `floorP` (the standard PSI convention) so the logarithm stays
  * finite.  Everything after the two scans is constant-size work —
  * 100 TB drift costs two reads.
  */
object Drift {

  /** Bin label for a value given ascending interior edges: bin i holds
    * values in [edge(i-1), edge(i)), bin 0 is (-inf, edge(0)), the last
    * bin is [edge(last), inf).  Built as a nested CASE so the identical
    * arithmetic is expressible in any SQL engine.
    */
  def binOf(c: Column, edges: Seq[Double]): Column =
    edges.zipWithIndex.foldRight(lit(edges.size)) { case ((e, i), rest) =>
      when(c < e, lit(i)).otherwise(rest)
    }

  /** Exact per-bin counts of `valueCol`, with every bin present (zero
    * counts included) so both sides of a drift compare align by bin.
    * NULL values are excluded — a CASE over a NULL would silently land
    * in the `otherwise` (+inf) bin and skew the tail; [[ksStatistic]] /
    * [[rankSumU]] drop nulls the same way.
    */
  def histogram(df: DataFrame, valueCol: String, edges: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bins = (0 to edges.size).toDF("bin")
    val counts = df.filter(col(valueCol).isNotNull)
      .select(binOf(col(valueCol), edges).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    bins.join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Per-bin PSI contributions between two snapshots.  Returns
    * (bin, n_a, n_b, psi_contrib) with the contribution rounded to 6
    * decimals; the suite-level PSI is the sum of the column.
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
      edges: Seq[Double], floorP: Double = 1e-6): DataFrame = {
    val ha = histogram(a, valueCol, edges).withColumnRenamed("n", "n_a")
    val hb = histogram(b, valueCol, edges).withColumnRenamed("n", "n_b")
    val joined = ha.join(hb, Seq("bin"))
      .crossJoin(a.filter(col(valueCol).isNotNull)
        .agg(count(lit(1)).as("tot_a")))
      .crossJoin(b.filter(col(valueCol).isNotNull)
        .agg(count(lit(1)).as("tot_b")))
    val pa = greatest(col("n_a") / col("tot_a"), lit(floorP))
    val pb = greatest(col("n_b") / col("tot_b"), lit(floorP))
    joined.select(col("bin"), col("n_a"), col("n_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  /** [[psi]] over PRE-AGGREGATED bin counts — the form a live drift
    * monitor needs, where the "b" side arrives as a continuously
    * updated count table (e.g. a streaming `groupBy(bin).count`
    * sink) rather than as raw rows.  `ha`/`hb` are (bin, n_a) /
    * (bin, n_b) frames with every bin present ([[histogram]]'s
    * contract); totals are the bin-count sums, so the output is
    * bit-identical to running [[psi]] over the raw frames.
    */
  def psiFromHistograms(ha: DataFrame, hb: DataFrame,
      floorP: Double = 1e-6): DataFrame = {
    val joined = ha.join(hb, Seq("bin"))
      .crossJoin(ha.agg(sum(col("n_a")).as("tot_a")))
      .crossJoin(hb.agg(sum(col("n_b")).as("tot_b")))
    val pa = greatest(col("n_a") / col("tot_a"), lit(floorP))
    val pb = greatest(col("n_b") / col("tot_b"), lit(floorP))
    joined.select(col("bin"), col("n_a"), col("n_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_contrib"))
      .orderBy(col("bin"))
  }

  /** Embedding-distribution drift between two corpus snapshots — the
    * encoder-skew monitor (a silent encoder upgrade or a shifted
    * domain mix moves per-dimension means/variances long before any
    * scalar metric notices).  Per dimension: exact micro-unit integer
    * first/second moments on each side ([[Whitening.momentsMicro]]'s
    * quantization device), then `mean_shift` via ONE cross-multiplied
    * IEEE division and each population variance via one more — all
    * deterministic on any engine/partitioning, 6 dp.
    *
    * Scale shape: each side is one scan exploding d (dim, v, v²)
    * cells per row into a map-side-combined aggregation — shuffle
    * carries d rows per partition per side; the join is on the
    * d-row dimension tables.  DECIMAL(38,0) headroom: n·Σv² stays
    * below 10³⁸ for n·‖x‖∞² up to ~10²⁶ micro² — petabyte-safe.
    *
    * @return one row per dimension: (dim, n_a, n_b, mean_shift,
    *         var_a, var_b), mean/variance in original vector units
    */
  def embedDrift(a: DataFrame, b: DataFrame, vecCol: String,
      d: Int): DataFrame = {
    require(d >= 1, s"dimension must be >= 1, got $d")
    def diag(df: DataFrame, suf: String): DataFrame = {
      val q = s"CAST(round(CAST(element_at($vecCol, i + 1) AS DOUBLE)" +
        s" * 1000000.0, 0) AS BIGINT)"
      df.select(explode(expr(
          s"""transform(sequence(0, ${d - 1}), i -> named_struct(
             |  'dim', CAST(i AS BIGINT), 'v', $q, 'vv', $q * $q))"""
            .stripMargin)).as("p"))
        .select(col("p.dim").as("dim"), col("p.v").as("v"),
          col("p.vv").as("vv"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as(s"n_$suf"),
          sum(col("v").cast("decimal(38,0)")).as(s"__s_$suf"),
          sum(col("vv").cast("decimal(38,0)")).as(s"__ss_$suf"))
    }
    diag(a, "a").join(diag(b, "b"), Seq("dim"))
      .select(col("dim"), col("n_a"), col("n_b"),
        round((col("__s_a") * col("n_b") - col("__s_b") * col("n_a"))
            .cast("double")
          / (col("n_a").cast("double") * col("n_b") * lit(1000000.0d)), 6)
          .as("mean_shift"),
        round((col("n_a") * col("__ss_a") - col("__s_a") * col("__s_a"))
            .cast("double")
          / (col("n_a").cast("double") * col("n_a") * lit(1.0e12d)), 6)
          .as("var_a"),
        round((col("n_b") * col("__ss_b") - col("__s_b") * col("__s_b"))
            .cast("double")
          / (col("n_b").cast("double") * col("n_b") * lit(1.0e12d)), 6)
          .as("var_b"))
      .orderBy(col("dim"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the
    * distribution-free drift test that needs no bin edges (PSI's blind
    * spot: drift WITHIN a bin).  D = max over values of
    * |F_a(v) − F_b(v)| is evaluated in cross-multiplied integers —
    * `max |cumA·n_b − cumB·n_a|` over the merged distinct-value frame —
    * so the statistic is bit-identical on any engine and partitioning;
    * only the final report ratio divides.
    *
    * Scale shape: each side collapses to per-distinct-value counts
    * (map-side combined), the two count tables full-outer join, and
    * BOTH cumulative counts come from ONE
    * [[PipelineOps.segmentedPrefixSums]] pass over the merged frame —
    * range-partition on the value, per-partition local windows,
    * boundary offsets broadcast back — so cumulative work is bounded
    * by PARTITION size even for a CONTINUOUS column where distinct ≈
    * rows (an unpartitioned ordered window would pin the whole
    * distinct-value frame to one task, exactly the columns a drift
    * test targets).
    *
    * @return one row: (n_a, n_b, d_num, ks) with
    *         ks = d_num / (n_a·n_b) rounded to 6 dp
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(col(valueCol).as("__v")).filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as(out))
    val merged = counts(a, "__ca").join(counts(b, "__cb"), Seq("__v"), "full")
      .na.fill(0L, Seq("__ca", "__cb"))
      // one constant segment: the segmented scan degenerates to the
      // global two-pass prefix sum (globalRowNumber's shape) — __v is
      // unique by the groupBy, so the order is total
      .withColumn("__seg", lit(1))
    val cum = PipelineOps.segmentedPrefixSums(
        merged, Seq("__seg"), Seq("__v"), Seq("__ca", "__cb"))
      .withColumn("__fa", col("__before___ca") + col("__ca"))
      .withColumn("__fb", col("__before___cb") + col("__cb"))
    // totals first (1-row broadcast), then the integer max
    val tot = cum.agg(max(col("__fa")).cast("long").as("__na"),
      max(col("__fb")).cast("long").as("__nb"))
    cum.crossJoin(broadcast(tot))
      .agg(first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"),
        max(abs(col("__fa") * col("__nb") - col("__fb") * col("__na")))
          .cast("long").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("ks"))
  }

  /** EXACT Mann–Whitney rank-sum statistic (two-sample location shift,
    * no normality assumption): U = #{(a,b): a > b} + ½·#{a = b},
    * reported as the integer 2U = Σ_v (2·c_a(v)·F_b(v⁻) + c_a(v)·c_b(v))
    * over the merged distinct-value frame — tie-corrected and
    * bit-identical on any engine (the textbook average-rank form is
    * fractional; doubling it keeps every intermediate integral).
    * Same scale shape as [[ksStatistic]]: two per-value count tables,
    * one full-outer join, and the exclusive cumulative count comes
    * from [[PipelineOps.segmentedPrefixSum]] over a constant segment —
    * partition-bounded cumulative work on continuous columns, never an
    * unpartitioned ordered window.
    *
    * @return one row: (n_a, n_b, u2) with u2 = 2·U; the normalized
    *         effect size is u2 / (2·n_a·n_b)
    */
  def rankSumU(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(col(valueCol).as("__v")).filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as(out))
    val merged = counts(a, "__ca").join(counts(b, "__cb"), Seq("__v"), "full")
      .na.fill(0L, Seq("__ca", "__cb"))
      .withColumn("__seg", lit(1))
    PipelineOps
      .segmentedPrefixSum(merged, Seq("__seg"), Seq("__v"), "__cb")
      .withColumn("__fbb", col("__before"))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"),
        sum(col("__ca") * (col("__fbb") * 2 + col("__cb")))
          .cast("long").as("u2"))
  }

  /** Chi-squared test of association between two categoricals, with
    * Cramér's V effect size.  Observed and marginal counts are exact
    * integers; χ² folds over the CELL table (|catA|·|catB| rows — the
    * only non-integer arithmetic is the per-cell (O·N − R·C)² /
    * (R·C·N) ratio and the tiny final sum, rounded to 4 dp).  One
    * map-side-combined pass builds the cells; the marginals join back
    * on each axis.
    *
    * @return one row: (n, dof, chi2, cramers_v)
    */
  def chiSquared(df: DataFrame, catA: String, catB: String): DataFrame = {
    val cells = df.filter(col(catA).isNotNull && col(catB).isNotNull)
      .groupBy(col(catA).as("__a"), col(catB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val tot = cells.agg(sum(col("__o")).cast("long").as("__n"),
      count_distinct(col("__a")).as("__ka"),
      count_distinct(col("__b")).as("__kb"))
    // the FULL ka×kb contingency grid: zero-observed cells still carry
    // expectation R·C/N and must contribute — the grid cross is the
    // category-marginal frames, |catA|·|catB| rows by definition
    ra.crossJoin(cb)
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("__o"))
      .crossJoin(broadcast(tot))
      // (O·N − R·C)²/(R·C·N) summed over cells == χ²; all factors are
      // exact longs, only the ratio and its tiny sum are doubles
      .agg(first(col("__n")).as("n"),
        ((first(col("__ka")) - 1) * (first(col("__kb")) - 1)).as("dof"),
        round(sum(
          pow(col("__o") * col("__n") - col("__r") * col("__c"), 2)
            / (col("__r") * col("__c")).cast("double")
            / col("__n").cast("double")), 4).as("chi2"),
        round(sqrt(sum(
          pow(col("__o") * col("__n") - col("__r") * col("__c"), 2)
            / (col("__r") * col("__c")).cast("double")
            / col("__n").cast("double"))
          / (first(col("__n")) * least(first(col("__ka")) - 1,
            first(col("__kb")) - 1)).cast("double")), 4).as("cramers_v"))
  }

  /** Benford first-significant-digit profile — the forensic
    * data-quality screen (fabricated or truncated numeric feeds break
    * the log-uniform leading-digit law).  Exact per-digit counts plus
    * the expected Benford share in parts-per-million (integer, from
    * log10(1+1/d) — a constant table, not data math).  One map-side-
    * combined aggregation over a narrow projection.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    // first significant digit of a 2-decimal money value == first
    // digit of its positive integer cents — extracted from the decimal
    // string, which every engine renders identically for integers
    // (float log10/pow extraction is ulp-fragile at exact powers of 10)
    val cents = round(abs(col(valueCol)) * 100).cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(cents.as("__c")).filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("benford_ppm",
        expr("CAST(round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)"))
      .orderBy(col("digit"))
  }
}
