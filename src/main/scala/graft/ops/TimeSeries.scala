package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: aggregate an event stream onto a complete
  * calendar grid and fill the gaps deterministically (last-observation-
  * carried-forward).  The dense grid is `dimensions × days` — generated,
  * not scanned — and the fill is a partitioned running window, so the
  * whole operator is one shuffle on the series key at any scale.
  */
object TimeSeries {

  /** Daily totals per key with gap days filled by carry-forward.
    *
    * Output columns: (keyCol, day, cents, observed) where `cents` is the
    * day's exact integer total if observed, else the most recent
    * observed total (0 before the first observation), and `observed`
    * flags real data points.  Money is summed as integer cents so the
    * fill is bit-exact under any partitioning.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, from: String, to: String): DataFrame = {
    val spark = events.sparkSession
    val daily = events
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        // round, not floor: on a DOUBLE input 8.35*100 is 834.999…, and
        // floor would drop a cent; round recovers the exact cents for
        // any value that IS an exact cent amount
        round(col(valueCol) * 100).cast("long").as("v"))
      .filter(col("day").between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(col(keyCol), col("day"))
      .agg(sum("v").as("day_cents"))
    // dense grid: every key × every day in [from, to] — a generated
    // cross of two tiny inputs, never a scan of the fact table
    val days = spark.range(1).select(
      explode(sequence(lit(from).cast("date"), lit(to).cast("date"))).as("day"))
    val keys = events.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(days))
    val fillWin = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(last(col("day_cents"), ignoreNulls = true).over(fillWin),
          lit(0L)).as("cents"),
        col("day_cents").isNotNull.as("observed"))
  }

  /** Ordered-funnel analysis (the windowFunnel of event analytics): how
    * many users reach each step of `steps` in order, starting from
    * their EARLIEST step-1 event, with every later step inside
    * `windowExpr` (a SQL interval, e.g. "INTERVAL 1 DAY") of that
    * anchor.  The chain is greedy-from-earliest — each level keeps the
    * user's first qualifying event after the previous level — which
    * makes the levels deterministic and exactly mirrorable in SQL (an
    * existential "any chain in any window" needs a per-user sequence
    * scan; the greedy anchor is the standard funnel-report contract).
    *
    * Scale shape: level k is one equi-join on the user key against the
    * step-k slice of the stream plus a partial-aggregated min — k-1
    * shuffles all keyed the same way, no window over the fact table,
    * no per-user arrays.  Output is |steps| rows.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowExpr: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("__u")).agg(min(col(tsCol)).as("__t1"))
      .withColumn("__tk", col("__t1"))
    val levels = steps.tail.scanLeft(s1) { case (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(prev, Seq("__u"))
        .filter(col("__ts") > col("__tk") &&
          col("__ts") <= col("__t1") + expr(windowExpr))
        .groupBy(col("__u"), col("__t1"))
        .agg(min(col("__ts")).as("__tk"))
    }
    levels.zip(steps).zipWithIndex.map { case ((frame, step), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("level"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_.union(_)).orderBy(col("level"))
  }

  /** Row-pattern matching over per-key event sequences (the
    * MATCH_RECOGNIZE workload, compiled to a regex): each key's events
    * collapse — in deterministic (ts, id) order — to a string of
    * single-character event-class symbols, and the pattern (a plain
    * regex over those symbols, e.g. `v[ce]*p` = view, any
    * clicks/errors, purchase) is counted per key with leftmost
    * non-overlapping semantics — identical in Java regex and
    * RE2-family engines for alternation/class/star patterns, which is
    * what keeps it cross-engine checkable.
    *
    * Scale shape: ONE aggregation keyed by the entity — the collected
    * symbol string is events-per-key characters (bounded by the same
    * per-key ceiling any sessionized store enforces; cap upstream for
    * power keys), and the regex runs once per key, not per event.
    *
    * @param classOf maps the type column to a single-char symbol
    *                (default: first character)
    * @return (keyCol, seq_len, n_matches)
    */
  def sequencePatternCounts(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, typeCol: String, pattern: String,
      classOf: Column => Column = c => substring(c, 1, 1)): DataFrame = {
    events.groupBy(col(keyCol))
      .agg(concat_ws("", transform(
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), classOf(col(typeCol)).as("c")))),
        s => s.getField("c"))).as("__seq"))
      .select(col(keyCol), length(col("__seq")).cast("long").as("seq_len"),
        regexp_count(col("__seq"), lit(pattern)).cast("long")
          .as("n_matches"))
  }

  /** Rolling z-score anomaly detection, integer-exact: flag an event
    * whose value deviates from the mean of its key's previous `n`
    * events by more than `z` standard deviations.  Values are taken as
    * exact integer cents, and the test is evaluated in cross-
    * multiplied integer form —
    * `(n·x − S1)² > z²·(n·S2 − S1²)` with S1 = Σcᵢ, S2 = Σcᵢ² over the
    * trailing window — so the flag is bit-identical on every engine
    * and partitioning (no float mean/stddev anywhere).
    *
    * Scale shape: one window partitioned by the series key (parallel
    * across keys), frame = `n` PRECEDING rows — no global ordering, no
    * state beyond the frame.  A key's rows do flow through one task
    * (the nature of a per-entity ordered scan): this is the
    * events-per-entity-bounded contract every sessionized analysis
    * carries — cap or time-slice power keys upstream; the streaming
    * twin ([[graft.streaming.Streaming.rollingAnomalies]]) holds only
    * `n` longs per key and has no such bound.  Events whose key has
    * fewer than `n` prior events are not scored.
    *
    * @return flagged rows only: (keyCol, idCol, cents, dev_sq,
    *         bound) with dev_sq = (n·x − S1)² and
    *         bound = z²·(n·S2 − S1²)
    */
  def rollingAnomalies(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valueCol: String, n: Int, z: Int): DataFrame = {
    require(n >= 2 && z >= 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol)).rowsBetween(-n, -1)
    events
      .withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__s1", sum(col("__c")).over(w))
      .withColumn("__s2", sum(col("__c") * col("__c")).over(w))
      .withColumn("__m", count(lit(1)).over(w))
      .filter(col("__m") === n)
      .withColumn("dev_sq",
        (col("__c") * n - col("__s1")) * (col("__c") * n - col("__s1")))
      .withColumn("bound",
        lit(z.toLong * z) * (col("__s2") * n - col("__s1") * col("__s1")))
      .filter(col("dev_sq") > col("bound"))
      .select(col(keyCol), col(idCol), col("__c").as("cents"),
        col("dev_sq"), col("bound"))
  }

  /** Per-key ordinary-least-squares trend via EXACT integer moments:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = event-time
    * seconds and y = value cents, every moment accumulated in
    * DECIMAL(38,0) — no floating-point accumulation anywhere, so the
    * slope is identical under any partitioning and engine (the
    * float-sum formulation loses digits exactly where OLS is fragile:
    * n·Σx² − (Σx)² is a catastrophic cancellation of ~10²¹-scale
    * terms).  The single final division happens in doubles and rounds
    * to 6 dp.  One map-side-combined aggregation per key.
    *
    * @return (keyCol, n, slope_cps) — slope in cents per second; keys
    *         with a degenerate x spread (all same second) are dropped
    */
  def olsTrend(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val d = "CAST(%s AS DECIMAL(38,0))"
    events.select(col(keyCol),
        col(tsCol).cast("long").as("__x"),
        round(col(valueCol) * 100).cast("long").as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(expr(d.format("__x"))).as("__sx"),
        sum(expr(d.format("__y"))).as("__sy"),
        sum(expr(d.format("__x") + " * " + d.format("__y"))).as("__sxy"),
        sum(expr(d.format("__x") + " * " + d.format("__x"))).as("__sxx"))
      .withColumn("__num", expr("CAST(n AS DECIMAL(38,0)) * __sxy - __sx * __sy"))
      .withColumn("__den", expr("CAST(n AS DECIMAL(38,0)) * __sxx - __sx * __sx"))
      .filter(col("__den") =!= 0)
      .select(col(keyCol), col("n"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("slope_cps"))
  }

  /** Per-key Theil–Sen trend estimation — the robust slope (median of
    * all pairwise slopes) that a single outlier cannot drag the way it
    * drags least squares.  Slopes are value-cents per hour over
    * event-time seconds; equal-time pairs are excluded (undefined
    * slope).
    *
    * Scale shape: the pairwise term is a self-equi-join ON THE KEY —
    * quadratic per key (the estimator's nature), bounded by the same
    * events-per-key ceiling as any sessionized analysis.  The median
    * is NOT Spark's `percentile` aggregate — that funnels every pair
    * of a key into one in-memory buffer (a 10⁴-event key would buffer
    * 5·10⁷ slopes in a single task).  Instead each slope's per-key
    * rank comes from [[PipelineOps.segmentedPrefixSum]] — cumulative
    * work bounded by PARTITION size, spillable, regardless of how many
    * pairs one key owns — and the median is the 1-or-2 middle-ranked
    * rows per key, averaged (bit-identical to Spark's p=0.5
    * interpolation `0.5·v_lo + 0.5·v_hi`).
    *
    * @return (keyCol, n_pairs, slope_cph) — median slope in cents per
    *         hour, rounded to 6 dp
    */
  def theilSen(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val base = events.select(col(keyCol).as("__k"), col(idCol).as("__i"),
      col(tsCol).cast("long").as("__t"),
      round(col(valueCol) * 100).cast("long").as("__c"))
    val a = base.select(col("__k"), col("__i").as("__ia"),
      col("__t").as("__ta"), col("__c").as("__ca"))
    val b = base.select(col("__k"), col("__i").as("__ib"),
      col("__t").as("__tb"), col("__c").as("__cb"))
    val pairs = a.join(b, Seq("__k"))
      .filter(col("__ia") < col("__ib") && col("__ta") =!= col("__tb"))
      .select(col("__k"), col("__ia"), col("__ib"),
        ((col("__cb") - col("__ca")).cast("double") * 3600d /
          (col("__tb") - col("__ta")).cast("double")).as("__s"),
        lit(1L).as("__one"))
    val nk = pairs.groupBy(col("__k")).agg(count(lit(1)).as("n_pairs"))
    // __before = 0-based rank of the slope within its key ((__ia,__ib)
    // breaks slope ties, so the order is unique as the scan requires)
    PipelineOps.segmentedPrefixSum(pairs, Seq("__k"),
        Seq("__s", "__ia", "__ib"), "__one")
      .join(nk, Seq("__k"))
      .filter(expr("__before = (n_pairs - 1) div 2 OR " +
        "__before = n_pairs div 2"))
      .groupBy(col("__k"), col("n_pairs"))
      .agg(round(avg(col("__s")), 6).as("slope_cph"))
      .select(col("__k").as(keyCol), col("n_pairs"), col("slope_cph"))
  }

  /** Last-touch conversion attribution: each conversion event is
    * credited to the user's most recent preceding touch event (its
    * type is the channel; conversions with no prior touch are
    * "direct"), and the report sums conversions and exact decimal
    * value per channel.  Composes [[AsOfJoin.asOf]] — the single-
    * shuffle union-window as-of — so attribution costs one shuffle on
    * the user key plus the channel aggregation, at any scale.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, valueCol: String,
      conversionType: String, touchTypes: Seq[String]): DataFrame = {
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol), col(tsCol),
        col(valueCol).cast("decimal(12,2)").as("__v"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol), col(typeCol).as("channel"))
    AsOfJoin.asOf(conv, touches, userCol, tsCol, Seq("channel"))
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__v")).cast("double").as("total_value"))
      .orderBy(col("channel"))
  }

  /** Weekly cohort-retention matrix: users are grouped by the ISO week
    * of their first event (their cohort), and each cell counts the
    * cohort's users active `week_offset` weeks later.  The classic
    * retention triangle — offset 0 equals cohort size, later offsets
    * decay.
    *
    * Scale shape: first-touch is one partial-aggregated min per user;
    * activity is a (user, week) distinct; the matrix is their equi-join
    * on the user key aggregated to |cohorts|·|weeks| cells.  Nothing
    * windows over the fact table.
    */
  /** CUSUM changepoint per key — where did this series' level shift?
    * The classic offline CUSUM locator: with prefix sums P_t of the
    * integer cents and per-key totals (n, S), the deviation
    * `D_t = n·P_t − t·S` is the (n-scaled) gap between the prefix and
    * the no-change trend line; the changepoint is `argmax_t |D_t|`.
    * All arithmetic is cross-multiplied integers — no float means —
    * so position and score are bit-identical on any engine; the
    * argmax is (|D| DESC, t ASC)-total through the bounded-heap
    * [[graft.plans.TopKPerKey]].
    *
    * Scale contract: the per-key ordered prefix window rides the same
    * events-per-key feed bound as [[rollingAnomalies]]; `n·|P|` must
    * stay below 2⁶³ (ANSI overflow fails loudly, never wraps).  Keys
    * need ≥ 2 events for a changepoint to exist; `t = n`'s D is 0 by
    * construction and never wins over a real shift.
    *
    * @return per key: (keyCol, n, change_t = 1-based position,
    *         change_id = idCol at that position, d_abs = |D| score)
    */
  def cusumChangepoint(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
    val pre = events
      .withColumn("__c", round(col(valueCol) * 100).cast("long"))
      .withColumn("__p",
        sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__t", row_number().over(w))
    val tot = pre.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("__s"))
      .filter(col("n") >= 2L)
    val scored = pre.join(tot, Seq(keyCol))
      .withColumn("__d", col("n") * col("__p") - col("__t") * col("__s"))
      .withColumn("d_abs", abs(col("__d")))
    graft.plans.TopK.perKey(scored, Seq(col(keyCol)),
        Seq(col("d_abs").desc, col("__t").asc), k = 1)
      .select(col(keyCol), col("n"), col("__t").cast("long").as("change_t"),
        col(idCol).as("change_id"), col("d_abs"))
  }

  /** Power-law retention-decay fit over the aggregated cohort curve:
    * `R_w ≈ R_1 · w^s` for week offsets w ≥ 1 — the "is churn
    * shallow or steep" single-number read on [[cohortRetention]]'s
    * triangle (s ≈ −1 halves engaged users every doubling of age; the
    * week-0 row is the denominator, not a fit point).  The curve is
    * aggregated over the FULL observation triangle (later cohorts
    * contribute fewer offsets — the standard aggregate-curve read).
    *
    * Same exactness device as [[CorpusStats.zipfFit]]: exact integer
    * week totals, per-point micro-nat logs, DECIMAL(38,0) OLS
    * moments, one IEEE division chain, 6 dp.
    *
    * @return (n_points, decay_exponent, ln_r1) or empty when fewer
    *         than two offsets have survivors
    */
  def retentionDecayFit(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val curve = cohortRetention(events, userCol, tsCol)
      .groupBy(col("week_offset"))
      .agg(sum(col("n_users")).cast("long").as("__n"))
    val base = curve.filter(col("week_offset") === 0L)
      .select(col("__n").as("__n0"))
    val pts = curve.filter(col("week_offset") >= 1L && col("__n") > 0L)
      .crossJoin(base)
      .select(
        round(log(col("week_offset").cast("double")) * lit(1000000d), 0)
          .cast("long").as("__x"),
        round(log(col("__n").cast("double") / col("__n0").cast("double"))
          * lit(1000000d), 0).cast("long").as("__y"))
    CorpusStats.microNatOlsFit(pts, "decay_exponent", "ln_r1")
  }

  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol).as("__u"))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = events.select(col(userCol).as("__u"),
      to_date(date_trunc("week", col(tsCol))).as("__wk")).distinct()
    active.join(first, Seq("__u"))
      .groupBy(col("cohort_week"),
        expr("CAST(datediff(__wk, cohort_week) div 7 AS BIGINT)")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
