package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the summary a pipeline snapshots before
  * and after every transformation (and feeds to [[Drift]] / [[Checks]]
  * thresholds).  Like [[Checks]], the whole profile folds into a
  * single aggregation over one scan: per column it measures null
  * count, exact distinct count, and min/max (numeric columns keep
  * DOUBLE metrics, string columns keep STRING bounds — no lossy
  * cross-type formatting).  Output is one row per column.
  */
object Profile {

  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty, "no columns to profile")
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")
    def dist(c: String) = count_distinct(col(c)).as(s"__nd_$c")
    val aggs =
      numCols.flatMap(c => Seq(nulls(c), dist(c),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))) ++
      strCols.flatMap(c => Seq(nulls(c), dist(c),
        min(col(c)).as(s"__sn_$c"), max(col(c)).as(s"__sx_$c")))
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numCols.map { c =>
        struct(lit(c).as("column"),
          col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      } ++ strCols.map { c =>
        struct(lit(c).as("column"),
          col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col(s"__sn_$c").as("min_str"), col(s"__sx_$c").as("max_str"))
      }
    oneRow.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.n_null"), col("r.n_distinct"),
        col("r.min_num"), col("r.max_num"), col("r.min_str"), col("r.max_str"))
      .orderBy(col("column"))
  }

  /** Rank-based quality-signal fusion: each integer signal is mapped
    * to its 1..`buckets` quantile bucket by CUMULATIVE-COUNT
    * arithmetic — `1 + ⌊(#rows below value)·buckets / n⌋` — and the
    * fused score is the bucket sum.  Rank fusion (RRF's cousin) is how
    * heterogeneous quality signals combine without calibrating scales;
    * the all-integer definition makes every bucket edge engine- and
    * partitioning-exact, where interpolated quantile EDGES would shift
    * by an ulp between engines and flip boundary rows.
    *
    * Contract: signals must be non-null — a NULL cannot be ranked, so
    * rows carrying one are excluded by an EXPLICIT filter up front
    * (never silently by a join miss), and bucket edges are computed on
    * exactly the surviving rows.
    *
    * Scale shape: ONE melted aggregation builds every signal's
    * distinct-value frame in a single pass over the data (no separate
    * count action); the cumulative window runs per signal over THAT
    * frame — bounded by value cardinality, tiny for integer quality
    * signals — and each bucket map equi-joins back on the value (AQE
    * broadcasts them).  No window or extra pass ever touches the row
    * frame.  Ties share a bucket by construction.
    */
  def decileFusion(df: DataFrame, idCol: String, signals: Seq[String],
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(signals.nonEmpty && buckets >= 2)
    val clean = df.filter(signals.map(col(_).isNotNull).reduce(_ && _))
    val melted = clean.select(explode(array(signals.map(c =>
        struct(lit(c).as("__sig"), col(c).cast("long").as("__v"))): _*))
      .as("r")).select(col("r.__sig").as("__sig"), col("r.__v").as("__v"))
    val maps = melted.groupBy(col("__sig"), col("__v"))
      .agg(count(lit(1)).as("__m"))
      .withColumn("__below", coalesce(sum(col("__m")).over(
        Window.partitionBy(col("__sig")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__m")).over(
        Window.partitionBy(col("__sig"))))
      .select(col("__sig"), col("__v"),
        expr(s"CAST(1 + __below * $buckets div __n AS BIGINT)").as("__b"))
    val withBuckets = signals.foldLeft(clean) { case (acc, c) =>
      acc.join(maps.filter(col("__sig") === c)
          .select(col("__v").as(s"__jv_$c"), col("__b").as(s"b_$c")),
        col(c).cast("long") === col(s"__jv_$c"))
        .drop(s"__jv_$c")
    }
    withBuckets.select(
      col(idCol) +: signals.map(c => col(s"b_$c")) :+
        signals.map(c => col(s"b_$c")).reduce(_ + _).as("fused"): _*)
  }

  /** Per-group quantile normalization: each row's integer score is
    * mapped to its WITHIN-GROUP quantile bucket 1..`buckets` by the
    * same cumulative-count arithmetic as [[decileFusion]] —
    * `1 + ⌊(#group rows below value)·buckets / n_group⌋` — so scores
    * from sources with incomparable scales (one grader's 0–5 vs
    * another's 0–100) land on one calibrated axis before mixing or
    * thresholding.  All-integer edges: engine- and partitioning-exact,
    * ties share a bucket by construction.
    *
    * Contract: rows with a NULL group or value are excluded by an
    * EXPLICIT up-front filter (never silently by a join miss).
    *
    * Scale shape: the bucket map is built on the (group, value)
    * DISTINCT frame — the cumulative window below partitions by group
    * over that frame, so its per-partition row count is bounded by the
    * VALUE DOMAIN (an integer score scale), never by group row count —
    * then equi-joins back on (group, value).  No window touches the
    * row frame.
    *
    * @return the surviving input rows plus a `bucket` column ∈ [1,buckets]
    */
  def groupQuantileNormalize(df: DataFrame, groupCol: String,
      valueCol: String, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val clean = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
    val maps = clean
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__m"))
      .withColumn("__below", coalesce(sum(col("__m")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__m")).over(
        Window.partitionBy(col(groupCol))))
      .select(col(groupCol).as("__g"), col("__v"),
        expr(s"CAST(1 + __below * $buckets div __n AS BIGINT)")
          .as("bucket"))
    clean.join(maps, col(groupCol) === col("__g") &&
        col(valueCol).cast("long") === col("__v"))
      .drop("__g", "__v")
  }

  /** Key-skew diagnosis for a prospective join/aggregation key — the
    * report you read BEFORE deciding between a plain shuffle, a
    * broadcast, AQE skew handling, or [[PipelineOps]] salting.  One
    * pass builds the per-key count table; the summary reports key
    * cardinality, the heaviest key (and which key it is), exact
    * p50/p99 of per-key row counts, and the Gini coefficient of the
    * count distribution in integer micro-units (0 = perfectly uniform,
    * → 1 as one key dominates).
    *
    * Gini is computed from the ascending-rank identity
    * `(2·Σi·cᵢ − (n+1)·Σcᵢ) / (n·Σcᵢ)` — all-integer numerator and
    * denominator, so the only float op is the final division (ties in
    * cᵢ cannot change Σi·cᵢ, so the value is deterministic under any
    * tie order).  No global rank window over the per-key frame: the
    * per-key counts collapse first to one row per DISTINCT count value
    * (with its key multiplicity m), and a group of m keys sharing
    * count c at ranks r+1…r+m contributes `c·(m·r + m(m+1)/2)` to
    * Σi·cᵢ.  Distinct positive counts summing to n_rows number at most
    * `√(2·n_rows)` — the only single-task window below runs over that
    * provably tiny frame (~1.4 M rows even at 10¹² input rows), never
    * over key cardinality.  At extreme scale swap the intermediate
    * products for DECIMAL(38,0) — the shape is unchanged.
    */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("__key"))
      .agg(count(lit(1)).as("__cnt"))
    val byCnt = counts.groupBy(col("__cnt")).agg(count(lit(1)).as("__m"))
    val cum = byCnt.withColumn("__r",
      coalesce(sum(col("__m")).over(Window.orderBy(col("__cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val main = cum.agg(
      sum(col("__m")).cast("long").as("n_keys"),
      sum(col("__cnt") * col("__m")).cast("long").as("n_rows"),
      max(col("__cnt")).cast("long").as("max_key_rows"),
      round(expr("percentile(__cnt, 0.5D, __m)"), 4).as("p50_rows"),
      round(expr("percentile(__cnt, 0.99D, __m)"), 4).as("p99_rows"),
      sum(expr("__cnt * (__m * __r + __m * (__m + 1) div 2)"))
        .cast("long").as("__si"))
    val top = counts.agg(max_by(col("__key").cast("string"),
      struct(col("__cnt"), col("__key"))).as("top_key"))
    main.crossJoin(top).select(
      col("n_keys"), col("n_rows"), col("max_key_rows"), col("top_key"),
      col("p50_rows"), col("p99_rows"),
      round((lit(2) * col("__si") - (col("n_keys") + 1) * col("n_rows"))
          .cast("double") * 1000000d
          / (col("n_keys") * col("n_rows")).cast("double"), 0)
        .cast("long").as("gini_micro"))
  }
}
