package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, evaluated in ONE pass.
  *
  * Each constraint compiles to a conditional aggregate over the same
  * scan; `run` folds the whole suite into a single `agg(...)` so a
  * 100 TB validation costs exactly one read + one partial-aggregation
  * tree regardless of how many constraints are attached (the deequ
  * architecture, reduced to its Spark-native core).  Results come back
  * as one row per constraint with the measured metric and pass flag —
  * join-free, collect-free, and exactly reproducible (all metrics are
  * count ratios of exact longs).
  */
object Checks {

  /** One constraint: name + metric expression (a ratio in [0,1] built
    * from conditional counts) + predicate on the metric.
    */
  case class Check(name: String, metric: Column, passes: Column => Column)

  /** metric: fraction of rows where `c` is non-null. */
  def completeness(c: String): Check =
    Check(s"completeness($c)",
      sum(when(col(c).isNotNull, 1L).otherwise(0L)) / count(lit(1L)),
      m => m === 1.0)

  /** metric: distinct count of the key == row count (exact uniqueness).
    * Ratio of two exact longs, so 1.0 is attainable exactly.
    */
  def uniqueness(cols: Seq[String]): Check =
    Check(s"uniqueness(${cols.mkString(",")})",
      count_distinct(struct(cols.map(col): _*)) / count(lit(1L)),
      m => m === 1.0)

  /** metric: fraction of rows whose value is in the accepted set. */
  def acceptedValues(c: String, values: Seq[String]): Check =
    Check(s"accepted($c)",
      sum(when(col(c).isin(values: _*), 1L).otherwise(0L)) / count(lit(1L)),
      m => m === 1.0)

  /** metric: fraction of rows inside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double, minFraction: Double = 1.0): Check =
    Check(s"range($c)",
      sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L)) / count(lit(1L)),
      m => m >= minFraction)

  /** metric: fraction of non-negative values. */
  def nonNegative(c: String): Check = inRange(c, 0.0, Double.MaxValue)

  /** Evaluate the suite in one aggregation pass; returns
    * (check, metric, passed) rows ordered by check name.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    // pass/fail is decided on the EXACT metric; the rounded twin exists
    // only for display/oracle parity — rounding before the predicate
    // would let a one-in-2M violation round 0.9999999 up to a "passing"
    // 1.0, which defeats strict ==1.0 checks at scale
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.metric.as(s"__raw_$i"), round(c.metric, 6).as(c.name))
    }
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single metrics row into (check, metric, passed)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(c.name).as("metric"),
        c.passes(col(s"__raw_$i")).as("passed"))
    }
    oneRow.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.passed"))
      .orderBy(col("check"))
  }

  /** Robust per-group outlier profile: median / MAD (median absolute
    * deviation) per key, and the count of rows whose absolute deviation
    * exceeds `cutoff × MAD` (cutoff ≈ 4.4478 is the classic 3σ under
    * normality, 3 × 1.4826).  Unlike mean/stddev screens, a batch of
    * corrupt values cannot drag the threshold toward itself.
    *
    * Scale design: two grouped exact-percentile aggregations plus
    * equi-joins of the group-stats tables back onto the fact scan —
    * the stats tables are GROUP-cardinality-sized (unbounded for a
    * high-cardinality key), so they carry no broadcast hint; the fact
    * side is already shuffled on the key and AQE broadcasts a stats
    * side that measures small.  Exact interpolating
    * percentile keeps the result deterministic (a sampled or sketched
    * quantile would not be).
    *
    * @return (keyCol, n, n_outliers, med, mad) — med/mad rounded to 6
    *         for display; the outlier predicate uses the exact values
    */
  /** Deterministic Poisson-bootstrap confidence interval for the mean
    * of a money column — the error bar every drift/quality metric
    * should ship with.  The classic index-resample bootstrap needs a
    * global row numbering plus B index joins; the Poisson bootstrap
    * (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google 2012) instead gives every row an independent
    * Poisson(1) weight per resample, so the whole thing is ONE pass:
    * explode ×B, weight, and a map-side-combined (resample → sum,
    * count) aggregation shuffling exactly B rows.
    *
    * Determinism: the Poisson draw inverts an integer hash u ∈ [0,2³¹)
    * (two LCG mixing rounds over id and resample index — products stay
    * < 2⁴⁷, overflow-safe under ANSI) against hard-coded integer CDF
    * thresholds `round(2³¹·P(X≤k))`, truncated at weight 5 (tail mass
    * 0.37%).  Resample sums/counts are exact integers; the only
    * floating step is each resample's IEEE sum/count ratio — identical
    * on any engine — which orders the B-row frame for the quantile
    * pick at ranks ⌈loP·B⌉ / ⌈hiP·B⌉.
    *
    * Scale shape: explode ×B then aggregate — no global row numbers,
    * no index join, no window over data-scale frames; the only
    * unpartitioned window ranks the B-row resample frame.
    *
    * @return one row: (n_rows, b_eff, mean, ci_lo, ci_hi) — currency
    *         units rounded to 6 dp
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      b: Int, seed: Long, loP: Double = 0.025,
      hiP: Double = 0.975): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(b >= 2 && b <= 10000, s"resample count out of range: $b")
    require(seed >= 0 && loP > 0 && hiP < 1 && loP < hiP)
    val rLo = math.ceil(loP * b).toLong
    val rHi = math.ceil(hiP * b).toLong
    val cents = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as("__i"),
        round(col(valueCol) * 100).cast("long").as("__c"))
    val res = cents
      .select(col("__i"), col("__c"),
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
      .agg(sum(col("__w") * col("__c")).as("__s"),
        sum(col("__w")).as("__n"))
      .filter(col("__n") > 0)
    val ranked = res
      .select(col("__j"),
        (col("__s").cast("double") / col("__n").cast("double")).as("__mv"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__mv"), col("__j"))))
    val ci = ranked.agg(count(lit(1)).as("b_eff"),
      max(when(col("__r") === rLo, col("__mv"))).as("__lo"),
      max(when(col("__r") === rHi, col("__mv"))).as("__hi"))
    cents.agg(count(lit(1)).as("n_rows"),
        sum(col("__c")).as("__ts"))
      .crossJoin(ci)
      .select(col("n_rows"), col("b_eff"),
        round(col("__ts").cast("double") / 100d / col("n_rows"), 6)
          .as("mean"),
        round(col("__lo") / 100d, 6).as("ci_lo"),
        round(col("__hi") / 100d, 6).as("ci_hi"))
  }

  /** Order-invariant dataset fingerprint — the integrity stamp two
    * pipelines compare to prove they produced the SAME dataset without
    * shipping it: per row an engine-agnostic base-31 polynomial hash
    * of the '|'-joined column strings (NULL → a sentinel), combined by
    * the commutative (count, sum mod 2⁶¹, xor) triple so partitioning
    * and row order cannot change the stamp.  Any single-row difference
    * flips sum and xor with overwhelming probability; a full
    * row-by-row diff (see [[TableDiff]]) is the follow-up when stamps
    * disagree.
    *
    * Contract: canonicalize columns to strings/integers first (float
    * formatting differs across engines — money goes through cents).
    * One scan, one scalar aggregation; the sum runs in DECIMAL(38,0)
    * so 10¹² rows of 2³¹-bounded hashes cannot overflow before the
    * modulus.
    */
  def datasetFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val joined = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000NULL"))): _*)
    df.withColumn("__s", joined)
      .withColumn("__h", aggregate(sequence(lit(1), length(col("__s"))),
        lit(0L), (acc, j) =>
          (acc * 31 + ascii(col("__s").substr(j, lit(1))))
            % lit(2147483648L)))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("__h").cast("decimal(38,0)")),
          lit(2305843009213693952L).cast("decimal(38,0)"))
          .cast("long").as("hash_sum"),
        expr("bit_xor(__h)").as("hash_xor"))
  }

  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      cutoff: Double = 4.4478): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("__med"))
    val dev = df.join(med, Seq(keyCol))
      .withColumn("__ad", abs(col(valCol) - col("__med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(__ad, 0.5)").as("__mad"))
    dev.join(mad, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(cutoff) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        round(first(col("__med")), 6).as("med"),
        round(first(col("__mad")), 6).as("mad"))
  }
}
