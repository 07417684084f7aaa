package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Data-quality constraint suite: one scan no matter how many checks,
  * exact metrics, and failure detection.
  */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("a five-check suite compiles to ONE scan of the input") {
    val li = Tables.load(spark, sf, "lineitem")
    val out = Checks.run(li, Seq(
      Checks.completeness("l_orderkey"),
      Checks.uniqueness(Seq("l_orderkey", "l_linenumber")),
      Checks.acceptedValues("l_returnflag", Seq("A", "N", "R")),
      Checks.inRange("l_discount", 0.0, 0.1, minFraction = 0.5),
      Checks.nonNegative("l_extendedprice")))
    val plan = out.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"the whole suite must share one table scan:\n$plan")
    val rows = out.collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows.size == 5)
    assert(rows("completeness(l_orderkey)"))
    assert(rows("accepted(l_returnflag)"))
    // the synthetic lineitem repeats (orderkey, linenumber) pairs — the
    // check must REPORT that honestly rather than pass
    assert(!rows("uniqueness(l_orderkey,l_linenumber)"))
    val uniq = Checks.run(Tables.load(spark, sf, "orders"),
      Seq(Checks.uniqueness(Seq("o_orderkey")))).head()
    assert(uniq.getDouble(1) == 1.0 && uniq.getBoolean(2),
      "o_orderkey is the primary key and must measure exactly 1.0")
  }

  test("violations are detected with the measured metric") {
    val df = Seq(
      (Some(1), "A"), (Some(2), "A"), (None, "B"), (Some(2), "X"))
      .toDF("k", "flag")
    val out = Checks.run(df, Seq(
      Checks.completeness("k"),
      Checks.uniqueness(Seq("k")),
      Checks.acceptedValues("flag", Seq("A", "B"))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      .toList
    val byName = out.map(t => t._1 -> t).toMap
    assert(byName("completeness(k)")._2 == 0.75 && !byName("completeness(k)")._3)
    // 3 distinct key values (1, 2, null) over 4 rows
    assert(byName("uniqueness(k)")._2 == 0.75 && !byName("uniqueness(k)")._3)
    assert(byName("accepted(flag)")._2 == 0.75 && !byName("accepted(flag)")._3)
  }

  test("sub-rounding violations still fail: pass is decided pre-rounding") {
    // one null in 4M rows: fraction 0.99999975 rounds to 1.0 at 6
    // decimals — the displayed metric may read 1.0 but the strict ==1.0
    // check must FAIL because it sees the exact ratio
    val df = spark.range(4000000)
      .select(when(col("id") === 0, lit(null)).otherwise(col("id")).as("v"))
    val row = Checks.run(df, Seq(Checks.completeness("v"))).head()
    assert(row.getDouble(1) == 1.0, "rounded display metric reads 1.0")
    assert(!row.getBoolean(2), "but the exact check must still fail")
  }

  test("madOutliers: hand-computed median/MAD, robust to the outlier itself") {
    import spark.implicits._
    // group a: 1..9 plus a gross outlier — median 5.5, deviations
    // sorted (.5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5) => MAD 2.5;
    // only 1000 exceeds 4.4478*2.5 ≈ 11.12.  group b: constant => MAD 0
    val rows = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0)) ++
      Seq(("b", 7.0), ("b", 7.0), ("b", 7.0))
    val out = Checks.madOutliers(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") == ((10L, 1L, 5.5, 2.5)), s"got $out")
    // a mean/stddev screen would be dragged by the 1000; MAD is not —
    // and a zero-MAD constant group flags nothing (strict >)
    assert(out("b") == ((3L, 0L, 7.0, 0.0)), s"got $out")
  }

  test("skew report: closed-form Gini, heaviest key, exact percentiles") {
    import spark.implicits._
    // counts per key: a=1, b=1, c=2, d=4 (sorted 1,1,2,4)
    // Σi·cᵢ = 1+2+6+16 = 25; gini = (2·25 − 5·8)/(4·8) = 10/32 = 0.3125
    val rows = Seq.fill(1)("a") ++ Seq.fill(1)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(4)("d")
    val out = Profile.skewReport(rows.toDF("k"), "k").head()
    assert(out.getLong(0) == 4L && out.getLong(1) == 8L)      // n_keys, n_rows
    assert(out.getLong(2) == 4L && out.getString(3) == "d")   // max, top_key
    assert(out.getDouble(4) == 1.5)                           // p50 of 1,1,2,4
    assert(math.abs(out.getDouble(5) - 3.94) < 1e-9)          // p99 interp
    assert(out.getLong(6) == 312500L, s"gini ${out.getLong(6)}")
  }

  test("skew report: uniform keys give Gini 0") {
    import spark.implicits._
    val rows = (0 until 40).map(i => s"k${i % 8}")
    val out = Profile.skewReport(rows.toDF("k"), "k").head()
    assert(out.getLong(6) == 0L, s"uniform must be zero, got ${out.getLong(6)}")
    assert(out.getLong(2) == 5L)
  }

  test("decileFusion: integer rank buckets, ties share, fused = sum") {
    // 10 rows, values 1..10 on s1 -> bucket i for value i (n=10, b=10);
    // s2 constant -> everyone bucket 1; fused = b1 + 1
    val df = (1 to 10).map(i => (i.toLong, i.toLong, 5L))
      .toDF("id", "s1", "s2")
    val out = Profile.decileFusion(df, "id", Seq("s1", "s2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1 to 10).foreach { i =>
      assert(out(i.toLong) == ((i.toLong, 1L, i.toLong + 1)),
        s"row $i: ${out(i.toLong)}")
    }
    // ties: four equal values in n=4 all land in bucket 1
    val ties = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)).toDF("id", "s")
    val tb = Profile.decileFusion(ties, "id", Seq("s"))
      .collect().map(_.getLong(1)).toSet
    assert(tb == Set(1L), s"equal values must share the lowest bucket: $tb")
  }

  test("groupQuantileNormalize: per-group edges, incomparable scales " +
      "land on one axis, nulls excluded") {
    // group A scores 1..4 (n=4, b=4 -> buckets 1..4); group B scores
    // 10,20,30,40 — SAME buckets despite the 10x scale; a null-score
    // row and a null-group row vanish by the explicit filter.
    val df = (Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
        (4L, "A", 4L), (5L, "B", 10L), (6L, "B", 20L), (7L, "B", 30L),
        (8L, "B", 40L))
        .map { case (i, g, v) => (i, g, java.lang.Long.valueOf(v)) } ++
      Seq((9L, "A", null.asInstanceOf[java.lang.Long]),
        (10L, null.asInstanceOf[String], java.lang.Long.valueOf(5L))))
      .toDF("id", "g", "v")
    val out = Profile.groupQuantileNormalize(df, "g", "v", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 1L, 6L -> 2L, 7L -> 3L, 8L -> 4L))
  }

  test("histogram/psi exclude NULL values from bins AND totals — " +
      "null-bearing feed equals the same feed with nulls dropped") {
    val edges = Seq(10.0, 20.0)
    def df(vs: java.lang.Long*) = vs.map(Tuple1(_)).toDF("v")
    val aNull = df(1L, 15L, 25L, null, null)
    val aClean = df(1L, 15L, 25L)
    val bSide = df(5L, 15L, 15L, 30L)
    // nulls never land in the +inf bin and never inflate the total
    val h = Drift.histogram(aNull, "v", edges).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h === Map(0 -> 1L, 1 -> 1L, 2 -> 1L))
    val withNulls = Drift.psi(aNull, bSide, "v", edges).collect().toSeq
    val without = Drift.psi(aClean, bSide, "v", edges).collect().toSeq
    assert(withNulls.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))) ===
      without.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))))
  }

  test("psiFromHistograms == psi over the raw frames (incl. empty bins)") {
    val edges = Seq(10.0, 20.0, 30.0)
    val a = Seq(1L, 5L, 15L, 25L, 25L, 40L).toDF("v")
    val b = Seq(2L, 15L, 15L, 15L, 35L, 50L, 60L).toDF("v")
    val raw = Drift.psi(a, b, "v", edges).collect().toSeq
    val viaHist = Drift.psiFromHistograms(
      Drift.histogram(a, "v", edges).withColumnRenamed("n", "n_a"),
      Drift.histogram(b, "v", edges).withColumnRenamed("n", "n_b"))
      .collect().toSeq
    assert(raw.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))) ===
      viaHist.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))))
  }

  test("embedDrift: hand-computed per-dimension mean shift and " +
      "population variances") {
    // side a: (1,0) and (3,0) -> dim0 mean 2 var 1, dim1 mean 0 var 0
    // side b: (2,2) twice     -> dim0 mean 2 var 0, dim1 mean 2 var 0
    val a = Seq(Tuple1(Seq(1.0f, 0.0f)), Tuple1(Seq(3.0f, 0.0f)))
      .toDF("embedding")
    val b = Seq(Tuple1(Seq(2.0f, 2.0f)), Tuple1(Seq(2.0f, 2.0f)))
      .toDF("embedding")
    val got = Drift.embedDrift(a, b, "embedding", d = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq((0L, 2L, 2L, 0.0, 1.0, 0.0),
      (1L, 2L, 2L, -2.0, 0.0, 0.0)))
  }

  test("ksStatistic: exact D on hand-built samples; identical -> 0") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").head()
    // F_a jumps to 1 at 4 while F_b is 2/4 there: D = 1/2.
    // cross-mult: max |fa*4 - fb*4| = |4*4 - 2*4| = 8; 8/16 = 0.5
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((4L, 4L, 8L, 0.5)), r)
    val same = Drift.ksStatistic(a, a, "v").head()
    assert(same.getLong(2) == 0L && same.getDouble(3) == 0.0)
  }

  test("rankSumU: closed-form 2U with ties; symmetry identity holds") {
    val a = Seq(1L, 3L, 3L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    // pairs (a,b): 1<2, 1<3 -> 0; 3>2 twice -> 2; 3==3 twice -> 1
    // U = 2 + 2*0.5 = 3 -> 2U = 6
    val r = Drift.rankSumU(a, b, "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 6L)), r)
    // U_a + U_b = n_a * n_b  (doubled: 2Ua + 2Ub = 2*na*nb)
    val r2 = Drift.rankSumU(b, a, "v").head()
    assert(r.getLong(2) + r2.getLong(2) == 2L * 3L * 2L)
  }

  test("benfordProfile: exact first-digit counts incl. sub-1 values") {
    val df = Seq(1.23, 19.99, 0.02, 0.91, 300.0, -4.5, 0.0)
      .toDF("value")
    val out = Drift.benfordProfile(df, "value")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 1.23->1, 19.99->1, 0.02->2, 0.91->9, 300->3, -4.5->4;
    // 0.0 excluded
    assert(out == Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 1L, 9 -> 1L), out)
  }

  test("chiSquared: independent table -> 0; perfect association -> V=1") {
    // perfectly independent 2x2: every cell = 25
    val ind = (for (a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 25) yield (a, b)).toDF("a", "b")
    val ri = Drift.chiSquared(ind, "a", "b").head()
    assert(ri.getLong(0) == 100L && ri.getLong(1) == 1L)
    assert(ri.getDouble(2) == 0.0 && ri.getDouble(3) == 0.0, ri)
    // perfect association: a == b mapping
    val dep = (for (a <- Seq("x", "y"); _ <- 1 to 30)
      yield (a, a.toUpperCase)).toDF("a", "b")
    val rd = Drift.chiSquared(dep, "a", "b").head()
    assert(rd.getDouble(2) == 60.0, s"chi2 = n for a perfect 2x2: $rd")
    assert(rd.getDouble(3) == 1.0, s"Cramer's V must hit 1: $rd")
  }

  test("datasetFingerprint: order/partition-invariant, single-row " +
      "edits flip it, null sentinel distinguishes") {
    val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Checks.datasetFingerprint(d, Seq("id", "v")).head() match {
        case r => (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    val base = fp(df)
    assert(base._1 == 300L)
    // invariant under reordering and repartitioning
    assert(fp(df.orderBy(desc("v"))) == base)
    assert(fp(df.repartition(7)) == base)
    // a single changed row flips the stamp
    val edited = (1 to 300).map(i =>
      (i.toLong, if (i == 117) "vX" else s"v$i")).toDF("id", "v")
    assert(fp(edited) != base)
    // NULL is not the same as its sentinel-ish neighbors
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "v")
    val withEmpty = Seq((1L, "")).toDF("id", "v")
    assert(fp(withNull) != fp(withEmpty))
  }

  test("anonymityReport + suppressBelowK: hand-computed groups, " +
      "k and l violations, suppression keeps exactly the big groups") {
    // groups: (a,x) size 3 / 3 distinct s; (a,y) size 2 / 1 distinct;
    // (b,x) size 1 / 1 distinct
    val df = Seq(
      ("a", "x", 1.0), ("a", "x", 2.0), ("a", "x", 3.0),
      ("a", "y", 5.0), ("a", "y", 5.0),
      ("b", "x", 7.0))
      .toDF("q1", "q2", "s")
    val r = Privacy.anonymityReport(df, Seq("q1", "q2"), "s", k = 2, l = 2)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 1L, 1L, 1L, 2L, 1L)),
      s"report: $r")
    val kept = Privacy.suppressBelowK(df, Seq("q1", "q2"), k = 2)
      .select("q1", "q2").collect().map(x => (x.getString(0), x.getString(1)))
    assert(kept.length == 5 && !kept.contains(("b", "x")),
      s"only the singleton group is suppressed: ${kept.toSeq}")
  }

  test("suppressBelowHalfMax == suppressBelowK at k = max(floor, " +
      "maxGroup div 2), scalar folded in without a driver collect") {
    // max group = 5 → k = max(2, 2) = 2: groups of size 1 drop
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq(("b", "x"))).zipWithIndex
      .map { case ((q1, q2), i) => (q1, q2, i.toDouble) }
      .toDF("q1", "q2", "s")
    val viaScalar = Privacy.suppressBelowK(df, Seq("q1", "q2"), k = 2)
      .select("q1", "q2", "s").collect().toSet
    val folded = Privacy.suppressBelowHalfMax(df, Seq("q1", "q2"))
      .select("q1", "q2", "s").collect().toSet
    assert(folded == viaScalar, s"$folded vs $viaScalar")
    // floor clamps when the max group is tiny (max 2 → div 2 = 1 → 2)
    val tiny = Seq(("a", "x", 1.0), ("a", "x", 2.0), ("b", "y", 3.0))
      .toDF("q1", "q2", "s")
    val keptTiny = Privacy.suppressBelowHalfMax(tiny, Seq("q1", "q2"))
      .select("q1").collect().map(_.getString(0)).toSeq
    assert(keptTiny.sorted == Seq("a", "a"), s"floor k=2: $keptTiny")
    // the fold must not add a driver-side pass: no collect happens at
    // plan time (construction alone runs no job)
    val planned = Privacy.suppressBelowHalfMax(df, Seq("q1", "q2"))
    assert(planned.queryExecution.analyzed != null)
  }

  test("bootstrapMeanCI: brackets the sample mean, deterministic, " +
      "Poisson weight mass near e^-1") {
    val df = (1 to 500).map(i => (i.toLong, (i % 100) / 10.0))
      .toDF("id", "v")
    val r = Checks.bootstrapMeanCI(df, "id", "v", b = 200, seed = 7L)
      .head()
    assert(r.getLong(0) == 500L && r.getLong(1) == 200L, s"counts: $r")
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo < mean && mean < hi,
      s"a 95% CI over 200 resamples must bracket the sample mean: $r")
    assert(hi - lo < 1.0, s"CI of a 500-row mean must be tight-ish: $r")
    // bit-determinism across re-execution
    val again = Checks.bootstrapMeanCI(df, "id", "v", 200, 7L).head()
    assert(again == r, s"resamples must be reproducible: $again vs $r")
    // the hash-inverted weights must put roughly e^-1 of the mass at 0
    // (loose band — this guards the threshold constants and the mixing,
    // not the third decimal)
    val zeros = df.select(col("id"),
        explode(sequence(lit(0), lit(199))).as("j"))
      .select(pmod(pmod(col("id") * 2654435761L + col("j") * 40503L + 7L,
        lit(2147483648L)) * 48271L + col("j"), lit(2147483648L)).as("u"))
      .filter(col("u") < 790015084L).count()
    val frac = zeros.toDouble / (500 * 200)
    assert(frac > 0.33 && frac < 0.41,
      s"P(w=0) should be near e^-1 = 0.368: $frac")
  }
}
