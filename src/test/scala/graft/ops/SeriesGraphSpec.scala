package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-semantics tests for [[TimeSeries.gapFillDaily]] and
  * [[GraphOps.pageRank]] on crafted inputs with hand-computed answers.
  */
class SeriesGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: String): Timestamp = Timestamp.valueOf(s"$day 12:00:00")

  test("gapFillDaily carries the last observation forward, 0 before first") {
    val ev = Seq(
      (1L, ts("2024-01-02"), 1.50),   // day 2: 150 cents
      (1L, ts("2024-01-02"), 2.00),   //        +200 = 350
      (1L, ts("2024-01-04"), 5.00))   // day 4: 500
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillDaily(ev, "k", "ts", "v",
        "2024-01-01", "2024-01-05")
      .orderBy("day").collect()
    val cents = out.map(_.getLong(2)).toSeq
    val observed = out.map(_.getBoolean(3)).toSeq
    assert(cents == Seq(0L, 350L, 350L, 500L, 500L), s"got $cents")
    assert(observed == Seq(false, true, false, true, false))
  }

  test("gapFillDaily recovers exact cents from doubles (8.35 → 835)") {
    // 8.35 * 100 = 834.999… in binary; floor would lose a cent
    val ev = Seq((1L, ts("2024-01-01"), 8.35), (1L, ts("2024-01-01"), 0.07))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillDaily(ev, "k", "ts", "v",
        "2024-01-01", "2024-01-01").collect()
    assert(out.head.getLong(2) == 842L, s"got ${out.head.getLong(2)}")
  }

  test("gapFillDaily fills independently per key") {
    val ev = Seq(
      (1L, ts("2024-01-01"), 1.00),
      (2L, ts("2024-01-03"), 9.00))
      .toDF("k", "ts", "v")
    val out = TimeSeries.gapFillDaily(ev, "k", "ts", "v",
        "2024-01-01", "2024-01-03")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(out((1L, "2024-01-03")) == 100L) // key 1 carries its own value
    assert(out((2L, "2024-01-01")) == 0L)   // key 2 has nothing yet
    assert(out((2L, "2024-01-03")) == 900L)
  }

  test("pageRank: two-node cycle stays symmetric; star center accumulates") {
    // cycle a<->b: ranks stay equal by symmetry
    val cycle = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val cr = GraphOps.pageRank(cycle, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cr(1L) == cr(2L), s"cycle must stay symmetric: $cr")

    // star 1,2,3 -> 4 (center), center dangles: center must outrank leaves
    val star = Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val sr = GraphOps.pageRank(star, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sr(4L) > sr(1L), s"center must accumulate rank: $sr")
    // leaves receive nothing: exactly the damping base after iteration 1+
    assert(sr(1L) == 150000L && sr(2L) == 150000L && sr(3L) == 150000L)
    // center after i1: 150000 + floor(3e6 * 85/100) = 2700000; leaves at
    // 150000 from i1 on, so i2: 150000 + floor(3*150000*85/100) = 532500;
    // i3 repeats i2's input → fixed point
    assert(sr(4L) == 532500L, s"hand-computed center rank: $sr")
  }

  test("pageRank splits contribution by edge weight") {
    // node 1 sends 3/4 of its rank to 2, 1/4 to 3
    val g = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = GraphOps.pageRank(g, 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) == 150000L + math.floorDiv(750000L * 85L, 100L))
    assert(r(3L) == 150000L + math.floorDiv(250000L * 85L, 100L))
  }

  test("pageRank is partitioning-invariant (integer arithmetic)") {
    val g = (1L to 20L).flatMap(i => Seq((i, (i % 20) + 1, 1L + i % 3)))
      .toDF("src", "dst", "w")
    val a = GraphOps.pageRank(g.repartition(1), 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = GraphOps.pageRank(g.repartition(7), 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  // K4 (complete on 1-4) with a pendant chain 4-5-6-7 hanging off it
  private def k4chain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 7L))
    .toDF("src", "dst")

  test("kCore peels the chain iteratively (re-exposed pendants) leaving K4") {
    // k=2: 7 is degree-1 -> removed; that EXPOSES 6 as degree-1, then
    // 5 — three dependent peel rounds; the 2-core is exactly K4
    val core = GraphOps.kCore(k4chain, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core")
  }

  test("kCore above the max degree empties; budget exhaustion throws") {
    assert(GraphOps.kCore(k4chain, k = 4).isEmpty,
      "no vertex survives k above the graph's core number")
    val e = intercept[IllegalStateException] {
      GraphOps.kCore(k4chain, k = 2, maxIter = 1)
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
  }

  test("relative fixed-round peel == fixpoint core once converged") {
    // maxDeg = 3 -> k = max(2, 3*2/3) = 2; the chain needs 3 peels, so
    // rounds = 5 is past the fixpoint and extra rounds must be no-ops
    val fixed = GraphOps.kCorePeelRelative(k4chain, num = 2, den = 3, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fix = GraphOps.kCore(k4chain, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == fix, s"fixed $fixed vs fixpoint $fix")
  }

  test("funnel: greedy-from-earliest chain, window from the anchor") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 completes view->click->purchase inside 1 day
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 11:00:00")),
      (1L, "purchase", t("2024-01-01 12:00:00")),
      // user 2: click BEFORE the first view never counts; none after
      (2L, "click", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      // user 3: click arrives outside the 1-day window of first view
      (3L, "view", t("2024-01-01 10:00:00")),
      (3L, "click", t("2024-01-02 11:00:00")),
      // user 4: never views; purchase alone reaches no level
      (4L, "purchase", t("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = TimeSeries.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (("view", 3L)), s"level1 $out")     // users 1,2,3
    assert(out(2L) == (("click", 1L)), s"level2 $out")    // only user 1
    assert(out(3L) == (("purchase", 1L)), s"level3 $out")
  }

  test("funnel steps must stay strictly ordered within a user") {
    def t(s: String) = Timestamp.valueOf(s)
    // purchase BETWEEN view and click: chain needs purchase AFTER click
    val ev = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "purchase", t("2024-01-01 10:30:00")),
      (1L, "click", t("2024-01-01 11:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = TimeSeries.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 0L,
      s"out-of-order purchase must not complete the funnel: $out")
  }

  test("cohortRetention: offset-0 equals cohort size; decay is exact") {
    def t(s: String) = Timestamp.valueOf(s)
    // two users first seen in week of Mon 2024-01-01; one returns the
    // following week; a third user starts in week 2
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00")), (2L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-09 10:00:00")),
      (3L, t("2024-01-10 10:00:00")))
      .toDF("user_id", "ts")
    val out = TimeSeries.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-08", 0L) -> 1L), out)
  }

  test("sequencePatternCounts: ordered symbols, non-overlapping matches") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val ev = Seq(
      // user 1 sequence in time order: v c c p v p e  -> 'vccpvpe'
      (1L, 1L, t(1), "view"), (1L, 2L, t(2), "click"),
      (1L, 3L, t(3), "click"), (1L, 4L, t(4), "purchase"),
      (1L, 5L, t(5), "view"), (1L, 6L, t(6), "purchase"),
      (1L, 7L, t(7), "error"),
      // user 2: p v  -> purchase BEFORE view never matches
      (2L, 8L, t(1), "purchase"), (2L, 9L, t(2), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = TimeSeries.sequencePatternCounts(ev, "user_id", "ts",
        "event_id", "event_type", "v[ce]*p")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((7L, 2L)), s"vccp + vp = 2 matches: ${out(1L)}")
    assert(out(2L) == ((2L, 0L)), s"order matters: ${out(2L)}")
  }

  test("deterministicWalks: hash-driven steps match a local twin") {
    // symmetric triangle with asymmetric weights
    val base = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L))
    val edges = (base ++ base.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val got = GraphOps.deterministicWalks(edges, walksPerNode = 2,
        steps = 3, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // local twin with identical integer arithmetic
    val adj = (base ++ base.map(e => (e._2, e._1, e._3)))
      .groupBy(_._1).map { case (s, es) =>
        val sorted = es.sortBy(_._2)
        val cum = sorted.scanLeft(0L)(_ + _._3)
        s -> ((sorted, cum))
      }
    val local = (for (n <- Seq(1L, 2L, 3L); j <- 0 to 1) yield {
      val wid = n * 2 + j
      var cur = n
      val path = new StringBuilder(cur.toString)
      for (s <- 1 to 3) {
        val (sorted, cum) = adj(cur)
        val u = (wid * 2654435761L + s * 40503L + 5L) % cum.last
        val idx = cum.indexWhere(_ > u) - 1
        cur = sorted(idx)._2
        path.append("->").append(cur)
      }
      wid -> path.toString
    }).toMap
    assert(got == local, s"got $got want $local")
    // determinism across re-execution
    val again = GraphOps.deterministicWalks(edges, 2, 3, 5L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("deterministicWalks: steps join on (node, bin) — never the full " +
      "out-edge fan of the current node") {
    // a 512-out-degree hub (node 1) wired symmetrically: the old shape
    // expanded every walk resting on the hub by 512 candidate rows per
    // step; the binned index bounds that at O(1) expected
    val base = (1 to 512).map(i => (1L, 1000L + i, 1L + i % 3))
    val edges = (base ++ base.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w")
    val (frontier, binsIdx) = GraphOps.walkFrontier(edges,
      walksPerNode = 1, steps = 3, seed = 11L)
    try {
      // every frontier-step join (the ones keyed by the walk's current
      // node __s) must also carry the draw's bin key __b — string-match
      // the plan because AQE hides join nodes from collect()
      val stepJoins = frontier.queryExecution.executedPlan.toString
        .split('\n').filter(l => l.contains("Join") && l.contains("__s#"))
      assert(stepJoins.nonEmpty, "no frontier-step join found in the plan")
      assert(stepJoins.forall(l => l.contains("__b#") || l.contains("__ub#")),
        s"a step join lacks the bin key:\n${stepJoins.mkString("\n")}")
      // and the walks themselves still terminate with full-length paths
      val rows = frontier.select("walk_id", "path").collect()
      assert(rows.length == 513, s"one walk per node: ${rows.length}")
      assert(rows.forall(_.getString(1).count(_ == '>') == 3))
    } finally binsIdx.unpersist(false)
  }

  test("retentionDecayFit: halving retention per doubling of age " +
      "fits exponent -1 and ln_r1 = -ln 2") {
    // One cohort (all first seen Mon 2024-01-01 week): 8 users at
    // w=0, 4 at w=1, 2 at w=2, 1 at w=4 — R_w = (1/2)^log2(w)/... a
    // perfect R_w = 0.5 * w^-1 curve at the sampled offsets.
    def at(day: Int) = Timestamp.valueOf(f"2024-01-${1 + day}%02d 12:00:00")
    val ev = (1L to 8L).map(u => (u, at(0))) ++
      (1L to 4L).map(u => (u, at(7))) ++
      (1L to 2L).map(u => (u, at(14))) ++ Seq((1L, at(28)))
    val got = TimeSeries.retentionDecayFit(
      ev.toDF("user_id", "ts"), "user_id", "ts").head()
    assert(got.getLong(0) === 3L)
    assert(math.abs(got.getDouble(1) + 1.0) < 1e-4, got)
    assert(math.abs(got.getDouble(2) + math.log(2.0)) < 1e-4, got)
  }

  test("cusumChangepoint: level shift located at the last pre-shift " +
      "point; singletons dropped; flat series scores 0") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00")
    // [1,1,1,5,5]: S=1300 cents, D_t = 5*P_t - t*1300 =
    // [-800,-1600,-2400,-1200,0] -> argmax |D| at t=3, score 2400.
    val ev = Seq(
      (1L, 1L, t(1), 1.00), (1L, 2L, t(2), 1.00), (1L, 3L, t(3), 1.00),
      (1L, 4L, t(4), 5.00), (1L, 5L, t(5), 5.00),
      (2L, 9L, t(1), 7.00),                       // singleton: dropped
      (3L, 11L, t(1), 2.00), (3L, 12L, t(2), 2.00)) // flat: D == 0
      .toDF("user_id", "event_id", "ts", "value")
    val got = TimeSeries.cusumChangepoint(ev, "user_id", "event_id",
        "ts", "value")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 3L, 3L, 2400L), (3L, 2L, 1L, 11L, 0L)))
  }

  test("theilSen: outlier-immune where the mean slope is not") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00")
    // perfect slope of +1.00/hour (100 cents/hour) with one wild
    // outlier at the end — the median pairwise slope stays 100.0
    val ev = Seq(
      (1L, 1L, t(1), 1.00), (1L, 2L, t(2), 2.00), (1L, 3L, t(3), 3.00),
      (1L, 4L, t(4), 4.00), (1L, 5L, t(5), 500.00))
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.theilSen(ev, "user_id", "ts", "event_id", "value")
      .head()
    assert(out.getLong(1) == 10L, s"5 choose 2 pairs: ${out.getLong(1)}")
    assert(out.getDouble(2) == 100.0,
      s"median slope must ignore the outlier: ${out.getDouble(2)}")
    // equal-time pairs are excluded, not divide-by-zero
    val eq = Seq((1L, 1L, t(1), 1.0), (1L, 2L, t(1), 9.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeries.theilSen(eq, "user_id", "ts", "event_id", "value")
      .isEmpty)
  }

  test("theilSen: a deliberately heavy key — exact median over ~45k " +
      "pairs, no single-buffer percentile aggregate") {
    // one key with 300 events → 300·299/2 = 44 850 pairwise slopes; a
    // buffering Percentile aggregate would hold all of them in one
    // task's memory — the rank path must agree with a local twin and
    // keep the Percentile expression out of the plan entirely
    def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    val rows = (0 until 300).map { i =>
      // deterministic jagged series: mixes positive/negative slopes
      val cents = ((i * 37) % 101) - 50 + i / 3
      (7L, i.toLong, t(i), cents / 100.0)
    } :+ ((8L, 1000L, t(0), 1.0)) :+ ((8L, 1001L, t(10), 2.0))
    val ev = rows.toDF("user_id", "event_id", "ts", "value")
    val df = TimeSeries.theilSen(ev, "user_id", "ts", "event_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      "theilSen must not plan the single-buffer Percentile aggregate")
    val out = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // local twin: exact pairwise slopes, Spark percentile-0.5 semantics
    val pts = rows.filter(_._1 == 7L)
      .map(r => (r._3.getTime / 1000, math.round(r._4 * 100)))
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.size
      if pts(i)._1 != pts(j)._1
    } yield (pts(j)._2 - pts(i)._2).toDouble * 3600d /
        (pts(j)._1 - pts(i)._1).toDouble).sorted
    val n = slopes.size
    val want = BigDecimal(0.5 * slopes((n - 1) / 2) + 0.5 * slopes(n / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(7L)._1 == 44850L, s"pair count: ${out(7L)._1}")
    assert(out(7L)._2 == want, s"median ${out(7L)._2} want $want")
    assert(out(8L) == ((1L, 600.0)), s"two-point key: ${out(8L)}")
  }

  test("olsTrend: exact slope on a perfect line; degenerate x dropped") {
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$i%02d")
    val ev = Seq(
      // y = 2 cents per second exactly
      (1L, t(1), 0.02), (1L, t(2), 0.04), (1L, t(3), 0.06),
      // all at the same second -> zero x-variance, dropped
      (2L, t(5), 1.0), (2L, t(5), 2.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.olsTrend(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out == Map(1L -> ((3L, 2.0))), out)
  }
}
