package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Goldens for the round-2 pipeline operators: binned range join vs the
  * naive theta join, repetition metrics on crafted docs, contamination
  * counting, packing invariants, and salted-agg equivalence.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive theta join") {
    val pts = Seq((1L, "a"), (5L, "b"), (10L, "c"), (17L, "d"), (23L, "e"))
      .toDF("p", "pname")
    val ivs = Seq((0L, 6L, "i1"), (4L, 12L, "i2"), (20L, 30L, "i3"))
      .toDF("s", "e", "iname")
    val binned = RangeJoin.binned(pts, ivs, "p", "s", "e", binWidth = 7L)
      .select("pname", "iname").as[(String, String)].collect().toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pname", "iname").as[(String, String)].collect().toSet
    assert(binned == naive)
    assert(binned == Set(("a", "i1"), ("b", "i1"), ("b", "i2"),
      ("c", "i2"), ("e", "i3")))
  }

  test("binned range join emits each qualifying pair exactly once") {
    // interval spans many bins; the point's single bin dedups naturally
    val pts = Seq((50L, "x")).toDF("p", "pname")
    val ivs = Seq((0L, 100L, "wide")).toDF("s", "e", "iname")
    val out = RangeJoin.binned(pts, ivs, "p", "s", "e", binWidth = 10L).collect()
    assert(out.length == 1)
  }

  test("repetition metrics: crafted duplicate fractions") {
    val docs = Seq(
      (1L, "a b c d"),          // all distinct: every frac 0
      (2L, "a a a a"),          // 4 words 1 distinct; 3 bigrams 1 distinct
      (3L, "xy"))               // single token: no bigrams -> 0.0
      .toDF("doc_id", "text")
    val m = PipelineOps.repetitionMetrics(docs, "text")
      .select("doc_id", "dup_word_frac", "dup_bigram_frac")
      .as[(Long, Double, Double)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(m(1L) == (0.0, 0.0))
    assert(m(2L) == (0.75, round6(1.0 - 1.0 / 3)))
    assert(m(3L) == (0.0, 0.0))
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("contamination: shared n-gram counts against a benchmark subset") {
    // doc 0 is benchmark (0 % 97 == 0); docs 1..2 train.
    val docs = Seq(
      (0L, "src0", "one two three four five six"),
      // shares "one two three four five" and "two three four five six"
      (1L, "src0", "zero one two three four five six"),
      (2L, "src1", "totally different words here indeed"))
      .toDF("doc_id", "source", "text")
    val per = PipelineOps.contamination(docs, n = 5, benchMod = 97L)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    assert(per(1L) == 2L)
    assert(per(2L) == 0L)
    assert(!per.contains(0L)) // benchmark docs are not scored
  }

  test("sequence packing: bins respect order and budget") {
    val docs = Seq(
      (1L, "s", 1000L), (2L, "s", 1000L), (3L, "s", 1000L), (4L, "s", 100L))
      .toDF("doc_id", "source", "nt")
    val out = PipelineOps.sequencePacking(docs, "source", "doc_id",
        col("nt"), budget = 2048L)
      .select("doc_id", "seq_bin").as[(Long, Long)].collect().toMap
    // cum-before: 0, 1000, 2000, 3000 -> bins 0, 0, 0, 1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("salted count+sum equals direct aggregation") {
    val ev = Tables.load(spark, sf, "events")
    val salted = PipelineOps.saltedCountSum(ev, "event_type",
        floor(col("value") * 100).cast("long"), col("event_id"), salts = 16)
      .orderBy("event_type")
      .as[(String, Long, Long)].collect().toSeq
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100).cast("long")).as("s"))
      .orderBy("event_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(salted == direct)
    // the partial stage really groups on the salt
    val plan = PipelineOps.saltedCountSum(ev, "event_type",
      floor(col("value") * 100).cast("long"), col("event_id"), salts = 16)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("temperature sampling flattens the mixture and lands near budget") {
    val docs = Tables.load(spark, sf, "documents")
    val total = docs.count()
    val kept = PipelineOps.temperatureSample(docs, "source", "doc_id",
      alpha = 0.5, budget = total / 2)
    val n = kept.count()
    // hash sampling: expected budget hit within a loose band
    assert(n > total / 4 && n < total * 3 / 4, s"kept $n of $total")
    // alpha < 1 over-represents small sources: the keep FRACTION of the
    // smallest source must be >= that of the largest source
    val bySrc = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val keptBySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val smallest = bySrc.minBy(_._2)._1
    val largest = bySrc.maxBy(_._2)._1
    if (bySrc(smallest) < bySrc(largest)) {
      val fSmall = keptBySrc.getOrElse(smallest, 0L).toDouble / bySrc(smallest)
      val fLarge = keptBySrc.getOrElse(largest, 0L).toDouble / bySrc(largest)
      assert(fSmall >= fLarge,
        s"alpha<1 must flatten: small=$fSmall large=$fLarge")
    }
    // deterministic: re-evaluation keeps the identical id set
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = PipelineOps.temperatureSample(docs, "source", "doc_id",
      alpha = 0.5, budget = total / 2).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("curation funnel: each reject reason fires on its crafted doc, in priority order") {
    val docs = Seq(
      (1L, "one two three"),                                   // < 10 tokens
      (2L, "spam spam spam spam spam spam spam spam spam ham also ham"), // dup > 0.3
      (3L, "a! b! c! d! e! f! g! h! i! j! k! l!"),             // punct soup, no stopwords
      (4L, "the quick brown fox and the lazy dog walk to town in the morning"),
      (5L, "one one one")                                      // short AND repetitive
    ).toDF("doc_id", "text")
    val statuses = PipelineOps.curationFunnel(docs, "text")
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(statuses == Map(
      1L -> "too_short",
      2L -> "repetitive",
      3L -> "low_quality",
      4L -> "kept",
      5L -> "too_short")) // priority: too_short wins over repetitive
  }

  test("chunking: crafted overlap, tail, and empty-doc semantics") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks
      (2L, "a b c"),                          // shorter than one chunk
      (3L, "   "),                            // whitespace-only: no chunks
      (4L, "x")
    ).toDF("doc_id", "text")
    val chunks = PipelineOps.chunkDocuments(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(chunks == Seq(
      // starts 0,3,6,9: full windows then the 1-token tail
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),   // 1-token overlap with previous
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (1L, 3L, "t10", 1L),
      (2L, 0L, "a b c", 3L),
      (4L, 0L, "x", 1L)))
    // stride == chunkSize: exact partition of the tokens, no overlap
    val flat = PipelineOps.chunkDocuments(docs.filter(col("doc_id") === 1),
        "doc_id", "text", chunkSize = 4, stride = 4)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    assert(flat.mkString(" ") === "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
  }

  test("deterministic split: total partition, stable, fractions in range") {
    val docs = Tables.load(spark, sf, "documents")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = PipelineOps.assignSplit(docs, "doc_id", splits)
    val counts = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every row must land in exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    val trainFrac = counts("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
    // stability: same ids -> same assignment on re-evaluation
    val a = assigned.select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = PipelineOps.assignSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("splitLeakage counts straddling groups; group-keyed split has none") {
    // Hand-assigned frame: g1 straddles train/test, g2 is clean.
    val assigned = Seq(
      (1L, "train"), (1L, "test"), (1L, "train"),
      (2L, "train"), (2L, "train"))
      .toDF("user_id", "split")
    val audit = PipelineOps.splitLeakage(assigned, "user_id")
      .as[(Long, Long, Long)].head()
    assert(audit === ((2L, 1L, 2L)))
    // End to end: hashing the GROUP key makes the audit provably clean,
    // hashing the row id does not (events per user span hash buckets).
    val ev = Tables.load(spark, sf, "events")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val grp = PipelineOps.splitLeakage(
      PipelineOps.assignSplit(ev, "user_id", w), "user_id")
      .as[(Long, Long, Long)].head()
    assert(grp._2 === 0L && grp._3 === 1L)
    val row = PipelineOps.splitLeakage(
      PipelineOps.assignSplit(ev, "event_id", w), "user_id")
      .as[(Long, Long, Long)].head()
    assert(row._2 > 0L, "row-hash split should leak users across splits")
  }

  test("fimTransform: hand-computed splits, passthrough, reconstruction") {
    val docs = Seq((0L, "abcdef"), (1L, "abcdef"), (2L, "abcdef"))
      .toDF("doc_id", "text")
    val got = Augment.fimTransform(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    // id 0: selected, psm, p1 = 7%7 = 0, p2 = 0 + 3%7 = 3
    assert(got(0) === ((0L, "psm", "<PRE><SUF>def<MID>abc")))
    // id 1: selected, spm, p1 = 38%7 = 3, p2 = 3 + 20%4 = 3 (empty mid)
    assert(got(1) === ((1L, "spm", "<SUF>def<PRE>abc<MID>")))
    // id 2: hash 871522 >= 500000 → plain passthrough
    assert(got(2) === ((2L, "plain", "abcdef")))
  }

  test("fimTransform: NULL text passes through as 'plain', never " +
      "mislabelled psm/spm") {
    // id 0 hashes selected on non-null text; with text NULL the
    // selection conjunction is NULL and must read as not-selected.
    val docs = Seq((0L, null: String), (1L, null: String))
      .toDF("doc_id", "text")
    val got = Augment.fimTransform(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(got.map(_._2) === Seq("plain", "plain"))
    assert(got.forall(_._3 == null))
  }

  test("fimTransform reconstruction: segments reassemble the original " +
      "for every format (random docs)") {
    val rnd = new scala.util.Random(19)
    val docs = (0L until 60L).map(i =>
      (i, rnd.alphanumeric.take(rnd.nextInt(30)).mkString))
    val got = Augment.fimTransform(docs.toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, String, String)].collect()
    val byId = docs.toMap
    got.foreach { case (id, fmt, t) =>
      fmt match {
        case "plain" => assert(t == byId(id))
        case "psm" =>
          val m = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
          val m(pre, suf, mid) = t
          assert(pre + mid + suf == byId(id), s"doc $id")
        case "spm" =>
          val m = "(?s)<SUF>(.*)<PRE>(.*)<MID>(.*)".r
          val m(suf, pre, mid) = t
          assert(pre + mid + suf == byId(id), s"doc $id")
      }
    }
    assert(got.map(_._2).distinct.sorted.toSeq == Seq("plain", "psm", "spm"),
      "all three formats should occur across 60 docs")
  }

  test("span corruption: sentinels, targets, tail clip, empty doc") {
    val docs = Seq(
      (0L, "a b c d e f g h"),        // starts at p=0 and p=7 (clipped to 1 token)
      (10L, "a b c d e f g h i j"),   // (p+10)%7==0 => single span at p=4
      (4L, ""))                       // no tokens at all
      .toDF("doc_id", "text")
    val out = Augment.spanCorrupt(docs, "doc_id", "text",
        every = 7, spanLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == (("<extra_id_0> d e f g <extra_id_1>",
      "<extra_id_0> a b c <extra_id_1> h", 2L, 4L)), s"got ${out(0L)}")
    assert(out(10L) == (("a b c d <extra_id_0> h i j",
      "<extra_id_0> e f g", 1L, 3L)), s"got ${out(10L)}")
    assert(out(4L) == (("", "", 0L, 0L)), s"got ${out(4L)}")
  }

  test("span corruption masks exactly spanLen/every of an aligned doc") {
    // doc_id 0, 70 tokens: 10 spans x 3 tokens = 30 masked
    val text = (0 until 70).map(i => s"t$i").mkString(" ")
    val out = Augment.spanCorrupt(Seq((0L, text)).toDF("doc_id", "text"),
        "doc_id", "text", every = 7, spanLen = 3)
      .head()
    assert(out.getLong(3) == 10L && out.getLong(4) == 30L)
    // sentinels replace their spans in place, order preserved
    assert(out.getString(1).startsWith("<extra_id_0> t3 t4 t5 t6 <extra_id_1>"))
  }

  test("serpentineShards: back-and-forth dealing balances a linear " +
      "size ramp perfectly") {
    // 16 docs with token counts 16..1 into 4 shards: pass 0 deals
    // 16,15,14,13 to shards 0..3, pass 1 deals 12,11,10,9 to shards
    // 3..0, ... — every shard totals exactly 34 tokens
    val docs = (1 to 16).map(i => (i.toLong, Seq.fill(17 - i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = PipelineOps.serpentineShards(docs, "doc_id", "text", shards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(0L -> ((4L, 34L)), 1L -> ((4L, 34L)),
      2L -> ((4L, 34L)), 3L -> ((4L, 34L))), s"got $out")
  }

  test("epochOrder: per-epoch permutations, distinct across epochs, " +
      "reproducible, batches follow ordinals") {
    val df = (1L to 200L).toDF("doc_id")
    val out = PipelineOps.epochOrder(df, "doc_id", epochs = 2,
        batchSize = 16, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 200L),
        "ordinals must be a 1..n permutation per epoch")
      assert(rows.forall(r => r._4 == (r._3 - 1) / 16),
        "batch id must be (ord-1) div batchSize")
    }
    val o0 = byEpoch(0L).sortBy(_._3).map(_._2).toSeq
    val o1 = byEpoch(1L).sortBy(_._3).map(_._2).toSeq
    assert(o0 != o1, "epochs must shuffle differently")
    // an additive-only epoch term would make epoch 1 a mere ROTATION
    // of epoch 0's order — require a genuine reshuffle
    assert(!o0.indices.exists(k => o1 == o0.drop(k) ++ o0.take(k)),
      "epoch 1 must not be a rotation of epoch 0")
    val again = PipelineOps.epochOrder(df, "doc_id", 2, 16, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(again.sortBy(r => (r._1, r._3)).toSeq ==
      out.sortBy(r => (r._1, r._3)).toSeq, "must be reproducible")
  }

  test("stratifiedExactSplit: exact floor counts per stratum, first " +
      "ranks to val then test, tiny strata starve in the right order") {
    val df = ((1L to 10L).map(i => (i, "big")) ++
      (11L to 13L).map(i => (i, "small"))).toDF("id", "s")
    val got = PipelineOps.stratifiedExactSplit(df, Seq("s"), Seq("id"),
        valPpm = 200000L, testPpm = 300000L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("split"))).toMap
    // big (n=10): val = ids 1-2, test = 3-5, train = 6-10
    assert((1L to 2L).forall(got(_) == "val"))
    assert((3L to 5L).forall(got(_) == "test"))
    assert((6L to 10L).forall(got(_) == "train"))
    // small (n=3): floor(0.6)=0 val, floor(1.5)=1 test, 2 train —
    // val starves before test, test before train
    assert(got(11L) == "test" && got(12L) == "train" && got(13L) == "train")
  }

  test("stratifiedExactSplit is bit-identical under repartitioning") {
    val rows = (1L to 97L).map(i => (i, s"s${i % 5}"))
    val a = PipelineOps.stratifiedExactSplit(rows.toDF("id", "s"),
      Seq("s"), Seq("id"), 100000L, 100000L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("split"))).toMap
    val b = PipelineOps.stratifiedExactSplit(
      rows.toDF("id", "s").repartition(13), Seq("s"), Seq("id"),
      100000L, 100000L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("split"))).toMap
    assert(a === b)
    // exact proportions: each stratum has 19-20 rows -> 1-2 val
    val perStratum = rows.groupBy(_._2).map { case (s, rs) =>
      s -> rs.count(r => a(r._1) == "val")
    }
    perStratum.foreach { case (s, nVal) =>
      val n = rows.count(_._2 == s)
      assert(nVal === n / 10, s"stratum $s")
    }
  }

  private def fill(budget: Long, rows: (String, Long, Long)*) =
    PipelineOps.waterFillBudget(rows.toDF("d", "w", "c"), "d", "w", "c",
        budget)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap

  test("waterFillBudget: capped surplus re-flows, largest-remainder " +
      "+1s are deterministic, all-capped leaves budget unallocated") {
    // A's fair share (5) exceeds nothing... A caps at 2, surplus flows
    // to B: A=2, B=8.
    assert(fill(10L, ("A", 1L, 2L), ("B", 1L, 100L)) ===
      Map("A" -> ((2L, true)), "B" -> ((8L, false))))
    // 10 over three equal weights: base 3 each, one remainder -> the
    // smallest domain id gets the +1.
    assert(fill(10L, ("A", 1L, 100L), ("B", 1L, 100L), ("C", 1L, 100L))
      === Map("A" -> ((4L, false)), "B" -> ((3L, false)),
        "C" -> ((3L, false))))
    // sum(caps) < budget: everyone capped, leftover stays unallocated.
    assert(fill(100L, ("A", 1L, 3L), ("B", 1L, 4L)) ===
      Map("A" -> ((3L, true)), "B" -> ((4L, true))))
    // weighted proportional: w 3:1 over budget 8, no caps binding.
    assert(fill(8L, ("A", 3L, 100L), ("B", 1L, 100L)) ===
      Map("A" -> ((6L, false)), "B" -> ((2L, false))))
  }

  test("waterFillBudget fails loudly on non-positive weights") {
    val e = intercept[Exception] {
      PipelineOps.waterFillBudget(Seq(("A", 0L, 5L)).toDF("d", "w", "c"),
        "d", "w", "c", 10L).collect()
    }
    assert(e.getMessage.contains("non-positive weight"))
  }

  test("greedyCoverageSelect: biggest set first, overlap penalized, " +
      "gain-ties to smaller id, zero-gain round stops early") {
    val docs = Seq(
      (1L, "a b c"),      // 3 distinct
      (2L, "a b"),        // subset of 1
      (3L, "c d e f"),    // 4 distinct -> round-1 winner
      (4L, "x"))          // disjoint singleton
      .toDF("doc_id", "text")
    val got = PipelineOps.greedyCoverageSelect(docs, "doc_id", "text", 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // r1: 3 wins (4 new); r2: docs 1 and 2 both add {a,b} -> tie at 2,
    // smaller id 1 wins (covered 6); r3: doc 2 adds NOTHING, doc 4
    // adds 1 -> 4 wins (covered 7).
    assert(got === Seq((1, 3L, 4L, 4L), (2, 1L, 2L, 6L), (3, 4L, 1L, 7L)))
    // early stop: after the winner covers everything, no remaining doc
    // has a positive gain -> the greedy returns fewer than k rows.
    val dup = Seq((1L, "a b"), (2L, "a b"), (3L, "b")).toDF("doc_id", "text")
    val stopped = PipelineOps.greedyCoverageSelect(dup, "doc_id", "text", 3)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(stopped === Seq((1, 1L, 2L, 2L)))
  }
}
