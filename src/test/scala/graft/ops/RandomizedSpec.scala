package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence tests: the scale-shaped operators
  * must agree with their naive formulations on arbitrary data, not
  * just the crafted goldens.
  */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive theta join on random data (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val pts = Seq.tabulate(300)(i => (i.toLong, rnd.between(-1000L, 1000L)))
        .toDF("pid", "p")
      val ivs = Seq.tabulate(60) { i =>
        val s = rnd.between(-1000L, 1000L)
        (i.toLong, s, s + rnd.between(0L, 200L))
      }.toDF("iid", "s", "e")
      val w = rnd.between(1L, 300L)
      val binned = RangeJoin.binned(pts, ivs, "p", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = pts.crossJoin(ivs)
        .filter(col("p") >= col("s") && col("p") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(binned == naive, s"seed=$seed binWidth=$w")
    }
  }

  test("salted count+sum == direct aggregation on random data") {
    val rnd = new Random(7)
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.between(-10000L, 10000L)))
      .toDF("id", "k", "v")
    val salted = PipelineOps.saltedCountSum(df, "k", col("v"), col("id"), salts = 8)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("dupFraction bounds and exactness on random token arrays") {
    val rnd = new Random(11)
    val docs = Seq.tabulate(200) { i =>
      val toks = Seq.fill(rnd.between(1, 30))(s"w${rnd.nextInt(10)}")
      (i.toLong, toks.mkString(" "), toks)
    }
    val out = docs.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val m = PipelineOps.repetitionMetrics(out, "text")
      .select("doc_id", "dup_word_frac").as[(Long, Double)].collect().toMap
    docs.foreach { case (id, _, toks) =>
      val expected = math.rint(
        (1.0 - toks.distinct.size.toDouble / toks.size) * 1e6) / 1e6
      assert(math.abs(m(id) - expected) < 1e-9, s"doc $id")
      assert(m(id) >= 0.0 && m(id) < 1.0)
    }
  }

  test("minhashPairs precision == 1 vs exact Jaccard on random corpora (2 seeds)") {
    for (seed <- Seq(5, 17)) {
      val rnd = new Random(seed)
      // small vocabulary forces real shingle overlap (candidate pairs
      // exist, some above and some below the threshold)
      val docs = Seq.tabulate(80) { i =>
        (i.toLong, Seq.fill(rnd.between(5, 25))(s"w${rnd.nextInt(12)}").mkString(" "))
      }.toDF("doc_id", "text")
      val found = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val exact = Dedup.jaccardPairsExact(docs, "doc_id", "text", threshold = 0.4)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // every surfaced pair must be a true pair with the exact value
      // (the refine guarantees precision 1; recall may be < 1)
      assert(found.subsetOf(exact), s"seed=$seed false pairs: ${found -- exact}")
      // and exact twins (jaccard == 1) are always recalled
      val twins = exact.filter(_._3 == 1.0)
      assert(twins.subsetOf(found), s"seed=$seed missed twins: ${twins -- found}")
    }
  }

  test("bm25TopK == local reference implementation on random corpora (2 seeds)") {
    for (seed <- Seq(3, 23)) {
      val rnd = new Random(seed)
      val docs = Seq.tabulate(60) { i =>
        (i.toLong, Seq.fill(rnd.between(3, 40))(s"w${rnd.nextInt(15)}").mkString(" "))
      }
      val queries = Seq((1, "w0 w7"), (2, "w3 w3 w14 zz"))
      val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
          queries.toDF("qid", "qtext"), k = 1000)
        .select("qid", "doc_id", "score_micro")
        .as[(Int, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // local BM25 with the same micro-unit rounding contract
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val n = docs.size.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val df = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
      val expected = for {
        (qid, qt) <- queries
        term <- qt.split(" ").distinct.toSeq if df.contains(term)
        (id, ts) <- toks if ts.contains(term)
      } yield {
        val idf = math.round(math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0) * 1e6)
        val tf = ts.count(_ == term).toDouble
        (qid, id) -> math.round(
          idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * ts.size / avgdl)))
      }
      val want = expected.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(got == want, s"seed=$seed diff: ${(got.toSet -- want.toSet).take(3)}" +
        s" / ${(want.toSet -- got.toSet).take(3)}")
    }
  }

  test("spanStats == brute span counting on random corpora (2 seeds)") {
    for (seed <- Seq(9, 31)) {
      val rnd = new Random(seed)
      val nSpan = 3
      val docs = Seq.tabulate(80) { i =>
        (i.toLong, Seq.fill(rnd.between(0, 12))(s"w${rnd.nextInt(6)}").mkString(" "))
      }
      val got = SpanDedup.spanStats(docs.toDF("doc_id", "text"), "doc_id", "text", nSpan)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val allSpans = docs.flatMap { case (id, t) =>
        val ts = t.split(" ").filter(_.nonEmpty)
        ts.sliding(nSpan).filter(_.size == nSpan).map(s => id -> s.mkString(" "))
      }
      val freq = allSpans.groupBy(_._2).view.mapValues(_.size)
      docs.foreach { case (id, _) =>
        val mine = allSpans.filter(_._1 == id)
        val want = (mine.size.toLong, mine.count(s => freq(s._2) >= 2).toLong)
        assert(got(id) == want, s"seed=$seed doc=$id got ${got(id)} want $want")
      }
    }
  }

  test("Linkage.resolve == brute blocked argmin on random names (2 seeds)") {
    for (seed <- Seq(13, 41)) {
      val rnd = new Random(seed)
      def name() = Seq.fill(rnd.between(4, 9))(('a' + rnd.nextInt(4)).toChar).mkString
      val clean = Seq.tabulate(60)(i => (i.toLong, name())).toDF("id", "name")
      val dirty = Seq.tabulate(60)(i => (i.toLong, name())).toDF("id", "name")
      val got = Linkage.resolve(dirty, "id", "name", clean, "id", "name",
          nm => substring(nm, 1, 2), maxDist = 2)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val cl = clean.as[(Long, String)].collect()
      val dl = dirty.as[(Long, String)].collect()
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = dl.flatMap { case (did, dn) =>
        val cands = cl.filter { case (_, cn) =>
          cn.take(2) == dn.take(2) && lev(dn, cn) <= 2 }
          .map { case (cid, cn) => (lev(dn, cn).toLong, cid) }
        if (cands.isEmpty) None
        else Some(did -> ((cands.length.toLong, cands.min._1, cands.min._2)))
      }.toMap
      assert(got == want, s"seed=$seed got-size=${got.size} want-size=${want.size}")
    }
  }

  test("removeSpans == local reference on random small-alphabet corpora (3 seeds)") {
    // 4-token alphabet forces dense span collisions: firsts, overlap
    // merging and cross-doc interactions all fire on arbitrary data
    for (seed <- Seq(5, 6, 7)) {
      val rnd = new Random(seed)
      val n = rnd.between(2, 5)
      val docs = Seq.tabulate(60) { i =>
        (i.toLong,
          Seq.fill(rnd.between(0, 25))(s"w${rnd.nextInt(4)}").mkString(" "))
      }
      val tok = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty) }.toMap
      val occ = for {
        (id, ts) <- tok.toSeq
        p <- 0 to ts.length - n
      } yield (ts.slice(p, p + n).mkString(" "), id, p)
      val counts = occ.groupBy(_._1).view.mapValues(_.size).toMap
      val firsts = occ.groupBy(_._1).view
        .mapValues(_.map(o => (o._2, o._3)).min).toMap
      val covered = occ
        .filter(o => counts(o._1) >= 2 && (o._2, o._3) != firsts(o._1))
        .flatMap(o => (o._3 until o._3 + n).map(p => (o._2, p))).toSet
      val expected = docs.map { case (id, _) =>
        val ts = tok(id)
        val kept = ts.zipWithIndex.collect {
          case (t, p) if !covered((id, p)) => t }
        id -> ((kept.mkString(" "), ts.length.toLong, kept.length.toLong,
          (ts.length - kept.length).toLong))
      }.toMap
      val got = SpanDedup.removeSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expected, s"seed=$seed n=$n")
    }
  }

  test("winnowed fingerprints == local reference winnow on random corpora") {
    def polyHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483648L)
    for (seed <- Seq(31, 32)) {
      val rnd = new Random(seed)
      val k = rnd.between(2, 4)
      val w = rnd.between(2, 6)
      val docs = Seq.tabulate(40) { i =>
        (i.toLong,
          Seq.fill(rnd.between(0, 30))(s"w${rnd.nextInt(5)}").mkString(" "))
      }
      val expected = docs.flatMap { case (id, t) =>
        val ts = t.split(" ").filter(_.nonEmpty)
        val grams = ts.sliding(k).filter(_.length == k)
          .map(_.mkString(" ")).toArray
        val hs = grams.map(polyHash)
        (0 to hs.length - w).flatMap { s =>
          val p = (s until s + w).minBy(p => (hs(p), -p))
          Some((id, p.toLong, hs(p)))
        }.distinct
      }.toSet
      val got = Dedup.winnowedFingerprints(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"seed=$seed k=$k w=$w " +
        s"got=${got.size} want=${expected.size}")
    }
  }

  test("spanCorrupt == local reference on random corpora (2 seeds)") {
    for (seed <- Seq(21, 22)) {
      val rnd = new Random(seed)
      val every = rnd.between(4, 9)
      val spanLen = rnd.between(1, every) // strictly < every: disjoint
      val docs = Seq.tabulate(50) { i =>
        (i.toLong,
          Seq.fill(rnd.between(0, 20))(s"w${rnd.nextInt(6)}").mkString(" "))
      }
      val expected = docs.map { case (id, t) =>
        val ts = t.split(" ").filter(_.nonEmpty)
        val starts = ts.indices.filter(p => (p + id) % every == 0)
        val ks = starts.zipWithIndex
        val cov = ks.flatMap { case (p, _) =>
          (p until math.min(p + spanLen, ts.length)) }.toSet
        val corrupted = ts.indices.flatMap { p =>
          ks.find(_._1 == p) match {
            case Some((_, k)) => Some(s"<extra_id_$k>")
            case None if cov(p) => None
            case None => Some(ts(p))
          }
        }.mkString(" ")
        val targets = ks.map { case (p, k) =>
          s"<extra_id_$k> " +
            ts.slice(p, math.min(p + spanLen, ts.length)).mkString(" ")
        }.mkString(" ")
        id -> ((corrupted, targets, starts.length.toLong, cov.size.toLong))
      }.toMap
      val got = Augment.spanCorrupt(docs.toDF("doc_id", "text"),
          "doc_id", "text", every, spanLen)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expected, s"seed=$seed every=$every spanLen=$spanLen")
    }
  }

  test("decileFusion == local rank-bucket twin on random ints (2 seeds)") {
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val rows = Seq.tabulate(120)(i =>
        (i.toLong, rnd.between(0L, 15L), rnd.between(-5L, 5L)))
      val got = Profile.decileFusion(rows.toDF("id", "a", "b"),
          "id", Seq("a", "b"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val n = rows.size
      def bucket(vs: Seq[Long], v: Long): Long =
        1L + vs.count(_ < v).toLong * 10 / n
      val as = rows.map(_._2); val bs = rows.map(_._3)
      rows.foreach { case (id, a, b) =>
        val (ba, bb) = (bucket(as, a), bucket(bs, b))
        assert(got(id) == ((ba, bb, ba + bb)),
          s"seed=$seed id=$id: ${got(id)} want ($ba,$bb,${ba + bb})")
      }
    }
  }

  test("itemCooccurrence == local pair counting on random data (2 seeds)") {
    for (seed <- Seq(51, 52)) {
      val rnd = new Random(seed)
      val inter = Seq.tabulate(300)(_ =>
        (rnd.between(0L, 25L), s"i${rnd.nextInt(12)}"))
      val got = GraphOps.itemCooccurrence(inter.toDF("u", "i"), "u", "i",
          minUsers = 2L)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val ui = inter.distinct
      val ic = ui.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
      val local = ui.groupBy(_._1).values.flatMap { items =>
        val is = items.map(_._2).distinct.sorted
        for (a <- is; b <- is if a < b) yield (a, b)
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
        .filter(_._2 >= 2)
        .map { case ((a, b), nab) =>
          (a, b) -> ((nab,
            math.rint(nab / math.sqrt((ic(a) * ic(b)).toDouble) * 1e6) / 1e6))
        }
      assert(got == local, s"seed=$seed: ${got.size} vs ${local.size}")
    }
  }

  test("serpentineShards == local rank-arithmetic twin on random sizes " +
      "(2 seeds)") {
    for (seed <- Seq(51, 52)) {
      val rnd = new Random(seed)
      val docs = (1 to 300).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
      val s = 8
      val got = PipelineOps.serpentineShards(docs.toDF("doc_id", "text"),
          "doc_id", "text", shards = s)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val ranked = docs.map { case (id, t) => (id, t.split(" ").length.toLong) }
        .sortBy { case (id, w) => (-w, id) }.zipWithIndex
      val local = ranked.groupBy { case (_, i) =>
        if ((i / s) % 2 == 0) i % s else s - 1 - i % s
      }.map { case (sh, xs) =>
        sh.toLong -> ((xs.size.toLong, xs.map(_._1._2).sum))
      }
      assert(got == local, s"seed=$seed: $got vs $local")
    }
  }

  test("wordpiece_encode == local greedy twin on random vocab+words (3 seeds)") {
    import graft.functions.wordpiece_encode
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val alpha = "abcd"
      def piece(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(4))).mkString
      val heads = (1 to 10).map(_ => piece(1 + rnd.nextInt(3))).distinct
      val conts = (1 to 10).map(_ => "##" + piece(1 + rnd.nextInt(3))).distinct
      val vocab = (heads ++ conts).distinct
      val words = (1 to 120).map(_ => piece(1 + rnd.nextInt(8)))
      def localGreedy(w: String): Seq[String] = {
        val hs = vocab.filterNot(_.startsWith("##")).toSet
        val cs = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
        var i = 0
        val out = Seq.newBuilder[String]
        while (i < w.length) {
          val cands = (math.min(w.length, i + (if (i == 0) 3 else 3)) to (i + 1) by -1)
            .map(j => w.substring(i, math.min(j, w.length)))
            .filter(sub => if (i == 0) hs(sub) else cs(sub))
          if (cands.isEmpty) return Seq("[UNK]")
          val hit = cands.maxBy(_.length)
          out += (if (i == 0) hit else "##" + hit)
          i += hit.length
        }
        out.result()
      }
      val got = words.zipWithIndex.map { case (w, i) => (i.toLong, Seq(w)) }
        .toDF("i", "toks")
        .select(col("i"), wordpiece_encode(col("toks"), vocab).as("p"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        assert(got(i.toLong) == localGreedy(w),
          s"seed=$seed word=$w vocab=$vocab: ${got(i.toLong)} vs ${localGreedy(w)}")
      }
    }
  }

  test("unigram_viterbi == brute-force all-segmentations argmin (3 seeds)") {
    import graft.functions.unigram_viterbi
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val alpha = "abc"
      def piece(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(3))).mkString
      val vocab = ((1 to 12).map(_ => piece(1 + rnd.nextInt(3))) ++
        alpha.map(_.toString)).distinct
      val costs = vocab.map(_ => 1000000L + rnd.nextInt(5000000).toLong)
      val cmap = vocab.zip(costs).toMap
      val words = (1 to 80).map(_ => piece(1 + rnd.nextInt(7)))
      def allSegs(w: String): Seq[(Long, String)] =
        if (w.isEmpty) Seq((0L, ""))
        else (1 to w.length).flatMap { k =>
          val p = w.take(k)
          cmap.get(p).toSeq.flatMap(c => allSegs(w.drop(k)).map {
            case (rc, rp) => (c + rc, if (rp.isEmpty) p else p + " " + rp)
          })
        }
      val got = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("i", "w")
        .select(col("i"), unigram_viterbi(col("w"), vocab, costs).as("p"))
        .collect().map(r =>
          r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1))))
        .toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val want = allSegs(w) match {
          case Seq() => None
          case segs => Some(segs.minBy(identity)._2)
        }
        assert(got(i.toLong) == want,
          s"seed=$seed word=$w: ${got(i.toLong)} vs $want")
      }
    }
  }

  test("bradleyTerry == local BigInt MM replay on random duel logs (3 seeds)") {
    val T = BigInt("1000000000000")
    for (seed <- Seq(3, 17, 42)) {
      val rnd = new Random(seed)
      val items = (0 until 4 + rnd.nextInt(6)).map(i => s"m$i")
      val duels = Seq.fill(150 + rnd.nextInt(150)) {
        val a = items(rnd.nextInt(items.size))
        var b = items(rnd.nextInt(items.size))
        while (b == a) b = items(rnd.nextInt(items.size))
        (a, b)
      }
      // exact replay: add-one smoothing over observed pairs, then 3 MM
      // rounds of truncating integer division (BigInt / == div here:
      // every operand is positive).
      val wdir = duels.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val observed = wdir.keySet.flatMap { case (a, b) => Set((a, b), (b, a)) }
      val wsm = observed.map(p => p -> (wdir.getOrElse(p, 0L) + 1L)).toMap
      val n = wsm.map { case ((a, b), w) => (a, b) -> (w + wsm((b, a))) }
      val present = wsm.keySet.map(_._1)
      val wins = present.map(i =>
        i -> wsm.collect { case ((a, _), w) if a == i => w }.sum).toMap
      var s = present.map(i => i -> BigInt(1000000)).toMap
      for (_ <- 1 to 3) {
        // .toSeq before collect: keySet is a Set, and collecting the
        // inverse terms through a Set would dedup EQUAL terms pre-sum.
        val d = present.map(i => i -> wsm.keySet.toSeq.collect {
          case (a, b) if a == i => (BigInt(n((a, b))) * T) / (s(a) + s(b))
        }.sum).toMap
        s = present.map(i => i -> (BigInt(wins(i)) * T) / d(i)).toMap
      }
      val want = present.map(i => (i, wins(i), s(i).toLong)).toSet
      val got = Preference.bradleyTerry(duels.toDF("winner", "loser"), 3)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("cohen/fleiss kappa == local BigInt arithmetic on random labels (3 seeds)") {
    for (seed <- Seq(5, 23, 61)) {
      val rnd = new Random(seed)
      val cats = Seq("a", "b", "c")
      val pairs = Seq.fill(200 + rnd.nextInt(200))(
        (cats(rnd.nextInt(3)), cats(rnd.nextInt(3))))
      def trunc(num: BigInt, den: BigInt): Long =
        (if (num < 0) -((-num * 1000000) / den) else (num * 1000000) / den)
          .toLong
      val n = BigInt(pairs.size)
      val agree = BigInt(pairs.count(p => p._1 == p._2))
      val peNum = cats.map(k => BigInt(pairs.count(_._1 == k)) *
        BigInt(pairs.count(_._2 == k))).sum
      val gotC = Agreement.cohenKappa(pairs.toDF("labelA", "labelB"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].head()
      assert(gotC === ((n.toLong, agree.toLong,
        trunc(agree, n), trunc(peNum, n * n),
        (n * agree - peNum).toLong, (n * n - peNum).toLong,
        trunc(n * agree - peNum, n * n - peNum))), s"cohen seed=$seed")

      val r = 2 + rnd.nextInt(4)
      val nItems = 30 + rnd.nextInt(50)
      val ratings = for (i <- 0 until nItems; _ <- 0 until r)
        yield (i.toLong, cats(rnd.nextInt(3)))
      val nik = ratings.groupBy(identity).view.mapValues(_.size).toMap
      val a = BigInt(nik.values.map(c => c * c).sum) - nItems * r
      val b = BigInt(nItems) * r * (r - 1)
      val c = cats.map(k => BigInt(ratings.count(_._2 == k))).map(x => x * x).sum
      val d = BigInt(nItems) * r * nItems * r
      val gotF = Agreement.fleissKappa(ratings.toDF("item", "category"), r)
        .as[(Long, Long, Long, Long, Long)].head()
      assert(gotF === ((nItems.toLong, r.toLong, trunc(a, b), trunc(c, d),
        trunc(a * d - b * c, b * (d - c)))), s"fleiss seed=$seed r=$r")
    }
  }

  test("waterFillBudget == iterative fixed-point reference on random " +
      "domain frames (3 seeds)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(100 + seed)
      val doms = (0 until 12).map(i =>
        (f"d$i%02d", 1L + rnd.nextInt(9), rnd.nextInt(400).toLong))
      val budget = 500L + rnd.nextInt(2000)
      // reference: iterate "cap everyone whose fair share of the
      // remaining budget exceeds their cap" to the fixed point with
      // exact BigInt cross-multiplication, then floor + largest
      // remainder on the uncapped rest.
      var capped = Set.empty[String]
      var changed = true
      while (changed) {
        val r = BigInt(budget) -
          doms.filter(d => capped(d._1)).map(d => BigInt(d._3)).sum
        val w = doms.filterNot(d => capped(d._1)).map(d => BigInt(d._2)).sum
        val add = doms.filterNot(d => capped(d._1))
          .filter(d => BigInt(d._3) * w <= r * d._2).map(_._1).toSet
        changed = add.nonEmpty
        capped ++= add
      }
      val rStar = (BigInt(budget) -
        doms.filter(d => capped(d._1)).map(d => BigInt(d._3)).sum)
        .max(BigInt(0))
      val wStar = doms.filterNot(d => capped(d._1)).map(d => BigInt(d._2)).sum
      val base = doms.filterNot(d => capped(d._1)).map { d =>
        d._1 -> (rStar * d._2 / wStar, rStar * d._2 % wStar)
      }
      val extras = (rStar - base.map(_._2._1).sum).toInt
      val plusOne = base.sortBy { case (n, (_, rem)) => (-rem, BigInt(n.drop(1))) }
        .take(extras).map(_._1).toSet
      val want = doms.map { d =>
        d._1 -> (if (capped(d._1)) d._3
          else (base.toMap.apply(d._1)._1 +
            (if (plusOne(d._1)) 1 else 0)).toLong)
      }.toMap
      val got = PipelineOps.waterFillBudget(
          doms.toDF("d", "w", "c").repartition(5), "d", "w", "c", budget)
        .as[(String, Long, Long, Long, Boolean)].collect()
      assert(got.map(r => r._1 -> r._4).toMap === want,
        s"seed=$seed budget=$budget capped=$capped")
      assert(got.filter(_._5).map(_._1).toSet === capped, s"seed=$seed")
    }
  }

  test("clipped_match_count == local multiset intersection on random " +
      "token arrays (3 seeds)") {
    import org.apache.spark.sql.functions.col
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val cases = (1 to 80).map { _ =>
        def arr() = Seq.fill(rnd.nextInt(20))(s"t${rnd.nextInt(5)}")
        (arr(), arr())
      }
      val got = cases.toDF("a", "b")
        .select(graft.functions.clipped_match_count(col("a"), col("b")))
        .as[Long].collect().toSeq
      val want = cases.map { case (a, b) =>
        val bc = b.groupBy(identity).view.mapValues(_.size).toMap
        a.groupBy(identity).map { case (t, xs) =>
          math.min(xs.size, bc.getOrElse(t, 0)).toLong
        }.sum
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("selfOverlap == local brute pairwise clipped overlap on random " +
      "corpora (3 seeds)") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val docs = (0 until 18).map { i =>
        (s"g${i % 3}", i.toLong,
          Seq.fill(1 + rnd.nextInt(10))(s"t${rnd.nextInt(5)}").mkString(" "))
      }
      val k = 2 + rnd.nextInt(3)
      val got = Eval.selfOverlap(docs.toDF("g", "id", "text"),
          "g", "id", "text", k, maxN = 2)
        .as[(String, Int, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      def grams(toks: Seq[String], n: Int) =
        if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val want = docs.groupBy(_._1).flatMap { case (g, ds) =>
        val sample = ds.sortBy(_._2).take(k)
          .map(d => d._3.split(" ").toSeq)
        (1 to 2).flatMap { n =>
          var m = 0L; var t = 0L
          for (a <- sample; b <- sample if a ne b) {
            val ga = grams(a, n); val gb = grams(b, n)
            val bc = gb.groupBy(identity).view.mapValues(_.size).toMap
            m += ga.groupBy(identity).map { case (x, xs) =>
              math.min(xs.size, bc.getOrElse(x, 0)).toLong }.sum
            t += ga.size
          }
          if (t > 0) Some((g, n) -> ((m, t))) else None
        }
      }
      assert(got === want, s"seed=$seed k=$k")
    }
  }

  test("cusumChangepoint == local argmax on random series (3 seeds)") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val ev = (0 until 200).map { i =>
        (s"u${i % 7}", i.toLong,
          new java.sql.Timestamp(1700000000000L + i * 60000L),
          rnd.between(-50, 50) / 1.0)
      }
      val got = TimeSeries.cusumChangepoint(
          ev.toDF("user_id", "event_id", "ts", "value"),
          "user_id", "event_id", "ts", "value")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._3, r._5))).toMap
      val want = ev.groupBy(_._1).map { case (u, es) =>
        val cs = es.sortBy(e => (e._3.getTime, e._2))
          .map(e => BigDecimal(e._4 * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        val n = cs.size.toLong; val s = cs.sum
        val ds = cs.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
          case (p, i) => (i + 1L, math.abs(n * p - (i + 1) * s))
        }
        u -> ds.minBy { case (t, d) => (-d, t) }
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("sourceJsd == local BigInt replication on random corpora " +
      "(3 seeds)") {
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new Random(seed)
      val docs = (0 until 30).map(i =>
        (s"s${i % 3}",
          Seq.fill(3 + rnd.nextInt(8))(s"w${rnd.nextInt(9)}").mkString(" ")))
      val got = CorpusStats.sourceJsd(docs.toDF("source", "text"),
          "source", "text")
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._6).toMap
      val counts = docs.groupBy(_._1).view.mapValues(
        _.flatMap(_._2.split(" ")).groupBy(identity).view
          .mapValues(_.size.toLong).toMap).toMap
      val srcs = counts.keys.toSeq.sorted
      val want = (for {
        i <- srcs.indices; j <- (i + 1) until srcs.size
        (sa, sb) = (srcs(i), srcs(j))
        ca = counts(sa); cb = counts(sb)
        shared = ca.keySet.intersect(cb.keySet) if shared.nonEmpty
      } yield {
        val (ta, tb) = (ca.values.sum, cb.values.sum)
        def micro(num: Long, den: Long) =
          BigDecimal(math.log(num.toDouble / den.toDouble) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val sA = shared.toSeq.map { t =>
          BigInt(ca(t)) * micro(2 * ca(t) * tb, ca(t) * tb + cb(t) * ta)
        }.sum
        val sB = shared.toSeq.map { t =>
          BigInt(cb(t)) * micro(2 * cb(t) * ta, ca(t) * tb + cb(t) * ta)
        }.sum
        val sha = shared.toSeq.map(ca).sum
        val shb = shared.toSeq.map(cb).sum
        val num = (sA + BigInt(693147) * (ta - sha)) * tb +
          (sB + BigInt(693147) * (tb - shb)) * ta
        val den = BigInt(2) * ta * tb
        val ppm = if (num < 0) -((-num) / den) else num / den
        (sa, sb) -> ppm.toLong
      }).toMap
      assert(got === want, s"seed=$seed")
    }
  }
}
