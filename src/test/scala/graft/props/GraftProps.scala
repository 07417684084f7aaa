package graft.props

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{CosineSimilarityF, HammingDistance64, InterleaveBits16, JaccardSorted, RollingHash64}

/** ScalaCheck properties for the pure kernels: the custom expressions'
  * eval semantics and the binned-range-join correctness lemma.  These
  * run hundreds of generated cases without a SparkSession — the
  * codegen'd paths are covered by the (dataset-driven) specs; eval and
  * codegen share `nullSafeEval`-equivalent arithmetic by construction.
  */
object GraftProps extends Properties("graft") {

  private def lit(x: Any) = Literal(x)

  property("hamming64 == popcount of xor") = forAll { (a: Long, b: Long) =>
    HammingDistance64(lit(a), lit(b)).eval(null) ==
      java.lang.Long.bitCount(a ^ b)
  }

  property("hamming64 is a metric: symmetry + identity") = forAll { (a: Long, b: Long) =>
    val d = HammingDistance64(lit(a), lit(b)).eval(null).asInstanceOf[Int]
    val dRev = HammingDistance64(lit(b), lit(a)).eval(null).asInstanceOf[Int]
    val dSelf = HammingDistance64(lit(a), lit(a)).eval(null).asInstanceOf[Int]
    d == dRev && dSelf == 0 && d >= 0 && d <= 64
  }

  private val asciiStr = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("rolling_hash64 is deterministic") = forAll(asciiStr) { s =>
    val u = UTF8String.fromString(s)
    RollingHash64(lit(u)).eval(null) == RollingHash64(lit(u)).eval(null)
  }

  property("rolling_hash64 separates append") = forAll(asciiStr, Gen.alphaChar) { (s, c) =>
    RollingHash64(lit(UTF8String.fromString(s))).eval(null) !=
      RollingHash64(lit(UTF8String.fromString(s + c))).eval(null)
  }

  private val vec = Gen.chooseNum(2, 16).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)))

  private def vecLit(xs: Seq[Float]) =
    Literal.create(xs.toArray,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))

  property("cosine_sim in [-1, 1] and cos(v, v) == 1 for nonzero v") =
    forAll(vec) { xs =>
      val norm = math.sqrt(xs.map(x => x.toDouble * x.toDouble).sum)
      if (xs.isEmpty || norm < 1e-3) Prop.passed
      else {
        val self = CosineSimilarityF(vecLit(xs), vecLit(xs))
          .eval(null).asInstanceOf[Double]
        Prop(math.abs(self - 1.0) < 1e-9) :| s"cos(v,v)=$self"
      }
    }

  property("cosine_sim symmetry") = forAll(vec, vec) { (a, b) =>
    val (aa, bb) = (a.take(b.length), b.take(a.length))
    if (aa.isEmpty || bb.isEmpty) Prop.passed
    else Prop(
      CosineSimilarityF(vecLit(aa), vecLit(bb)).eval(null) ==
        CosineSimilarityF(vecLit(bb), vecLit(aa)).eval(null))
  }

  /** The lemma RangeJoin.binned relies on: a point inside [s, e] always
    * lands in one of the interval's exploded bins, and in EXACTLY one
    * of its own — so the equi-join meets every qualifying pair once.
    */
  property("morton2 round-trips: de-interleaving recovers both inputs") =
    forAll(Gen.chooseNum(0, 0xffff), Gen.chooseNum(0, 0xffff)) { (x, y) =>
      val z = InterleaveBits16(lit(x), lit(y)).eval(null).asInstanceOf[Long]
      def compact(v: Long): Int = {
        var s = v & 0x55555555L
        s = (s | (s >> 1)) & 0x33333333L
        s = (s | (s >> 2)) & 0x0f0f0f0fL
        s = (s | (s >> 4)) & 0x00ff00ffL
        s = (s | (s >> 8)) & 0x0000ffffL
        s.toInt
      }
      compact(z) == x && compact(z >> 1) == y
    }

  property("morton2 masks to the low 16 bits (negative ints safe)") =
    forAll { (x: Int, y: Int) =>
      val z = InterleaveBits16(lit(x), lit(y)).eval(null).asInstanceOf[Long]
      val zm = InterleaveBits16(lit(x & 0xffff), lit(y & 0xffff))
        .eval(null).asInstanceOf[Long]
      z == zm && z >= 0L && z <= 0xffffffffL
    }

  private val sortedSet: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-100L, 100L)).map(_.distinct.sorted.toArray)

  property("jaccard_sorted == set-algebra Jaccard") =
    forAll(sortedSet, sortedSet) { (a, b) =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      val got = JaccardSorted(
        Literal(ArrayData.toArrayData(a),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        Literal(ArrayData.toArrayData(b),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val want = if (union == 0) 0.0 else inter.toDouble / union
      math.abs(got - want) < 1e-12
    }

  property("range-join binning lemma: containment => bin membership") =
    forAll(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(0L, 5000L),
        Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 1000L)) { (s, off, len, w) =>
      val p = s + math.min(off, len) // s <= p <= e
      val e = s + len
      def bin(x: Long) = math.floor(x.toDouble / w).toLong
      val bins = bin(s) to bin(e)
      Prop(bins.contains(bin(p))) :| s"p=$p s=$s e=$e w=$w"
    }

  /** Greedy sequence-packing invariants, simulated in plain Scala:
    * bins are monotone along the order, and a doc assigned to bin b
    * starts strictly inside [b*budget, (b+1)*budget).
    */
  property("sequence-packing lemma: monotone bins, bounded starts") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 4096L)), Gen.chooseNum(1L, 8192L)) {
      (toks, budget) =>
        val cums = toks.scanLeft(0L)(_ + _).init // cum-before per doc
        val bins = cums.map(c => c / budget)
        val monotone = bins.sliding(2).forall {
          case Seq(a, b) => a <= b
          case _ => true
        }
        val bounded = cums.zip(bins).forall { case (c, b) =>
          c >= b * budget && c < (b + 1) * budget
        }
        monotone && bounded
    }

  // --- Aho-Corasick: a tiny alphabet maximizes prefix sharing, fail
  // --- transitions and overlapping matches per generated case
  private val tinyPat = Gen.chooseNum(1, 5)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
  private val tinyText = Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)

  property("aho countDistinct == naive per-pattern contains") =
    forAll(Gen.nonEmptyListOf(tinyPat), tinyText) { (ps, t) =>
      val distinct = ps.distinct
      val ac = new graft.functions.AhoAutomaton(distinct.toArray)
      val naive = distinct.count(t.contains(_))
      Prop(ac.countDistinct(t) == naive) :| s"ps=$distinct t='$t' naive=$naive"
    }

  property("aho count is monotone under text append") =
    forAll(Gen.nonEmptyListOf(tinyPat), tinyText, tinyText) { (ps, t1, t2) =>
      val ac = new graft.functions.AhoAutomaton(ps.distinct.toArray)
      ac.countDistinct(t1 + t2) >= math.max(
        ac.countDistinct(t1), ac.countDistinct(t2))
    }

  property("sign_pack64 bit i reflects sign of dim i; high bits clear") =
    forAll(vec) { xs =>
      val sig = graft.functions.SignPack64(vecLit(xs)).eval(null)
        .asInstanceOf[Long]
      val low = xs.zipWithIndex.forall { case (x, i) =>
        (((sig >>> i) & 1L) == 1L) == (x >= 0.0f) }
      val high = (xs.length until 64).forall(i => ((sig >>> i) & 1L) == 0L)
      Prop(low && high) :| f"sig=$sig%x xs=$xs"
    }
}
