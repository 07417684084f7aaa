package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Content-defined chunking semantics: chunks exactly partition each
  * document, boundaries follow content, and — the property the whole
  * technique exists for — an edit early in a document re-synchronizes
  * within a chunk, leaving the tail chunks bit-identical (fixed-size
  * blocks would shift every downstream block).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def text(seed: Int, n: Int): String = {
    val rnd = new Random(seed)
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("chunks partition the document: contiguous starts, lengths sum " +
      "to the truncated doc length") {
    val t = text(1, 600)
    val ch = Cdc.chunks(Seq((1L, t)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(ch.map(_._3).sum == 600L, s"lengths must sum to doc length")
    assert(ch.head._2 == 1L, "first chunk starts at 1")
    ch.sliding(2).foreach {
      case Array((_, s1, l1), (_, s2, _)) =>
        assert(s2 == s1 + l1, s"chunks must be contiguous: $s1+$l1 vs $s2")
      case _ =>
    }
    // multiple chunks at the default expected length of 64
    assert(ch.length >= 3, s"600 chars should yield several chunks: ${ch.length}")
  }

  test("an early insertion re-synchronizes: tail chunks keep their " +
      "hashes; fixed-size blocks would not") {
    val base = text(2, 1200)
    val edited = base.substring(0, 10) + "X" + base.substring(10)
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = Cdc.chunks(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(3)))
    val h1 = ch.filter(_._1 == 1L).map(x => (x._2, x._3)).toSet
    val h2 = ch.filter(_._1 == 2L).map(x => (x._2, x._3)).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size - 3,
      s"all but the edited chunk (and its neighbor) must survive: " +
        s"${h1.size} base chunks, $shared shared")
    assert(h1 != h2, "the edited chunk itself must differ")
    // the fixed-size-block strawman: shifted 64-char blocks share ~nothing
    val fixed1 = base.grouped(64).toSeq
    val fixed2 = edited.grouped(64).toSeq
    assert(fixed1.toSet.intersect(fixed2.toSet).size <= 1,
      "fixed blocks lose alignment after the insertion (sanity check)")
  }

  test("randomized: chunks == local CDC twin on random docs (2 seeds)") {
    for (seed <- Seq(41, 42)) {
      val rnd = new Random(seed)
      val docs = (1 to 20).map(i => (i.toLong, text(seed * 100 + i,
        rnd.nextInt(400))))
      val got = Cdc.chunks(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // local twin replaying the identical integer arithmetic
      val want = docs.filter(_._2.nonEmpty).flatMap { case (d, t0) =>
        val t = t0.take(2048)
        val bs = (8 to t.length).filter { p =>
          val h = t.substring(p - 8, p).foldLeft(0L)(
            (a, c) => (a * 31 + c.toLong) % 2147483648L)
          h % 64 == 0
        }
        val edges = (0 +: bs) :+ t.length
        edges.distinct.sliding(2).zipWithIndex.collect {
          case (Seq(a, b), ci) if b > a =>
            val chunk = t.substring(a, b)
            val h = chunk.foldLeft(0L)(
              (x, c) => (x * 31 + c.toLong) % 2147483648L)
            (d, ci.toLong) -> ((a + 1L, (b - a).toLong, h))
        }
      }.toMap
      assert(got == want, s"seed=$seed: ${got.size} vs ${want.size}")
    }
  }

  test("dedupSummary: exact duplicate docs halve unique chars") {
    val t = text(3, 500)
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val r = Cdc.dedupSummary(df, "doc_id", "text").head()
    assert(r.getLong(2) == 1000L, s"chars_total: $r")
    assert(r.getLong(3) == 500L, s"duplicate doc must dedup fully: $r")
    assert(r.getLong(4) == 500000L, s"dup ratio 50%: $r")
  }
}
