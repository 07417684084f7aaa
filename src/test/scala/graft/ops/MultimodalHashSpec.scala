package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Perceptual aHash semantics: near-clones land within the Hamming
  * budget, the 10-band candidate generation is pigeonhole-COMPLETE
  * against brute force, and unrelated docs stay apart.
  */
class MultimodalHashSpec extends SparkSpec {
  import spark.implicits._

  private def text(seed: Int, n: Int): String = {
    val rnd = new Random(seed)
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("banded near-dup pairs == brute-force Hamming filter (complete " +
      "for maxHamming <= 9)") {
    val docs = (1 to 40).map(i => (i.toLong, text(i, 300))) ++
      (1 to 10).map(i => (1000L + i, text(i, 300) + "zq")) // near-clones
    val df = docs.toDF("doc_id", "text")
    for (mh <- Seq(3, 6, 9)) {
      val got = Multimodal.imageNearDupPairs(df, "doc_id", "text", mh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val hashes = Multimodal.imageAHash64(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        h = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
        if h <= mh
      } yield (a, b, h.toLong)).toSet
      assert(got == brute, s"maxHamming=$mh: ${got.size} vs ${brute.size}")
    }
  }

  test("near-clones pair with their originals; the hashes differ only " +
      "slightly") {
    val docs = (1 to 20).map(i => (i.toLong, text(100 + i, 400))) ++
      (1 to 20).map(i => (2000L + i, text(100 + i, 400) + "xy"))
    val got = Multimodal.imageNearDupPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1 to 20).foreach { i =>
      assert(got.contains((i.toLong, 2000L + i)),
        s"clone pair $i missing from ${got.size} pairs")
    }
  }
}
