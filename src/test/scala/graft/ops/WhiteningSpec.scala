package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Hand-valued moment goldens and the whitening identity for
  * [[Whitening]].
  */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  test("momentsMicro matches the closed form on crafted vectors") {
    // vectors (1,0), (0,1), (1,1): cov00 = cov11 = 2/9, cov01 = -1/9
    val emb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("id", "v")
    val m = Whitening.momentsMicro(emb, "v", d = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDecimal(5).longValue(), r.getDouble(6)))).toMap
    assert(m((0L, 0L)) == ((3L, 2000000000000L, 2.0 / 9)), s"got $m")
    assert(m((1L, 1L)) == ((3L, 2000000000000L, 2.0 / 9)))
    assert(m((0L, 1L)) == ((3L, 1000000000000L, -1.0 / 9)))
  }

  test("momentsMicro is invariant to partitioning") {
    val data = (1 to 97).map(i => (i.toLong, Seq(i * 0.01f, (i % 7) * 0.1f, -i * 0.003f)))
    val one = Whitening.momentsMicro(data.toDF("id", "v").coalesce(1), "v", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    val many = Whitening.momentsMicro(data.toDF("id", "v").repartition(13), "v", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(6)).toMap
    assert(one == many, "integer moments must not depend on partitioning")
  }

  test("whitened vectors have identity sample covariance and zero mean") {
    val rnd = new Random(42)
    val d = 4
    val emb = (1 to 300).map { i =>
      val base = rnd.nextGaussian()
      // correlated dims so the input covariance is far from identity
      (i.toLong, Seq.tabulate(d)(k => (base * (k + 1) + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("id", "v")
    val w = Whitening.whiten(emb, "id", "v", d, eps = 1e-9)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = w.length.toDouble
    val mu = Array.tabulate(d)(k => w.map(_(k)).sum / n)
    // micro-quantized moments put the recovered mean within ~1e-6 of
    // the true sample mean; the triangular solve can amplify by ||L⁻¹||
    for (k <- 0 until d)
      assert(math.abs(mu(k)) < 1e-4, s"whitened mean dim $k = ${mu(k)}")
    for (i <- 0 until d; j <- i until d) {
      val c = w.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      // micro-unit quantization of the moments bounds the residual
      assert(math.abs(c - want) < 1e-3, s"whitened cov($i,$j) = $c, want $want")
    }
  }

  test("cholesky factor reproduces the ridged matrix") {
    val a = Array(Array(4.0, 2.0, 0.6), Array(2.0, 5.0, 1.0), Array(0.6, 1.0, 3.0))
    val l = Whitening.cholesky(a, eps = 0.0)
    for (i <- 0 until 3; j <- 0 until 3) {
      val r = (0 until 3).map(k => l(i)(k) * l(j)(k)).sum
      assert(math.abs(r - a(i)(j)) < 1e-12, s"LLt($i,$j) = $r vs ${a(i)(j)}")
    }
    assert(l(0)(1) == 0.0 && l(0)(2) == 0.0 && l(1)(2) == 0.0, "lower triangular")
  }

  test("mahalanobis: correlated direction scores lower than a rarer one") {
    // strongly correlated 2D cloud along (1,1); two probes at the same
    // Euclidean distance from the mean: along the major axis (common)
    // vs the minor axis (rare) — Mahalanobis must rank the minor-axis
    // probe far higher, which plain L2 cannot.
    val cloud = (0 until 200).map { i =>
      val t = (i - 100) / 25.0
      (i.toLong, Seq(t, t + (if (i % 2 == 0) 0.1 else -0.1)))
    }
    val major = (1000L, Seq(4.0, 4.0))
    val minor = (1001L, Seq(4.0 / math.sqrt(2) + 0.0,
      -4.0 / math.sqrt(2)))  // same L2 norm from the origin/mean
    val emb = (cloud :+ major :+ minor).toDF("id", "vec")
    val m2 = Whitening.mahalanobis(emb, "id", "vec", d = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m2(1001L) > 10 * m2(1000L),
      s"minor-axis probe must dominate: ${m2(1001L)} vs ${m2(1000L)}")
  }
}
