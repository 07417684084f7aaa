package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding covariance and whitening (ZCA/Cholesky) — the classic
  * preprocessing step before cosine-based semantic dedup or ANN, where
  * anisotropic embedding spaces (dominant directions) distort
  * similarity.
  *
  * Scale design — exact fixed-point moments: each coordinate is
  * quantized to integer micro-units, per-row pair products are emitted
  * as an in-partition generated array (no self-join, no row-key
  * shuffle), and the hash aggregation's map-side combine collapses
  * every partition to at most d(d+1)/2 partial rows BEFORE the
  * shuffle — the exchange carries O(d²) rows regardless of corpus
  * size.  Partials are summed as DECIMAL(38,0), so the moment table is
  * bit-identical under any partitioning and exact to 10³⁸ (≈10¹²
  * vectors × 64² micro-products away from overflow).  The d×d solve
  * (Cholesky of the covariance) runs on the driver over the collected
  * moment table — d² doubles, bounded at any corpus size.
  */
object Whitening {

  private def qel(vecCol: String, idx: String): String =
    s"CAST(round(CAST(element_at($vecCol, $idx + 1) AS DOUBLE) * 1000000.0, 0) AS BIGINT)"

  /** Exact second-moment table: one row per dimension pair (i <= j)
    * with (i, j, n, si, sj, sij, cov) — si/sij are micro-unit integer
    * sums (DECIMAL(38,0) exact); cov is the population covariance
    * `(n·sij − si·sj) / (n²·10¹²)`, one deterministic division from
    * the exact integers.
    */
  def momentsMicro(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    require(d >= 1, s"dimension must be >= 1, got $d")
    val pairs = emb.select(explode(expr(
      s"""flatten(transform(sequence(0, ${d - 1}), i ->
         |  transform(sequence(i, ${d - 1}), j ->
         |    named_struct(
         |      'i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
         |      'vi', ${qel(vecCol, "i")}, 'vj', ${qel(vecCol, "j")},
         |      'v', ${qel(vecCol, "i")} * ${qel(vecCol, "j")}))))""".stripMargin))
      .as("p"))
    pairs.select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.vi").as("vi"), col("p.vj").as("vj"), col("p.v").as("v"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("vi").cast("decimal(38,0)")).as("si"),
        sum(col("vj").cast("decimal(38,0)")).as("sj"),
        sum(col("v").cast("decimal(38,0)")).as("sij"))
      .select(col("i"), col("j"), col("n"), col("si"), col("sj"), col("sij"),
        ((col("n") * col("sij") - col("si") * col("sj")).cast("double")
          / (col("n").cast("double") * col("n") * lit(1e12))).as("cov"))
  }

  /** Whiten vectors: w = L⁻¹ (x − μ), where L is the Cholesky factor
    * of the (ε-ridged) covariance — so the whitened sample covariance
    * is the identity.  The moment collect and the triangular solve are
    * O(d²) driver work; the per-row transform is a per-partition
    * numeric kernel over the broadcast d×d matrix (the same class of
    * bounded imperative work as [[Multimodal]] byte decode — no
    * Expression form exists for a dense mat-vec).
    *
    * @return (idCol, whitened: array<double>)
    */
  def whiten(emb: DataFrame, idCol: String, vecCol: String, d: Int,
      eps: Double = 1e-9): DataFrame = {
    val m = momentsMicro(emb, vecCol, d).collect()
    val n = m.head.getLong(2).toDouble
    val mean = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    m.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val c = r.getDouble(6)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = r.getDecimal(3).doubleValue() / (n * 1e6)
    }
    val low = cholesky(cov, eps)
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>")).as[(Long, Seq[Double])]
    val bcL = spark.sparkContext.broadcast((low, mean))
    rows.mapPartitions { it =>
      val (l, mu) = bcL.value
      val dd = mu.length
      it.map { case (id, v) =>
        // forward-substitution solve L y = (x - mu)
        val y = new Array[Double](dd)
        var r = 0
        while (r < dd) {
          var s = v(r) - mu(r)
          var c = 0
          while (c < r) { s -= l(r)(c) * y(c); c += 1 }
          y(r) = s / l(r)(r)
          r += 1
        }
        (id, y.toSeq)
      }
    }.toDF(idCol, "whitened")
  }

  /** Squared Mahalanobis distance per vector — the embedding
    * out-of-distribution screen a curation pipeline runs before
    * training: m² = ‖L⁻¹(x − μ)‖², i.e. the squared norm of the
    * [[whiten]]ed vector, which weighs every direction by the corpus's
    * own covariance (a vector can be OOD by correlation structure, not
    * just magnitude).  Same scale shape as whiten: O(d²) driver moment
    * solve, then a narrow per-row kernel + one codegen'd fold — no
    * shuffle at all after the moment aggregation.
    */
  def mahalanobis(emb: DataFrame, idCol: String, vecCol: String,
      d: Int, eps: Double = 1e-9): DataFrame =
    whiten(emb, idCol, vecCol, d, eps)
      .select(col(idCol),
        aggregate(col("whitened"), lit(0.0d),
          (acc, x) => acc + x * x).as("m2"))

  /** Lower-triangular Cholesky factor of `a + eps·I` (a symmetric
    * positive-semidefinite d×d matrix). Driver-side, O(d³).
    */
  private[ops] def cholesky(a: Array[Array[Double]], eps: Double): Array[Array[Double]] = {
    val d = a.length
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j) + (if (i == j) eps else 0.0)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          require(s > 0.0, s"covariance not positive definite at dim $i (pivot $s)")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }
}
