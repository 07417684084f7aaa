package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Error-bound and determinism properties of the DataFrameStatFunctions
  * sketches (reference `DataFrameStatFunctions.scala:372,409,492`),
  * mirroring the error-bounded style of the Quantize spec.
  */
class StatSketchSpec extends SparkSpec {

  test("countMinSketch never underestimates and meets the eps bound") {
    val ord = Tables.load(spark, sf, "orders")
    val n = ord.count()
    val cms = ord.stat.countMinSketch("o_orderstatus", 0.01, 0.95, 42)
    val exact = ord.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (st, cnt) =>
      val est = cms.estimateCount(st)
      assert(est >= cnt, s"CMS underestimated $st: $est < $cnt")
      assert(est <= cnt + (0.01 * n).toLong + 1,
        s"CMS above eps bound for $st: $est vs $cnt (n=$n)")
    }
  }

  test("bloomFilter has no false negatives and bounded false positives") {
    val ord = Tables.load(spark, sf, "orders")
    val bf = ord.stat.bloomFilter("o_custkey", 2000, 0.01)
    val keys = ord.select("o_custkey").distinct().collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "bloom filter dropped a member key")
    // absent keys far outside the domain: fpp 1% with margin 5x
    val absent = (1000000L until 1002000L).toArray
    val fp = absent.count(bf.mightContain)
    assert(fp <= absent.length * 0.05, s"false-positive rate too high: $fp/2000")
  }

  test("sampleBy is seed-deterministic and respects strata") {
    val ord = Tables.load(spark, sf, "orders")
    val fractions = Map("F" -> 0.5, "O" -> 0.1)
    val a = ord.stat.sampleBy("o_orderstatus", fractions, 7L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = ord.stat.sampleBy("o_orderstatus", fractions, 7L)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sampleBy not deterministic under a fixed seed")
    // no rows from strata outside the fraction map
    val strata = ord.stat.sampleBy("o_orderstatus", fractions, 7L)
      .select("o_orderstatus").distinct().collect().map(_.getString(0)).toSet
    assert(strata.subsetOf(Set("F", "O")), s"unexpected strata: $strata")
  }

  test("ExactQuantiles matches the single-buffer percentile() bit-for-bit") {
    val li = Tables.load(spark, sf, "lineitem")
    val ps = Seq(0.0, 0.08, 0.25, 0.5, 0.75, 0.9, 1.0)
    val dist = ExactQuantiles.percentiles(li, "l_extendedprice", ps, numParts = 8)
    val single = li.select(expr(
      s"percentile(l_extendedprice, array(${ps.mkString(",")}))").as("ep"))
      .head().getSeq[Double](0)
    ps.indices.foreach { i =>
      assert(dist(i) == single(i),
        s"p=${ps(i)}: distributed ${dist(i)} != aggregate ${single(i)}")
    }
  }

  test("ExactQuantiles handles nulls, single values, and rejects empties") {
    import spark.implicits._
    val withNulls = Seq[java.lang.Double](1.0, null, 3.0, null, 2.0)
      .toDF("v")
    assert(ExactQuantiles.percentiles(withNulls, "v", Seq(0.5)) == Seq(2.0))
    val one = Seq(7.5).toDF("v")
    assert(ExactQuantiles.percentiles(one, "v", Seq(0.0, 0.5, 1.0)) ==
      Seq(7.5, 7.5, 7.5))
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.percentiles(Seq.empty[Double].toDF("v"), "v", Seq(0.5))
    }
    assert(e.getMessage.contains("no non-null values"))
  }
}
