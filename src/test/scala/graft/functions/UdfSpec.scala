package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** §2.12 UDF/UDAF surface: scalar udf() (ScalaUDF path), SQL-visible
  * registration (UDFRegistration.register), typed Aggregator through
  * functions.udaf in SQL, and the custom-Expression SQL registration
  * path — the performance-ordered alternatives the rebuild prefers.
  */
class UdfSpec extends SparkSpec {
  import spark.implicits._

  test("scalar udf: DataFrame and SQL registration agree") {
    val band = udf((price: Double) =>
      if (price > 300000) "high" else if (price > 100000) "mid" else "low")
    spark.udf.register("price_band", band)
    Tables.registerAll(spark, sf)
    val viaDf = Tables.load(spark, sf, "orders")
      .select(band(col("o_totalprice")).as("b"))
      .groupBy("b").count().as[(String, Long)].collect().toMap
    val viaSql = spark.sql(
      "SELECT price_band(o_totalprice) AS b, count(*) AS n FROM orders GROUP BY b")
      .as[(String, Long)].collect().toMap
    assert(viaDf == viaSql)
    assert(viaDf.keySet == Set("high", "mid", "low"))
  }

  test("typed Aggregator registered as SQL udaf") {
    spark.udf.register("minhash16",
      graft.ops.MinHashAggregator.minhashUdaf(16))
    Tables.registerAll(spark, sf)
    val sig = spark.sql(
      """SELECT minhash16(xxhash64(word)) AS sig FROM (
        |  SELECT explode(split(text, ' ')) AS word FROM documents WHERE doc_id = 1)
        |""".stripMargin).as[Array[Long]].head()
    assert(sig.length == 16)
    assert(sig.forall(_ != Long.MaxValue))
  }

  test("custom Generator (UDTF): DataFrame select, LATERAL VIEW, and explode-twin agree") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", exprs => NGramsGenerator(exprs(0), exprs(1)), "built-in")
    Tables.registerAll(spark, sf)
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") <= 50)
    docs.createOrReplaceTempView("docs_small")

    val viaDf = docs.select(graft.functions.ngrams(col("text"), 2))
      .as[(Int, String)].collect().toSeq.sorted
    val viaSql = spark.sql(
      """SELECT pos, ngram FROM docs_small
        |LATERAL VIEW ngrams(text, 2) t AS pos, ngram""".stripMargin)
      .as[(Int, String)].collect().toSeq.sorted
    assert(viaDf == viaSql, "DataFrame and LATERAL VIEW outputs must agree")
    assert(viaDf.nonEmpty)
    // spot-check against a hand-tokenized document
    val one = docs.filter(col("doc_id") === 1)
      .select(col("text")).as[String].head()
    val toks = one.split("\\s+").filter(_.nonEmpty)
    val expected = toks.sliding(2).zipWithIndex
      .map { case (p, i) => (i, p.mkString(" ")) }.toSeq
    val got = docs.filter(col("doc_id") === 1)
      .select(graft.functions.ngrams(col("text"), 2))
      .as[(Int, String)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // every bigram is two tokens joined by a single space
    assert(viaDf.forall { case (p, g) => p >= 0 && g.split(" ").length == 2 })
    // a Generate node (not a UDF) carries the custom generator
    val plan = docs.select(graft.functions.ngrams(col("text"), 2))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate"), s"expected Generate node:\n$plan")
  }

  test("custom codegen Expression registered for SQL") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
    val viaSql = spark.sql("SELECT rolling_hash64('abc') AS h")
      .as[Long].head()
    val expected = "abc".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    assert(viaSql == expected)
  }

  test("jaccard_sorted == array_intersect/union composition on random sets") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(200) { i =>
      def set() = Seq.fill(rnd.between(1, 40))(rnd.between(0L, 60L))
        .distinct.sorted
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.jaccard_sorted(col("a"), col("b")).as("j"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      val inter = a.toSet.intersect(b.toSet).size.toDouble
      val uni = a.toSet.union(b.toSet).size.toDouble
      val expected = if (uni == 0) 0.0 else inter / uni
      assert(math.abs(got(id) - expected) < 1e-12, s"row $id")
    }
    // identical sets → 1.0; disjoint → 0.0 (eval + codegen both paths)
    val edge = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)), (Seq(1L), Seq(9L)))
      .toDF("a", "b")
      .select(graft.functions.jaccard_sorted(col("a"), col("b")).as("j"))
      .as[Double].collect().toSeq
    assert(edge == Seq(1.0, 0.0))
  }

  test("wrong input types are ANALYSIS errors, not runtime garbage") {
    // cosine_sim reads raw float slots — array<double> must be rejected
    // at analysis (not silently misread), same for hamming64 on non-longs
    val doubles = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(graft.functions.cosine_sim(col("a"), col("b"))).collect()
    }
    val ints = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.functions.hamming64(col("a"), col("b"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", 1L)).toDF("a", "b")
        .select(graft.functions.hamming64(col("a"), col("b"))).collect()
    }
  }

  test("repeated custom expressions share one whole-stage-codegen scope") {
    // regression: the codegen fragments declare locals — with fixed
    // names, TWO calls of the same expression in one projection emit
    // duplicate declarations, janino rejects the stage, and execution
    // silently falls back to the interpreted path.  freshName-generated
    // locals must keep both calls inside WholeStageCodegen.
    // inputs derive from a range SCAN (a literal local relation would
    // constant-fold away before any codegen happens)
    val df = spark.range(2)
      .select(col("id"),
        sequence(lit(1L), col("id") + 3L).as("a"),
        sequence(lit(2L), col("id") + 4L).as("b"),
        sequence(col("id") + 9L, col("id") + 9L).as("c"),
        concat(lit("ab"), col("id").cast("string")).as("s1"),
        concat(lit("xy"), col("id").cast("string")).as("s2"),
        array(lit(1.0f), col("id").cast("float")).as("v1"),
        array(col("id").cast("float"), lit(1.0f)).as("v2"))
      .select(col("id"),
        graft.functions.jaccard_sorted(col("a"), col("b")).as("j1"),
        graft.functions.jaccard_sorted(col("a"), col("c")).as("j2"),
        graft.functions.rolling_hash64(col("s1")).as("h1"),
        graft.functions.rolling_hash64(col("s2")).as("h2"),
        graft.functions.cosine_sim(col("v1"), col("v2")).as("c1"),
        graft.functions.cosine_sim(col("v1"), col("v1")).as("c2"))
    // with fallback off, a janino rejection (duplicate locals) throws
    // instead of silently executing interpreted
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val row =
      try df.where(col("id") === 0).head()
      finally spark.conf.set("spark.sql.codegen.fallback", saved)
    // id=0: a=[1,2,3], b=[2,3,4] → 2/4; c=[9] → 0; v1=[1,0] ⊥ v2=[0,1]
    assert(math.abs(row.getDouble(1) - 0.5) < 1e-12)
    assert(math.abs(row.getDouble(2)) < 1e-12)
    assert(row.getLong(3) != row.getLong(4))
    assert(math.abs(row.getDouble(5)) < 1e-12)
    assert(math.abs(row.getDouble(6) - 1.0) < 1e-12)
    // the projection planned INSIDE a whole-stage scope (the *(n) mark)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"custom expressions fell out of whole-stage codegen:\n$plan")
  }

  test("unicode_normalize: NFC composes, NFKC folds compatibility, nulls pass") {
    import graft.functions.unicode_normalize
    // derive from a range scan so codegen actually runs (a local
    // relation constant-folds before codegen)
    val df = spark.range(1).select(
      unicode_normalize(lit("cafe\u0301"), "NFC").as("nfc"),
      unicode_normalize(lit("\uFB01n \uFF11\uFF12"), "NFKC").as("nfkc"),
      unicode_normalize(lit("caf\u00e9"), "NFD").as("nfd"),
      unicode_normalize(lit(null).cast("string"), "NFC").as("nul"))
    val r = df.collect()(0)
    assert(r.getString(0) == "caf\u00e9", "combining acute must compose")
    assert(r.getString(1) == "fin 12", "ligature + full-width digits must fold")
    assert(r.getString(2) == "cafe\u0301", "NFD decomposes the precomposed char")
    assert(r.isNullAt(3), "null in, null out")
    intercept[IllegalArgumentException] {
      unicode_normalize(lit("x"), "NFX")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(unicode_normalize(col("id"), "NFC")).collect()
    }
  }
}
