package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[MultiMatchCount]] (Aho-Corasick blocklist matcher) and
  * [[SignPack64]] (binary embedding sketch): hand-computed goldens,
  * parity with the naive per-pattern formulation on real documents,
  * null/type contracts, and the SQL-registered forms.
  */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def hits(text: String, patterns: Seq[String]): Option[Int] = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(multi_match_count(col("t"), patterns).as("n")).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("classic overlap set he/she/his/hers on 'ushers'") {
    // 'ushers' contains she, he, hers — but not his; the he-inside-she
    // and hers-after-she matches only surface through fail links
    assert(hits("ushers", Seq("he", "she", "his", "hers")) == Some(3))
  }

  test("multi-word patterns sharing a prefix") {
    val ps = Seq("fast hash", "fast table", "slow scan")
    assert(hits("a fast hash join", ps) == Some(1))
    assert(hits("fast table fast hash", ps) == Some(2))
    assert(hits("fast tab", ps) == Some(0))
  }

  test("early exit when every pattern is found is still correct") {
    assert(hits("abc", Seq("a", "b", "c")) == Some(3))
    assert(hits("aaa bbb", Seq("a", "b")) == Some(2))
  }

  test("matching is case-sensitive; duplicates in the list count once") {
    assert(hits("Spark", Seq("spark")) == Some(0))
    assert(hits("he he he", Seq("he", "he")) == Some(1))
  }

  test("non-ASCII patterns and text take the fail-chain path") {
    assert(hits("привет мир", Seq("привет", "мир", "nope")) == Some(2))
    assert(hits("a naïve plan", Seq("naïve", "naive")) == Some(1))
    assert(hits(" naive", Seq("naïve", "naive")) == Some(1))
  }

  test("NULL text yields NULL") {
    assert(hits(null, Seq("x")) == None)
  }

  test("parity with the naive P-pass contains() on real documents") {
    val banned = Seq("fast hash", "big table", "spark", "vector", "zzz")
    val naive = banned.map(p =>
      sum(when(instr(lower(col("text")), p) > 0, 1).otherwise(0)))
      .reduce(_ + _)
    val docs = Tables.load(spark, sf, "documents")
    val viaAc = docs.select(
      sum(multi_match_count(lower(col("text")), banned))).head().getLong(0)
    val viaNaive = docs.select(naive).head().getLong(0)
    assert(viaAc == viaNaive && viaAc > 0,
      s"AC total $viaAc vs naive $viaNaive")
  }

  test("sparse (no dense DFA) automaton matches the dense path exactly") {
    // denseLimit = 0 forces every transition through the fail-chain —
    // the memory-bounded mode a million-node pattern set gets
    val ps = Array("he", "she", "his", "hers", "fast hash", "пр")
    val dense = new AhoAutomaton(ps)
    val sparse = new AhoAutomaton(ps, denseLimit = 0)
    val texts = Seq("ushers", "his fast hash set", "пример", "", "hhhh",
      "she sells seashells", "fast hash fast hash")
    texts.foreach { t =>
      assert(dense.countDistinct(t) == sparse.countDistinct(t),
        s"dense/sparse diverge on '$t'")
    }
  }

  test("pattern-list contract violations are analysis errors") {
    val e1 = intercept[AnalysisException] {
      Seq(Tuple1(1)).toDF("t").select(multi_match_count(col("t"), Seq("x"))).collect()
    }
    assert(e1.getMessage.contains("STRING"), e1.getMessage)
    val e2 = intercept[AnalysisException] {
      Seq(Tuple1("t")).toDF("t")
        .select(multi_match_count(col("t"), Seq.empty[String])).collect()
    }
    assert(e2.getMessage.contains("non-empty"), e2.getMessage)
    val e3 = intercept[AnalysisException] {
      Seq(Tuple1("t")).toDF("t")
        .select(multi_match_count(col("t"), Seq("a", ""))).collect()
    }
    assert(e3.getMessage.contains("non-empty"), e3.getMessage)
    // a non-literal pattern column must be rejected, not silently built
    val e4 = intercept[AnalysisException] {
      spark.sql("SELECT graft_multi_match_count('x', array(c)) " +
        "FROM VALUES ('a') AS t(c)").collect()
    }
    assert(e4.getMessage.contains("foldable"), e4.getMessage)
  }

  test("SQL-registered graft_multi_match_count matches the helper") {
    val viaSql = spark.sql(
      "SELECT graft_multi_match_count('ushers', array('he','she','his','hers'))")
      .head().getInt(0)
    assert(viaSql == 3)
  }

  test("sign_pack64 golden bits; zero counts as non-negative") {
    val sig = Seq(Tuple1(Seq(1.0f, -1.0f, 0.0f, -2.5f))).toDF("v")
      .select(sign_pack64(col("v"))).head().getLong(0)
    assert(sig == 5L, s"expected 0b0101, got $sig")
  }

  test("sign_pack64 uses only the first 64 dims; short arrays leave high bits clear") {
    val long65 = Seq(Tuple1((0 until 65).map(_ => 1.0f))).toDF("v")
      .select(sign_pack64(col("v"))).head().getLong(0)
    assert(long65 == -1L, "64 set bits = all-ones long")
    val short2 = Seq(Tuple1(Seq(1.0f, 1.0f))).toDF("v")
      .select(sign_pack64(col("v"))).head().getLong(0)
    assert(short2 == 3L)
  }

  test("identical vectors sketch to hamming 0; one sign flip to hamming 1") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 3.0f)),
      (2L, Seq(9.0f, -8.0f, 7.0f)),
      (3L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("id", "v")
      .select(col("id"), sign_pack64(col("v")).as("s"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(m(1L) ^ m(2L)) == 0)
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) == 1)
  }

  test("both expressions run INSIDE whole-stage codegen (no fallback stage)") {
    // the perf claim is that matching/sketching happens in the scan's
    // generated code — the projection must sit under a WholeStageCodegen
    // node, not in a separate non-codegen Project
    val docs = Tables.load(spark, sf, "documents")
    val plan1 = docs.select(
        multi_match_count(lower(col("text")), Seq("a", "b")).as("n"))
      .queryExecution.executedPlan
    val inWsc1 = plan1.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("multimatchcount") => w
    }
    assert(inWsc1.nonEmpty, s"multi_match_count fell out of codegen:\n$plan1")
    val emb = Tables.load(spark, sf, "embeddings")
    val plan2 = emb.select(sign_pack64(col("embedding")).as("s"))
      .queryExecution.executedPlan
    val inWsc2 = plan2.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("signpack64") => w
    }
    assert(inWsc2.nonEmpty, s"sign_pack64 fell out of codegen:\n$plan2")
  }

  test("sign_pack64 rejects non-float arrays; SQL form registered") {
    val e = intercept[AnalysisException] {
      Seq(Tuple1(Seq(1L, 2L))).toDF("v").select(sign_pack64(col("v"))).collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
    val viaSql = spark.sql(
      "SELECT graft_sign_pack64(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)))")
      .head().getLong(0)
    assert(viaSql == 1L)
  }
}
