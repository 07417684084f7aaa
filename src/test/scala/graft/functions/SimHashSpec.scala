package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.TextAnalysis

/** The fused [[SimHash64]] expression: bit-compatibility with the
  * explode + 64-column vote-aggregation formulation it replaced, null
  * contracts, and analysis-time type checking.
  */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-fusion formulation, kept here as the semantic oracle. */
  private def legacySimhash(df: org.apache.spark.sql.DataFrame) = {
    val tok = df.select(col("doc_id").as("id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  test("fused expression is bit-identical to the vote aggregation on real docs") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val fused = docs.select(col("doc_id").as("id"),
        simhash64(TextAnalysis.tokens(col("text"))).as("simhash"))
      .filter(col("simhash").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val legacy = legacySimhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == legacy.size && fused == legacy,
      s"${fused.size} fused vs ${legacy.size} legacy signatures")
  }

  test("empty and null token arrays yield NULL (doc has no signature)") {
    val out = Seq(("x y z", 1), ("", 2), (null: String, 3)).toDF("text", "i")
      .select(col("i"), simhash64(TextAnalysis.tokens(col("text"))).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1).isDefined && out(2).isEmpty && out(3).isEmpty, s"got $out")
  }

  test("non-string arrays are an analysis error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Array(1L, 2L))).toDF("a")
        .select(simhash64(col("a"))).collect()
    }
    assert(e.getMessage.contains("ARRAY<STRING>"), e.getMessage)
  }

  test("SQL-registered graft_simhash64 matches the column helper") {
    val viaSql = spark.sql(
      "SELECT graft_simhash64(array('a','b','c'))").head().getLong(0)
    val viaCol = Seq(Tuple1(Seq("a", "b", "c"))).toDF("t")
      .select(simhash64(col("t"))).head().getLong(0)
    assert(viaSql == viaCol)
  }
}
