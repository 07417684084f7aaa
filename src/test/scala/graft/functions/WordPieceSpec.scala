package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed WordPiece segmentation semantics for
  * [[WordPieceEncode]] — greedy longest match, `##` continuations,
  * whole-word [UNK] on any dead end — plus the codegen-residency
  * assertion every custom expression here carries.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "un", "ta", "t", "a", "b", "l", "e",
    "##aff", "##able", "##a", "##b", "##l", "##e", "##n", "##ble")

  private def enc(words: String*): Seq[String] = {
    val df = Seq(Tuple1(words)).toDF("toks")
    df.select(wordpiece_encode(col("toks"), vocab).as("p"))
      .head().getSeq[String](0)
  }

  test("greedy longest match with ## continuations (BERT paper example)") {
    assert(enc("unaffable") == Seq("un", "##aff", "##able"))
    // greedy takes '##ble' (len 3) over '##b'+'##l'+'##e' for 'table'
    assert(enc("table") == Seq("ta", "##ble"))
    // multi-word arrays concatenate pieces in word order
    assert(enc("table", "unaffable") ==
      Seq("ta", "##ble", "un", "##aff", "##able"))
  }

  test("dead end anywhere makes the WHOLE word [UNK]") {
    // 'tax': 'ta' matches, then 'x' has no continuation — classic
    // WordPiece discards the partial pieces, not just the tail
    assert(enc("tax") == Seq("[UNK]"))
    assert(enc("zzz") == Seq("[UNK]"))
    // a word-initial piece cannot match mid-word: after 'un' the rest
    // 'un' only has the HEAD piece 'un', no '##un'/'##u' continuation
    assert(enc("unun") == Seq("[UNK]"))
    // single-char continuation chain still segments fully
    assert(enc("ble") == Seq("b", "##l", "##e"))
  }

  test("empty words are [UNK]; null slots are skipped; null array is null") {
    assert(enc("") == Seq("[UNK]"))
    val df = Seq(Tuple1(Seq[String](null, "table"))).toDF("toks")
    assert(df.select(wordpiece_encode(col("toks"), vocab))
      .head().getSeq[String](0) == Seq("ta", "##ble"))
    val nul = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
    assert(nul.select(wordpiece_encode(col("toks"), vocab)).head().isNullAt(0))
  }

  test("expression stays inside whole-stage codegen") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val plan = docs
      .select(wordpiece_encode(graft.ops.TextAnalysis.tokens(col("text")),
        vocab).as("p"))
      .queryExecution.executedPlan
    val inWsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("wordpiece_encode") => w
    }
    assert(inWsc.nonEmpty, s"wordpiece_encode fell out of codegen:\n$plan")
  }
}
