package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring (repeated-span) duplication analysis — the Lee et
  * al. 2022 "Deduplicating Training Data Makes Language Models Better"
  * signal (arXiv:2107.06499), re-expressed relationally: an n-token
  * span that occurs more than once ANYWHERE in the corpus (across docs
  * or repeated inside one) is a duplicated span, and a document's
  * duplicated-span count measures how much of it is boilerplate.
  *
  * Scale design: spans are built with a per-document window
  * (partitionBy doc, orderBy position, n-1 FOLLOWING) — one shuffle
  * partitioned by document, linear in corpus tokens; no higher-order
  * lambda re-tokenizes per element.  Each span immediately collapses
  * to a 64-bit xxhash, so the corpus-wide duplicate count and the
  * join back to documents shuffle fixed 8-byte keys, never span text
  * (at ~10¹² spans the 64-bit collision expectation is the usual
  * birthday bound — counts are exact up to that, same contract as
  * [[PipelineOps]] contamination).
  */
object SpanDedup {

  /** Per-document repeated-span statistics.
    *
    * @param n span length in tokens
    * @return one row per input document: (idCol, n_spans,
    *         n_dup_spans) — spans the doc contributes, and how many of
    *         them occur ≥2 times corpus-wide (both counts include
    *         every occurrence, so within-doc repetition is counted)
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val w = Window.partitionBy(idCol).orderBy("__pos").rowsBetween(0, n - 1)
    val spans = toks
      .withColumn("__window", collect_list("__tok").over(w))
      .filter(size(col("__window")) === n)
      .select(col(idCol),
        xxhash64(concat_ws(" ", col("__window"))).as("__h"))
    val dup = spans.groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
      .select(col("__h"), lit(1L).as("__isdup"))
    val stats = spans.join(dup, Seq("__h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("__isdup"), lit(0L))).cast("long").as("n_dup_spans"))
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
  }
}
