package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning — the tokenizer-
  * training step of an LLM data pipeline, run as k rounds of Spark
  * aggregation instead of a single-machine loop.
  *
  * Each round: (1) count adjacent symbol pairs across the word table,
  * weighted by word frequency — one shuffle of (pair, freq) partials;
  * (2) take the most frequent pair (deterministic lexicographic
  * tie-break) — a 1-row driver fetch, like k-means' centroid pull;
  * (3) apply the merge to every word's symbol array map-side via a
  * sentinel-guarded left fold (`aggregate`), no shuffle.
  *
  * The word table is vocabulary-sized (Zipf-bounded, ~10⁶ rows at any
  * corpus scale) — the corpus itself is only scanned ONCE to build it,
  * so 100 TB of text costs one tokenize+groupBy; the k merge rounds
  * then run on the tiny word table.  Greedy left-to-right merge
  * semantics match the reference BPE formulation ("aaa" + (a,a) →
  * [aa, a]).
  */
object Bpe {

  /** (word, freq) table: the only full-corpus pass. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))

  /** Learn `k` merges; returns (iter, merge_left, merge_right,
    * pair_count) — the ordered merge table a tokenizer would ship.
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    var words = wordTable(docs, textCol)
      .select(col("freq"), regexp_extract_all(col("word"), lit("."), lit(0))
        .as("syms"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (i <- 1 to k) {
      val pairs = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("z"))
        .groupBy(col("z.l").as("l"), col("z.r").as("r"))
        .agg(sum("freq").cast("long").as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        rules += ((i, l, r, cnt))
        // sentinel-guarded fold: acc starts [""] so element_at(acc, -1)
        // is always defined under ANSI; the sentinel (the only possible\n        // empty string) is filtered out at the end
        words = words.select(col("freq"),
          filter(
            aggregate(col("syms"), array(lit("")), (acc, x) =>
              when(element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
                .otherwise(concat(acc, array(x)))),
            s => s =!= lit("")).as("syms"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    rules.toSeq.toDF("iter", "merge_left", "merge_right", "pair_count")
  }

  /** Tokenize text with a learned merge table (fold per rule in iter
    * order) — per-row projection, no shuffle.
    */
  def applyMerges(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = regexp_extract_all(col(textCol), lit("."), lit(0))
    val merged = merges.foldLeft(base) { case (syms, (l, r)) =>
      filter(
        aggregate(syms, array(lit("")), (acc, x) =>
          when(element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x)))),
        s => s =!= lit(""))
    }
    df.withColumn("bpe_tokens", merged)
  }
}
