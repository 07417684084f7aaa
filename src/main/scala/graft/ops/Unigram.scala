package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One Viterbi-EM round of unigram-LM tokenizer training (Kudo 2018,
  * the SentencePiece unigram model) at corpus scale: given piece
  * costs in integer micro-nats, segment every distinct word by
  * min-cost Viterbi ([[graft.functions.UnigramViterbi]] — integer DP,
  * engine-exact), count piece usage weighted by word frequency (the
  * hard-EM E-step), and re-derive each piece's cost from its usage
  * share (M-step, `round(ln(total/count)·10⁶)`).
  *
  * Scale shape: the corpus collapses to the DISTINCT-word frequency
  * table first (vocabulary-sized — one map-side-combined aggregation
  * over the token stream), so the Viterbi expression runs once per
  * distinct word, not per occurrence; the piece-count aggregation and
  * the 1-row total are the only further shuffles.  Words that cannot
  * be segmented (a character outside the vocabulary) are excluded
  * from the E-step, the standard unigram-EM treatment of OOV.
  */
object Unigram {

  /** @param vocab (piece, cost_micro) pairs, cost = −ln p · 10⁶
    * @return (piece, n_uses, new_cost_micro) for every piece used at
    *         least once, ordered by piece
    */
  def viterbiEmRound(docs: DataFrame, textCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    require(vocab.nonEmpty)
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
    val seg = words
      .withColumn("__pieces", graft.functions.unigram_viterbi(
        col("__w"), vocab.map(_._1), vocab.map(_._2)))
      .filter(col("__pieces").isNotNull)
    val counts = seg
      .select(col("__wc"), explode(split(col("__pieces"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("__wc")).as("n_uses"))
    val tot = counts.agg(sum(col("n_uses")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_uses"),
        round(log(col("__tot").cast("double") / col("n_uses").cast("double"))
          * 1000000d, 0).cast("long").as("new_cost_micro"))
      .orderBy(col("piece"))
  }
}
