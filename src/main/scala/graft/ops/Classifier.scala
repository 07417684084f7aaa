package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear text classifier scoring — the fastText-style quality
  * gate used in pretraining pipelines (e.g. the GPT-3 / CCNet "does this
  * look like the reference corpus" filter): each token hashes to one of
  * `buckets` feature slots, each slot carries a fixed weight, and a
  * document's score is the sum of its tokens' weights.
  *
  * This implementation is the SCORING side (the model is an input; here
  * the weight table is a deterministic function of the bucket id so the
  * whole operator is reproducible and oracle-checkable).  Everything is
  * integer micro-units end-to-end — token hash, bucket, weight, sum —
  * so results are bit-exact under any partitioning.
  *
  * Scale design: the score is a PURE PER-ROW expression — token split,
  * char-fold hash, bucket lookup and weight sum all happen inside one
  * `aggregate` higher-order function over the token array.  No explode,
  * no join, no shuffle: a 100 TB corpus scores in a single map-only
  * scan, and the expression stays inside whole-stage codegen.  With a
  * real trained model the weight vector (buckets × 8 bytes) rides along
  * as a broadcast literal array — same shape, same plan.
  */
object Classifier {

  /** Polynomial char-fold hash of a token: `fold(0, (acc, c) =>
    * (acc*31 + codepoint(c)) % 1000003)` — small enough to stay exact
    * in 64-bit on both engines, standard enough that any SQL dialect
    * can mirror it.
    */
  private def tokenHash(tok: Column): Column =
    aggregate(regexp_extract_all(tok, lit("."), lit(0)), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 1000003)

  /** Deterministic per-bucket weight in integer micro-units, in
    * [-1_000_000, +1_000_000): a Knuth multiplicative scramble of the
    * bucket id.  Stands in for a trained weight vector.
    */
  private def bucketWeight(bucket: Column): Column =
    pmod(bucket * lit(2654435761L), lit(4294967296L)) % 2000001L - 1000000L

  /** Score every document: `(id, n_tokens, score_micro, keep)` where
    * `score_micro = Σ_tokens weight(hash(token) % buckets)` and
    * `keep = score_micro > 0`.
    */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val score = aggregate(toks, lit(0L),
      (acc, tok) => acc + bucketWeight(tokenHash(tok) % buckets))
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      score.as("score_micro"),
      (score > 0).as("keep"))
  }
}
