package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF term weighting and vocabulary-coverage (OOV) scoring — the
  * retrieval/curation counterparts of [[CorpusStats]]'s language-model
  * scores.  TF-IDF ranks a document's most characteristic terms (sparse
  * retrieval, keyword extraction, near-dup explanation); OOV rate
  * measures how well a fixed tokenizer vocabulary covers a document —
  * a standard data-quality gate before pretraining (high-OOV docs are
  * often boilerplate, code, or the wrong language).
  *
  * Reference behavior: ushas exposes tf-idf/vocab coverage as corpus
  * scoring passes; here both are two-pass DataFrame aggregations.
  *
  * Determinism discipline (same as [[CorpusStats.unigramLogProb]]):
  * each idf is rounded to integer MICRO-NATS once per term, then every
  * downstream product/sum is integer arithmetic — bit-identical under
  * any partitioning, and exactly mirrored by a DuckDB oracle.
  */
object TfIdf {

  /** Per-(document, term) TF-IDF in integer micro-nat units.
    *
    * Pass 1: term frequencies per document (`tf`, corpus-sized but
    * map-side combined).  Pass 2: document frequencies per term (`df`,
    * vocabulary-sized — derived from tf, so it never re-scans text).
    * `idf_micro = round(1e6 · ln(N/df))`, computed once per term;
    * `tfidf_micro = tf · idf_micro` is exact integer math.
    *
    * Scale shape: the only corpus-sized shuffle is the (doc, term)
    * hash-aggregation; the scoring join tf ⋈ df-table is a plain
    * equi-join on `tok` — the df table is VOCABULARY-sized (unbounded:
    * billions of noise tokens on web text), so it carries no broadcast
    * hint; `tok` is already the shuffle key coming out of the tf
    * aggregation, and AQE broadcasts the df side automatically when it
    * actually is small.  Only the 1-row corpus count is force-broadcast.
    * Nothing here is quadratic and nothing collects.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("tok"), col("tf"),
        round(log(col("n_docs").cast("double") / col("df").cast("double"))
          * lit(1000000d), 0).cast("long").as("idf_micro"))
      .withColumn("tfidf_micro", (col("tf") * col("idf_micro")).cast("long"))
  }

  /** Per-document out-of-vocabulary rate against the top-`vocabSize`
    * corpus vocabulary (ranked by count desc, token asc — the tiebreak
    * makes the vocabulary boundary deterministic).
    *
    * The vocabulary is selected with `orderBy(...).limit(V)`, which
    * Spark plans as TakeOrderedAndProject — a distributed bounded-heap
    * top-k over the vocabulary-sized count table, never a single-task
    * global sort.  The membership join broadcasts the V-row vocab.
    * Returns exact integer counts plus `oov_permille = 1000·oov ÷ total`
    * (integer division — no FP in the result).
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok").as("v_tok"))
    toks.join(broadcast(vocab), col("tok") === col("v_tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("v_tok").isNull, 1)).as("n_oov"))
      .withColumn("oov_permille",
        // SQL `div` (integral), not Column./ (double division)
        expr("(n_oov * 1000) div n_tokens").cast("long"))
  }
}
