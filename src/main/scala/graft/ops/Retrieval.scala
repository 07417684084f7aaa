package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** Distributed lexical retrieval: a BM25 inverted index and top-k
  * search over a document corpus (Robertson/Lucene BM25 — the idf is
  * `ln((N - df + 0.5)/(df + 0.5) + 1)`, always positive).
  *
  * Scale design: the index build is two hash aggregations over the
  * exploded token stream (map-side combine collapses each partition's
  * token stream first, so the shuffle carries (doc, token) partials —
  * posting-list-sized, not corpus-sized).  Scoring joins the QUERY
  * term table — tiny, explicitly broadcast — to the postings, so the
  * corpus-side shuffle is only the per-(query, doc) partial-sum
  * aggregation of matching postings.  The document-frequency and
  * corpus-stats side tables are vocabulary-sized / single-row and
  * broadcast.  Nothing is ever quadratic in the corpus and the final
  * top-k uses the bounded-heap [[graft.plans.TopKPerKey]] operator
  * (no global sort).
  *
  * Determinism: idf is rounded to integer micro-nats and each
  * per-term score to an integer micro-unit BEFORE the per-document
  * sum — integer addition is associative, so results are bit-identical
  * under any partitioning (the [[CorpusStats]] micro-nat recipe).
  */
object Retrieval {

  /** Score `queries` (idCol `qid`, text col `qtext`) against the corpus
    * and keep the top `k` docs per query.
    *
    * Repeated query terms are collapsed (standard BM25 with query-term
    * frequency 1).  Returns (qid, docId, score_micro, n_terms_hit);
    * score_micro is the BM25 score in integer micro-units.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy("__doc", "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("__doc").agg(count(lit(1)).as("dl"))
    // single-row corpus stats: doc count and average doc length (an
    // exact integer ratio evaluated once, identically on any engine)
    val stats = toks.agg(count(lit(1)).as("n_toks"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"),
        (col("n_toks").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("tok"), col("n_docs"), col("avgdl"),
        round(log((col("n_docs").cast("double") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)) + lit(1.0)) * lit(1000000d), 0)
          .cast("long").as("idf_micro"))
    val qt = queries.select(col("qid"),
        explode(TextAnalysis.tokens(col("qtext"))).as("tok"))
      .distinct()
    val scored = tf.join(dl, "__doc")
      .join(idf, "tok")
      .join(broadcast(qt), "tok")
      .select(col("qid"), col("__doc"),
        round(col("idf_micro")
            * (col("tf") * (lit(k1) + lit(1.0)))
            / (col("tf") + lit(k1)
              * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 0)
          .cast("long").as("term_micro"))
      .groupBy("qid", "__doc")
      .agg(sum("term_micro").cast("long").as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
    TopK.perKey(scored, Seq(col("qid")),
        Seq(col("score_micro").desc, col("__doc").asc), k)
      .select(col("qid"), col("__doc").as(idCol), col("score_micro"),
        col("n_terms_hit"))
  }

  /** More-like-this retrieval (the Lucene MLT recipe): for each query
    * DOCUMENT, select its `mTerms` most characteristic terms by
    * tf-idf (deterministic desc-score / asc-token tiebreak via the
    * bounded-heap [[graft.plans.TopKPerKey]]) and BM25-search the
    * corpus with those terms; the query document itself is excluded
    * from its results.  Term selection and scoring are both integer
    * micro-unit exact, so the whole composition is bit-deterministic
    * and oracle-checkable end to end.
    *
    * Self-exclusion contract: the BM25 pass keeps k+1 hits, the self
    * row (at most one) is dropped, and the survivors re-rank to k —
    * provably equal to ranking the non-self candidates directly.
    *
    * @return (qid, idCol, score_micro, rank) — top-k similar docs per
    *         query document
    */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
      queryIds: Seq[Long], mTerms: Int = 5, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryIds.nonEmpty && mTerms >= 1 && k >= 1)
    val terms = TfIdf.tfIdf(docs, idCol, textCol)
      .filter(col("doc_id").isin(queryIds: _*))
    val top = TopK.perKey(terms, Seq(col("doc_id")),
      Seq(col("tfidf_micro").desc, col("tok").asc), mTerms)
    val queries = top.groupBy(col("doc_id").as("qid"))
      .agg(concat_ws(" ", sort_array(collect_list(col("tok")))).as("qtext"))
    val hits = bm25TopK(docs, idCol, textCol, queries, k + 1)
      .filter(col(idCol) =!= col("qid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    hits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol), col("score_micro"), col("rank"))
  }

  /** Hybrid lexical + semantic retrieval fused with reciprocal-rank
    * fusion (Cormack/Clarke/Buettcher, SIGIR'09): each ranker
    * contributes `round(10⁶ / (c + rank))` micro-units for its top
    * `kEach` docs, contributions sum per (query, doc), and the fused
    * top `k` is kept.  RRF needs no score calibration between the
    * incommensurable BM25 and cosine scales — only ranks — and the
    * micro-unit contributions are integers derived from integer ranks,
    * so the fusion is bit-deterministic under any partitioning.
    *
    * Scale design: the lexical side is [[bm25TopK]] (posting-list
    * joins, broadcast query terms, bounded-heap top-k).  The semantic
    * side here scores the embedding table exactly against the
    * broadcast query vectors (one corpus pass — right whenever
    * |queries| is small); at billion-vector scale swap in any ANN
    * ranking from [[Similarity]] / [[Pq]] — the fusion only consumes
    * (query, doc, rank) rows.  Both rank windows are over kEach rows
    * per query, never corpus-sized.
    *
    * @param docs    corpus with (idCol, textCol)
    * @param emb     embedding table with (vecIdCol = doc key, vecCol)
    * @param queries (qid, qtext, qvec) — text and vector per query
    * @return (qid, idCol, rrf_micro, n_rankers) top-k per query
    */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String,
      queries: DataFrame, k: Int, kEach: Int = 10,
      c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.cosine_sim
    val lex = bm25TopK(docs, idCol, textCol,
        queries.select(col("qid"), col("qtext")), kEach)
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("score_micro").desc, col(idCol).asc)))
      .select(col("qid"), col(idCol).as("__doc"), col("rank"))
    val cvecs = emb.select(col(vecIdCol).as("corpus_id"), col(vecCol).as("cvec"))
    val qvecs = queries.select(col("qid").as("query_id"), col("qvec"))
    val sem = Similarity.rankTopK(cvecs.crossJoin(broadcast(qvecs))
        .select(col("query_id"), col("corpus_id"),
          cosine_sim(col("qvec"), col("cvec")).as("cos")), kEach)
      .select(col("query_id").as("qid"), col("corpus_id").as("__doc"),
        col("rank"))
    val fused = lex.union(sem)
      .select(col("qid"), col("__doc"),
        round(lit(1000000.0) / (lit(c) + col("rank")), 0)
          .cast("long").as("rr_micro"))
      .groupBy(col("qid"), col("__doc"))
      .agg(sum("rr_micro").cast("long").as("rrf_micro"),
        count(lit(1)).cast("long").as("n_rankers"))
    TopK.perKey(fused, Seq(col("qid")),
        Seq(col("rrf_micro").desc, col("__doc").asc), k)
      .select(col("qid"), col("__doc").as(idCol), col("rrf_micro"),
        col("n_rankers"))
  }

  /** Offline retrieval evaluation — recall@k, MRR@k, and graded
    * nDCG@k per query, the report every retrieval/dedup index change
    * is judged by.
    *
    * Determinism: each DCG term `(2^rel − 1)/log₂(rank+1)` is rounded
    * to integer micro-units BEFORE the per-query sum (the
    * [[bm25TopK]] idf_micro recipe — integer addition commutes, so
    * partitioning cannot change the sum), recall and MRR are integer
    * ratios (`·10⁶ div`), and only the final nDCG ratio divides two
    * exact integers.
    *
    * Scale shape: the run is k-bounded per query by contract; the
    * ideal ranking for IDCG goes through the bounded-heap
    * [[graft.plans.TopKPerKey]] (never a window over the gold frame,
    * whose per-query size is unbounded); the only windows run over
    * ≤ k rows per query.  Everything joins on (query, doc) — fixed-
    * width shuffle keys.
    *
    * @param run  ranked results: (qidCol, docCol, rankCol), rank
    *             1-based; rows with rank > k are ignored
    * @param gold graded labels: (qidCol, docCol, relCol), rel ≥ 1
    *             (filter zeros upstream); ties in rel break by doc id
    *             for the ideal ranking, which cannot change IDCG
    * @return one row per query with gold labels: (qidCol, n_rel,
    *         n_rel_ret, first_rel_rank ∈ [1,k] — 0 when no relevant
    *         doc was retrieved — recall_micro, mrr_micro, dcg_micro,
    *         idcg_micro, ndcg)
    */
  def evalMetrics(run: DataFrame, gold: DataFrame, qidCol: String,
      docCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val dcgTerm = round((pow(lit(2.0), col(relCol)) - 1.0)
      / log2(col(rankCol) + 1.0) * 1000000d, 0).cast("long")
    val g = gold.filter(col(relCol) > 0)
    val nrel = g.groupBy(col(qidCol)).agg(count(lit(1)).as("n_rel"))
    val ideal = TopK.perKey(g, Seq(col(qidCol)),
        Seq(col(relCol).desc, col(docCol).asc), k)
      .withColumn(rankCol, row_number().over(Window.partitionBy(col(qidCol))
        .orderBy(col(relCol).desc, col(docCol).asc)))
    val idcg = ideal.groupBy(col(qidCol))
      .agg(sum(dcgTerm).cast("long").as("idcg_micro"))
    val hits = run.filter(col(rankCol) <= k)
      .join(g, Seq(qidCol, docCol))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_rel_ret"),
        min(col(rankCol)).cast("long").as("first_rel_rank"),
        sum(dcgTerm).cast("long").as("dcg_micro"))
    nrel.join(idcg, Seq(qidCol))
      .join(hits, Seq(qidCol), "left")
      .select(col(qidCol), col("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        expr("coalesce(n_rel_ret, 0) * 1000000 div n_rel").as("recall_micro"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("mrr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        col("idcg_micro"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double")
          / col("idcg_micro").cast("double"), 6).as("ndcg"))
  }
}
