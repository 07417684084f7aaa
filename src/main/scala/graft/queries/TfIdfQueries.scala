package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CorpusStats, GraphOps, TfIdf, Triangles}

/** TF-IDF / vocabulary-coverage / graph-density gate battery —
  * [[graft.ops.TfIdf]] and [[graft.ops.Triangles]] over the documents
  * corpus:
  *
  *  - per-(doc, term) TF-IDF ranking (micro-nat exact)   q_tfidf
  *  - per-doc OOV rate vs the top-V vocabulary           q_oov_rate
  *  - per-token triangle counts on the co-occurrence
  *    graph (degree-ordered orientation)                 q_triangles
  *
  * The DuckDB twins mirror the tokenizer and round idf/ln terms to
  * integer micro-nats before any product or sum, so every compared
  * value is exact integer arithmetic.  The triangle edge threshold is
  * RELATIVE (n_pairs·100 ≥ max·80) so the fixture keeps a non-complete
  * graph shape at any scale factor instead of baking in an absolute
  * count that saturates as the corpus grows.
  */
object TfIdfQueries {
  type Q = (SparkSession, String) => DataFrame

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  /** Suffix letters for the big-vocab corpus: each document gains 20
    * unique tokens (`ua<doc_id>` … `ut<doc_id>`), inflating the
    * vocabulary to 20·n_docs + naturals — ≥10⁴ distinct tokens at
    * sf0.01, ≥10⁵ at sf0.1 — so the df-table join shape is exercised at
    * a vocabulary that could never be accidentally driver-resident.
    */
  private val bigVocabSuffixes: Seq[Char] = 'a' to 't'

  /** documents with the 20 per-doc unique suffix tokens appended. */
  private def bigVocabDocs(s: SparkSession, dir: String): DataFrame = {
    val sufs = bigVocabSuffixes.map(c =>
      concat(lit(s" u$c"), col("doc_id").cast("string")))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), concat(col("text") +: sufs: _*).as("text"))
  }

  /** The matching DuckDB text expression. */
  private val bigVocabTextSql: String =
    "concat(text" +
      bigVocabSuffixes.map(c => s", ' u$c', CAST(doc_id AS VARCHAR)").mkString +
      ")"

  val queries: Map[String, Q] = Map(
    "q_tfidf" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TfIdf.tfIdf(docs, "doc_id", "text")
        .orderBy(col("tfidf_micro").desc, col("doc_id"), col("tok"))
        .limit(100)
    },

    "q_oov_rate" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 25)
        .orderBy(col("oov_permille").desc, col("doc_id"))
        .limit(200)
    },

    "q_triangles" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 3)
      val mx = pairs.agg(max("n_pairs").as("mx"))
      val edges = pairs.crossJoin(broadcast(mx))
        .filter(col("n_pairs") * 100 >= col("mx") * 80)
        .select(col("w1").as("src"), col("w2").as("dst"))
      Triangles.perNode(edges)
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(50)
    },

    // k-core of the same co-occurrence graph: k is max-degree-relative
    // (max(2, maxDeg/2) — scale-proof the same way the triangle edge
    // threshold is), and exactly 3 peel rounds run so the DuckDB twin
    // can unroll them — the fixed-iteration contract pageRank's oracle
    // uses.  At sf0.01 the 80% graph has degree spread 1..18, so the
    // peel genuinely removes vertices and re-removes newly-exposed
    // ones; the fixpoint form (loud on budget exhaustion) is
    // golden-tested in SeriesGraphSpec.
    "q_kcore" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 3)
      val mx = pairs.agg(max("n_pairs").as("mx"))
      val edges = pairs.crossJoin(broadcast(mx))
        .filter(col("n_pairs") * 100 >= col("mx") * 80)
        .select(col("w1").as("src"), col("w2").as("dst"))
      GraphOps.kCorePeelRelative(edges, num = 1, den = 2, rounds = 3)
        .orderBy(desc("deg"), col("node"))
    },

    // TF-IDF at a ≥10⁴-token vocabulary (20 unique suffix tokens per
    // doc): the df table cannot be driver-resident by accident, so this
    // gate proves the unhinted shuffle-join shape end-to-end — exact
    // integer per-doc totals, oracle-matched.  Suffix tokens have df=1
    // ⇒ idf = ln(N); naturals keep their corpus idf.
    "q_tfidf_bigvocab" -> { (s, dir) =>
      val docs = bigVocabDocs(s, dir)
      TfIdf.tfIdf(docs, "doc_id", "text")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("tf")).cast("long").as("n_tokens"),
          sum(col("tfidf_micro")).cast("long").as("doc_tfidf_micro"))
        .orderBy(col("doc_id"))
    },

    // OOV at vocabSize = 10⁴ on the same inflated corpus: the top-V
    // boundary lands INSIDE the df=1 suffix band (20·n_docs singletons
    // ≥ 10⁴ at sf0.01), so the deterministic count-desc/token-asc
    // tiebreak is load-bearing, and the V-row vocab broadcast rides a
    // plan-visible TakeOrderedAndProject bound.
    "q_oov_bigvocab" -> { (s, dir) =>
      val docs = bigVocabDocs(s, dir)
      TfIdf.oovRate(docs, "doc_id", "text", vocabSize = 10000)
        .orderBy(col("doc_id"))
    },

    // Keyword extraction: top-3 terms per document by tf-idf, through
    // the custom TopKPerKey bounded-heap operator — no per-document
    // sort, the shuffle carries at most k rows per (partition, doc).
    "q_keyword_topk" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val scored = TfIdf.tfIdf(docs, "doc_id", "text")
        .filter(col("doc_id") < 100)
      graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
          Seq(col("tfidf_micro").desc, col("tok").asc), k = 3)
        .select(col("doc_id"), col("tok"), col("tfidf_micro"))
        .orderBy(col("doc_id"), col("tfidf_micro").desc, col("tok"))
    })

  val oracle: Map[String, String] = Map(
    "q_tfidf" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT doc_id, tok, tf,
        |  CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |    * 1000000, 0) AS BIGINT) AS idf_micro,
        |  CAST(tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |    * 1000000, 0) AS BIGINT) AS BIGINT) AS tfidf_micro
        |FROM tf JOIN dfq USING (tok) CROSS JOIN n
        |ORDER BY tfidf_micro DESC, doc_id, tok LIMIT 100""".stripMargin,

    "q_tfidf_bigvocab" ->
      s"""WITH docs AS (
        |  SELECT doc_id, $bigVocabTextSql AS text FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM docs),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |    * 1000000, 0) AS BIGINT)) AS BIGINT) AS doc_tfidf_micro
        |FROM tf JOIN dfq USING (tok) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_oov_bigvocab" ->
      s"""WITH docs AS (
        |  SELECT doc_id, $bigVocabTextSql AS text FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM docs),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |    ORDER BY n DESC, tok ASC LIMIT 10000)),
        |flagged AS (
        |  SELECT t.doc_id, v.tok AS v_tok
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(CASE WHEN v_tok IS NULL THEN 1 END) AS BIGINT) AS n_oov,
        |  CAST((count(CASE WHEN v_tok IS NULL THEN 1 END) * 1000)
        |    // count(*) AS BIGINT) AS oov_permille
        |FROM flagged GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_oov_rate" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |    ORDER BY n DESC, tok ASC LIMIT 25)),
        |flagged AS (
        |  SELECT t.doc_id, v.tok AS v_tok
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(CASE WHEN v_tok IS NULL THEN 1 END) AS BIGINT) AS n_oov,
        |  CAST((count(CASE WHEN v_tok IS NULL THEN 1 END) * 1000)
        |    // count(*) AS BIGINT) AS oov_permille
        |FROM flagged GROUP BY doc_id
        |ORDER BY oov_permille DESC, doc_id LIMIT 200""".stripMargin,

    "q_keyword_topk" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok,
        |    CAST(tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
        |      * 1000000, 0) AS BIGINT) AS BIGINT) AS tfidf_micro
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN n
        |  WHERE doc_id < 100)
        |SELECT doc_id, tok, tfidf_micro FROM (
        |  SELECT doc_id, tok, tfidf_micro,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf_micro DESC, tok ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 3
        |ORDER BY doc_id, tfidf_micro DESC, tok""".stripMargin,

    "q_kcore" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok,
        |    unnest(range(1, len($toksSql) + 1)) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT a.tok AS w1, b.tok AS w2, count(*) AS n_pairs
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
        |  GROUP BY 1, 2),
        |m AS (SELECT max(n_pairs) AS mx FROM pairs),
        |e0 AS (SELECT DISTINCT least(w1, w2) AS u, greatest(w1, w2) AS v
        |       FROM pairs, m WHERE n_pairs * 100 >= mx * 80 AND w1 <> w2),
        |d0 AS (SELECT n, count(*) AS d FROM (
        |  SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |kk AS (SELECT GREATEST(2, max(d) // 2) AS k FROM d0),
        |k1 AS (SELECT n FROM d0, kk WHERE d >= k),
        |e1 AS (SELECT u, v FROM e0 WHERE u IN (SELECT n FROM k1)
        |       AND v IN (SELECT n FROM k1)),
        |d2 AS (SELECT n, count(*) AS d FROM (
        |  SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY 1),
        |k2 AS (SELECT n FROM d2, kk WHERE d >= k),
        |e2 AS (SELECT u, v FROM e1 WHERE u IN (SELECT n FROM k2)
        |       AND v IN (SELECT n FROM k2)),
        |d3 AS (SELECT n, count(*) AS d FROM (
        |  SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY 1),
        |k3 AS (SELECT n FROM d3, kk WHERE d >= k),
        |e3 AS (SELECT u, v FROM e2 WHERE u IN (SELECT n FROM k3)
        |       AND v IN (SELECT n FROM k3))
        |SELECT n AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)
        |GROUP BY 1 ORDER BY deg DESC, node""".stripMargin,

    "q_triangles" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok,
        |    unnest(range(1, len($toksSql) + 1)) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT a.tok AS w1, b.tok AS w2, count(*) AS n_pairs
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
        |  GROUP BY 1, 2),
        |m AS (SELECT max(n_pairs) AS mx FROM pairs),
        |e AS (SELECT DISTINCT least(w1, w2) AS u, greatest(w1, w2) AS v
        |      FROM pairs, m WHERE n_pairs * 100 >= mx * 80 AND w1 <> w2),
        |tris AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT a AS node FROM tris
        |  UNION ALL SELECT b FROM tris
        |  UNION ALL SELECT c FROM tris)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM corners GROUP BY node
        |ORDER BY n_triangles DESC, node LIMIT 50""".stripMargin)
}
