package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis
import graft.plans.TopK

/** Vocabulary induction + embedding pooling + ANSI-safe try_* family —
  * the remaining training-pipeline staples.
  */
object VocabQueries {
  type Q = (SparkSession, String) => DataFrame

  /** WordPiece demo vocabulary (single source of truth for the Spark
    * expression AND the DuckDB recursive-CTE oracle): every [a-y0-9]
    * single char as head and continuation (no 'z' — z-words go [UNK]),
    * plus multi-char pieces tuned to the synthetic corpus so greedy
    * longest-match genuinely multi-char-segments common words.
    */
  private[queries] val wpVocab: Seq[String] = {
    val singles = "abcdefghijklmnopqrstuvwxy0123456789".map(_.toString)
    singles ++ singles.map("##" + _) ++ Seq(
      "ta", "sc", "val", "fa", "sp", "cu", "qu", "wi", "co",
      "##ble", "##an", "##ue", "##st", "##ark", "##stomer", "##ery",
      "##ndow", "##lumn")
  }

  val queries: Map[String, Q] = Map(
    // Greedy longest-match WordPiece encoding via the codegen
    // expression: one expression call per document segments the whole
    // token array against an executor-resident vocabulary hash — no
    // vocab join, no UDF.  The oracle replays the greedy loop with a
    // recursive CTE + correlated longest-prefix subquery.
    "q_wordpiece" -> { (s, dir) =>
      import graft.functions.wordpiece_encode
      Tables.load(s, dir, "documents").filter(col("doc_id") < 80)
        .select(col("doc_id"),
          wordpiece_encode(TextAnalysis.tokens(col("text")), wpVocab)
            .as("__p"))
        .select(col("doc_id"),
          size(col("__p")).cast("long").as("n_pieces"),
          concat_ws(" ", col("__p")).as("pieces"))
        .orderBy(col("doc_id"))
    },

    // Tokenizer fertility by source over the DISTINCT-WORD frame —
    // each distinct (source, word) segments ONCE via the codegen
    // expression (vocabulary-sized work, never corpus-sized) and the
    // word counts weight the report: pieces-per-1k-words and UNK rate
    // are the read before committing a tokenizer to a domain mixture.
    "q_wp_fertility" -> { (s, dir) =>
      import graft.functions.wordpiece_encode
      val words = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
      words
        .withColumn("__p", wordpiece_encode(array(col("w")), wpVocab))
        .select(col("source"), col("n"),
          size(col("__p")).cast("long").as("np"),
          array_contains(col("__p"), "[UNK]").as("unk"))
        .groupBy(col("source"))
        .agg(sum(col("n")).cast("long").as("n_words"),
          sum(col("n") * col("np")).cast("long").as("n_pieces"),
          sum(when(col("unk"), col("n")).otherwise(0L)).cast("long")
            .as("n_unk"),
          count(lit(1)).as("n_distinct_words"))
        .selectExpr("source", "n_words", "n_pieces", "n_unk",
          "n_distinct_words",
          "CAST((CAST(n_pieces AS DECIMAL(38,0)) * 1000) div n_words " +
            "AS BIGINT) AS pieces_per_kword",
          "CAST((CAST(n_unk AS DECIMAL(38,0)) * 1000000) div n_words " +
            "AS BIGINT) AS unk_ppm")
        .orderBy(col("source"))
    },

    // Vocabulary coverage-at-V: what token mass do the top-50/200/1000
    // types cover?  The vocab-size decision curve — top-max(V) types
    // come through the bounded TakeOrdered, never a vocab-wide window.
    "q_vocab_coverage" -> { (s, dir) =>
      graft.ops.CorpusStats.vocabCoverage(
        Tables.load(s, dir, "documents"), "text", Seq(50, 200, 1000))
    },

    // Zipf power-law fit over the top-500 rank-frequency points:
    // per-point integer micro-nat logs, exact DECIMAL(38,0) OLS
    // moments, one double division chain — natural text lands near
    // slope −1; the gate pins the fit bit-for-bit vs DuckDB.
    "q_zipf_fit" -> { (s, dir) =>
      graft.ops.CorpusStats.zipfFit(
        Tables.load(s, dir, "documents"), "text", topV = 500)
    },

    // Tokenizer vocabulary induction: top-10 tokens per language by
    // frequency.  Explode → hash-agg (map-side combine collapses the
    // token stream per partition) → the custom TopKPerKey heap operator
    // (no per-language sort).  At 100 TB the shuffle carries one row
    // per distinct (lang, token) per partition — vocabulary-sized, not
    // corpus-sized.
    "q_vocab_topk" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val counts = docs
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("n"))
      TopK.perKey(counts, Seq(col("lang")),
          Seq(col("n").desc, col("tok").asc), k = 10)
        .select(col("lang"), col("tok"), col("n"))
        .orderBy(col("lang"), desc("n"), asc("tok"))
    },

    // Per-label mean embedding (centroid export for distillation /
    // data-mix analysis), first 4 dimensions through the oracle.
    // posexplode + partial agg: the shuffle carries (label, dim)
    // partial sums — k·d groups — regardless of corpus size.
    "q_embed_pool" -> { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .filter(col("dim") < 4)
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("x").cast("double")), 6).as("mean_x"))
        .orderBy(col("label"), col("dim"))
    },

    // ANSI-mode-safe arithmetic: try_divide / try_add / try_cast return
    // NULL where strict ANSI (Spark 4 default) would raise.
    "q_try_functions" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_nationkey,
          |  round(try_divide(100, n_nationkey), 6) AS d,
          |  try_add(9223372036854775800, CAST(n_nationkey AS BIGINT) * 10) AS big,
          |  try_cast(CASE WHEN n_nationkey < 5 THEN CAST(n_nationkey AS STRING)
          |           ELSE n_name END AS INT) AS cst
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_wordpiece" -> {
      val values = wpVocab.map(p => s"('$p')").mkString(", ")
      s"""WITH RECURSIVE base AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks
        |  FROM documents WHERE doc_id < 80),
        |words AS (
        |  SELECT doc_id, widx, toks[widx] AS w FROM (
        |    SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS widx
        |    FROM base)),
        |vocab(piece) AS (VALUES $values),
        |seg(doc_id, widx, rest, pieces, step) AS (
        |  SELECT doc_id, widx, w, CAST([] AS VARCHAR[]), 0 FROM words
        |  UNION ALL
        |  SELECT doc_id, widx,
        |    CASE WHEN nxt IS NULL THEN ''
        |         ELSE substr(rest, CASE WHEN step = 0 THEN len(nxt) + 1
        |                                ELSE len(nxt) - 1 END, 100000) END,
        |    CASE WHEN nxt IS NULL THEN ['[UNK]']
        |         ELSE list_append(pieces, nxt) END,
        |    step + 1
        |  FROM (
        |    SELECT doc_id, widx, rest, pieces, step,
        |      (SELECT piece FROM vocab
        |        WHERE CASE WHEN step = 0
        |              THEN NOT starts_with(piece, '##')
        |                AND starts_with(rest, piece)
        |              ELSE starts_with(piece, '##')
        |                AND starts_with(rest, substr(piece, 3, 100000)) END
        |        ORDER BY len(piece) DESC, piece LIMIT 1) AS nxt
        |    FROM seg WHERE len(rest) > 0 AND step < 64)),
        |fin AS (
        |  SELECT doc_id, widx, pieces FROM seg WHERE len(rest) = 0),
        |agg AS (
        |  SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
        |    string_agg(array_to_string(pieces, ' '), ' ' ORDER BY widx)
        |      AS pieces
        |  FROM fin GROUP BY 1)
        |SELECT b.doc_id, CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
        |  coalesce(a.pieces, '') AS pieces
        |FROM (SELECT DISTINCT doc_id FROM base) b
        |LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin
    },

    "q_vocab_coverage" ->
      """WITH c AS (SELECT w, count(*) AS n FROM (
        |    SELECT unnest(regexp_extract_all(lower(text),
        |      '[a-z0-9'']+')) AS w FROM documents) GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w ASC)
        |    AS rk FROM c),
        |v(vocab_size) AS (VALUES (50), (200), (1000)),
        |a AS (SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
        |    CAST(sum(CASE WHEN rk <= vocab_size THEN n ELSE 0 END)
        |      AS BIGINT) AS covered
        |  FROM r CROSS JOIN v GROUP BY 1)
        |SELECT vocab_size, covered, total,
        |  CAST(CASE WHEN total > 0 THEN
        |    (CAST(covered AS HUGEINT) * 1000000) // total
        |    ELSE -1 END AS BIGINT) AS coverage_ppm
        |FROM a CROSS JOIN t ORDER BY vocab_size""".stripMargin,

    "q_zipf_fit" ->
      """WITH c AS (SELECT w, count(*) AS n FROM (
        |    SELECT unnest(regexp_extract_all(lower(text),
        |      '[a-z0-9'']+')) AS w FROM documents) GROUP BY 1),
        |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w ASC)
        |    AS rk FROM c ORDER BY n DESC, w ASC LIMIT 500),
        |p AS (SELECT
        |    CAST(round(ln(CAST(rk AS DOUBLE)) * 1000000, 0) AS BIGINT)
        |      AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)
        |      AS y
        |  FROM r),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM p)
        |SELECT n_points,
        |  round(CAST(n_points * sxy - sx * sy AS DOUBLE)
        |    / CAST(n_points * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
        |  round((CAST(sy AS DOUBLE)
        |      - CAST(n_points * sxy - sx * sy AS DOUBLE)
        |        / CAST(n_points * sxx - sx * sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n_points AS DOUBLE) / 1000000, 6) AS ln_c
        |FROM m WHERE n_points * sxx - sx * sx <> 0""".stripMargin,

    "q_wp_fertility" -> {
      val values = wpVocab.map(p => s"('$p')").mkString(", ")
      s"""WITH RECURSIVE base AS (
        |  SELECT source, regexp_extract_all(lower(text), '[a-z0-9'']+')
        |    AS toks
        |  FROM documents WHERE doc_id < 200),
        |wc AS (SELECT source, w, count(*) AS n FROM (
        |    SELECT source, unnest(toks) AS w FROM base) GROUP BY 1, 2),
        |dw AS (SELECT DISTINCT w FROM wc),
        |vocab(piece) AS (VALUES $values),
        |seg(w, rest, np, unk, step) AS (
        |  SELECT w, w, 0, FALSE, 0 FROM dw
        |  UNION ALL
        |  SELECT w,
        |    CASE WHEN nxt IS NULL THEN ''
        |         ELSE substr(rest, CASE WHEN step = 0 THEN len(nxt) + 1
        |                                ELSE len(nxt) - 1 END, 100000) END,
        |    CASE WHEN nxt IS NULL THEN 1 ELSE np + 1 END,
        |    nxt IS NULL OR unk, step + 1
        |  FROM (
        |    SELECT w, rest, np, unk, step,
        |      (SELECT piece FROM vocab
        |        WHERE CASE WHEN step = 0
        |              THEN NOT starts_with(piece, '##')
        |                AND starts_with(rest, piece)
        |              ELSE starts_with(piece, '##')
        |                AND starts_with(rest, substr(piece, 3, 100000)) END
        |        ORDER BY len(piece) DESC, piece LIMIT 1) AS nxt
        |    FROM seg WHERE len(rest) > 0 AND step < 64)),
        |fin AS (SELECT w, np, unk FROM seg WHERE len(rest) = 0),
        |a AS (SELECT wc.source, CAST(sum(wc.n) AS BIGINT) AS n_words,
        |    CAST(sum(wc.n * fin.np) AS BIGINT) AS n_pieces,
        |    CAST(sum(CASE WHEN fin.unk THEN wc.n ELSE 0 END) AS BIGINT)
        |      AS n_unk,
        |    CAST(count(*) AS BIGINT) AS n_distinct_words
        |  FROM wc JOIN fin ON wc.w = fin.w GROUP BY 1)
        |SELECT source, n_words, n_pieces, n_unk, n_distinct_words,
        |  CAST((CAST(n_pieces AS HUGEINT) * 1000) // n_words AS BIGINT)
        |    AS pieces_per_kword,
        |  CAST((CAST(n_unk AS HUGEINT) * 1000000) // n_words AS BIGINT)
        |    AS unk_ppm
        |FROM a ORDER BY source""".stripMargin
    },

    "q_vocab_topk" ->
      """SELECT lang, tok, n FROM (
        |  SELECT lang, tok, n,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS rn
        |  FROM (
        |    SELECT lang, tok, count(*) AS n FROM (
        |      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS tok
        |      FROM documents)
        |    GROUP BY lang, tok))
        |WHERE rn <= 10
        |ORDER BY lang, n DESC, tok ASC""".stripMargin,
    "q_embed_pool" ->
      """SELECT label, CAST(i - 1 AS INT) AS dim,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_x
        |FROM embeddings, range(1, 5) t(i)
        |GROUP BY label, i ORDER BY label, dim""".stripMargin,
    "q_try_functions" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey = 0 THEN NULL
        |       ELSE round(100.0 / n_nationkey, 6) END AS d,
        |  CASE WHEN n_nationkey = 0 THEN 9223372036854775800 ELSE NULL END AS big,
        |  CASE WHEN n_nationkey < 5 THEN n_nationkey ELSE TRY_CAST(n_name AS INT) END AS cst
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
