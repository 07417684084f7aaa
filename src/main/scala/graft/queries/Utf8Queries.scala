package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Non-ASCII (UTF-8) parity gates — the oracle-bug class flushed in
  * round 11: any DuckDB twin written with byte-based builtins
  * (`strlen`, byte `substr`) silently diverges from Spark's
  * character-based semantics the day the corpus grows a CJK or
  * accented document.  The driver corpus is ASCII-only, so these gates
  * synthesize mixed-script text IN-QUERY with a deterministic suffix
  * keyed by doc_id (the q_script_mix device — identical literal CASE
  * on both engines) and route the four representative text pipelines
  * over it: character entropy, content-defined chunking, winnowing
  * fingerprints (over a Unicode-aware tokenizer), and readability.
  *
  * Parity ground rules proven here and recorded in CLAUDE.md:
  * DuckDB `length`/`substr`/`t[i]`/`unicode` are CHARACTER-based and
  * match Spark `length`/`substr`/`split(t,'')`/`ascii` codepoint for
  * codepoint on BMP text; DuckDB `strlen` is BYTES and must never
  * appear in an oracle.  All suffix scripts are BMP (Cyrillic, Han,
  * Greek, Latin-1 accents) — astral chars (emoji) additionally split
  * Java's UTF-16 `charAt`/`split("")` into surrogate halves and are a
  * documented non-goal of the char-level kernels.
  *
  * Scale shape: each gate is the SAME pipeline as its ASCII sibling
  * (q_char_entropy, q_cdc_chunks, q_winnow, q_readability) — one
  * projection adds the suffix, nothing about partitioning or shuffle
  * changes.
  */
object Utf8Queries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic mixed-script suffix, keyed by doc_id mod 4. */
  private def mixed =
    concat(col("text"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit(" привет мир это тест"))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit(" 你好 世界 数据"))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit(" γειά σου κόσμε"))
        .otherwise(lit(" déjà vu naïve café")))

  private val mixedSql =
    """text || CASE WHEN doc_id % 4 = 0 THEN ' привет мир это тест'
      |  WHEN doc_id % 4 = 1 THEN ' 你好 世界 数据'
      |  WHEN doc_id % 4 = 2 THEN ' γειά σου κόσμε'
      |  ELSE ' déjà vu naïve café' END""".stripMargin

  /** Unicode-aware tokenizer for the winnow gate: letters/digits of
    * ANY script (the ASCII default drops every non-Latin token).
    */
  private def uniTokens(t: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(t), lit("[\\p{L}\\p{N}']+"), lit(0))

  val queries: Map[String, Q] = Map(
    // Character Shannon entropy over mixed-script text: every suffix
    // character lands in the per-char distribution, so a byte-based
    // twin (13 "chars" for 6) or UTF-16 splitting shifts both n_chars
    // and the entropy.
    "q_utf8_entropy" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), mixed.as("mtext"))
      graft.ops.TextAnalysis.charEntropy(docs, "doc_id", "mtext")
        .orderBy(col("doc_id"))
    },

    // Content-defined chunking over mixed-script text: the rolling
    // base-31 hash folds CODEPOINTS, so chunk boundaries (and the
    // dedup summary) are identical across engines only if both index
    // characters, not bytes.
    "q_utf8_cdc" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), mixed.as("mtext"))
      graft.ops.Cdc.dedupSummary(docs, "doc_id", "mtext")
    },

    // Winnowing fingerprints over Unicode tokens of mixed-script text:
    // the suffix contributes real Cyrillic/Han/Greek grams (the ASCII
    // tokenizer would silently drop them all), and the argmin-packed
    // selection depends on the codepoint-exact gram hash on both
    // engines.
    "q_utf8_winnow" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), mixed.as("mtext"))
      val fp = graft.ops.Dedup.winnowedFingerprintsOf(
        docs, "doc_id", uniTokens(col("mtext")), k = 2, w = 4)
      docs.select(col("doc_id"))
        .join(fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"),
          sum(col("fp_hash")).cast("long").as("h_sum")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_fp"), lit(0L)).cast("long").as("n_fp"),
          coalesce(col("h_sum"), lit(0L)).cast("long").as("h_sum"))
        .orderBy(col("doc_id"))
    },

    // Readability over mixed-script text: the ASCII word/sentence/
    // vowel-run counts must be UNCHANGED by interleaved non-ASCII
    // characters — a byte-level regex engine that matched continuation
    // bytes (or a twin using strlen anywhere) shifts the totals.
    "q_utf8_readability" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("source"), mixed.as("mtext"))
      graft.ops.TextAnalysis.readability(docs, "source", "mtext")
        .orderBy(col("source"))
    })

  val oracle: Map[String, String] = Map(
    "q_utf8_entropy" ->
      s"""WITH m AS (
        |  SELECT doc_id, $mixedSql AS t
        |  FROM documents WHERE doc_id < 150),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(t) + 1),
        |      i -> t[i])) AS c
        |  FROM m),
        |pc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
        |  count(*) AS n_distinct_chars,
        |  round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4) AS entropy
        |FROM pc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_utf8_cdc" ->
      s"""WITH m AS (
        |  SELECT doc_id, $mixedSql AS mt
        |  FROM documents WHERE doc_id < 200),
        |docs AS (
        |  SELECT doc_id, substr(mt, 1, 2048) AS t FROM m
        |  WHERE length(substr(mt, 1, 2048)) >= 1),
        |chars AS (
        |  SELECT doc_id, CAST(p AS BIGINT) AS p,
        |         substr(t, CAST(p AS INTEGER), 1) AS c
        |  FROM (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS p
        |        FROM docs)),
        |rolled AS (
        |  SELECT doc_id, p, c,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(
        |        list(c) OVER win, x -> CAST(ord(x) AS BIGINT)),
        |      (a, x) -> (a * 31 + x) % 2147483648) AS h
        |  FROM chars
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY p
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
        |flagged AS (
        |  SELECT doc_id, p, c,
        |    CASE WHEN p >= 8 AND h % 64 = 0 THEN 1 ELSE 0 END AS b
        |  FROM rolled),
        |assigned AS (
        |  SELECT doc_id, p, c,
        |    coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk
        |  FROM flagged),
        |ch AS (
        |  SELECT doc_id, chunk, count(*) AS chunk_len,
        |    list_reduce([CAST(0 AS BIGINT)] || list_transform(
        |        list(c ORDER BY p), x -> CAST(ord(x) AS BIGINT)),
        |      (a, x) -> (a * 31 + x) % 2147483648) AS chunk_hash
        |  FROM assigned GROUP BY 1, 2),
        |d AS (SELECT chunk_hash, chunk_len, count(*) AS n
        |      FROM ch GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
        |               CAST(sum(chunk_len) AS BIGINT) AS chars_total
        |        FROM ch),
        |uni AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
        |               CAST(sum(chunk_len) AS BIGINT) AS chars_unique
        |        FROM d)
        |SELECT n_chunks, n_distinct, chars_total, chars_unique,
        |  (chars_total - chars_unique) * 1000000 // chars_total
        |    AS dup_ratio_micro
        |FROM tot, uni""".stripMargin,

    "q_utf8_winnow" ->
      s"""WITH m AS (
        |  SELECT doc_id, $mixedSql AS mt
        |  FROM documents WHERE doc_id < 150),
        |t AS (
        |  SELECT doc_id AS id,
        |    regexp_extract_all(lower(mt), '[\\p{L}\\p{N}'']+') AS toks
        |  FROM m),
        |grams AS (
        |  SELECT id, i - 1 AS pos,
        |    list_reduce(list_transform(
        |      range(1, len(array_to_string(toks[i:i+1], ' ')) + 1),
        |      j -> CAST(unicode(array_to_string(toks[i:i+1], ' ')[j]) AS BIGINT)),
        |      (a, b) -> (a * 31 + b) % 2147483648) AS h
        |  FROM (SELECT id, toks, unnest(range(1, len(toks))) AS i FROM t)),
        |keyed AS (
        |  SELECT id, pos,
        |    h * CAST(2147483648 AS BIGINT) + (2147483647 - pos) AS kk
        |  FROM grams),
        |mm AS (SELECT id, count(*) AS n FROM grams GROUP BY 1),
        |sel AS (
        |  SELECT g.id, s.s, min(g.kk) AS mk
        |  FROM keyed g
        |  JOIN (SELECT id, unnest(range(0, n - 3)) AS s FROM mm) s
        |    ON g.id = s.id AND g.pos BETWEEN s.s AND s.s + 3
        |  GROUP BY 1, 2),
        |fp AS (SELECT DISTINCT id, mk FROM sel),
        |agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_fp,
        |          CAST(sum(mk // 2147483648) AS BIGINT) AS h_sum
        |        FROM fp GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
        |       CAST(coalesce(a.h_sum, 0) AS BIGINT) AS h_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 150) d
        |LEFT JOIN agg a ON a.id = d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q_utf8_readability" ->
      s"""WITH m AS (SELECT source, $mixedSql AS t FROM documents),
        |d AS (SELECT source,
        |    len(regexp_extract_all(lower(t), '[a-z0-9'']+')) AS w,
        |    greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS s,
        |    len(regexp_extract_all(lower(t), '[aeiouy]+')) AS y
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST(sum(s) AS BIGINT) AS sentences,
        |  CAST(sum(y) AS BIGINT) AS syllables,
        |  round(206.835
        |    - 1.015 * CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE)
        |    - 84.6 * CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
        |    AS flesch
        |FROM d WHERE w > 0 GROUP BY source ORDER BY source""".stripMargin)
}
