package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Bpe, CorpusStats, Dedup}

/** Corpus-statistics gate battery — the training-data operators in
  * [[graft.ops.CorpusStats]] plus two shared-text layout shapes:
  *
  *  - unigram LM quality scoring (micro-nat exact)      q_lm_score
  *  - skip-gram co-occurrence pair counts               q_cooccurrence
  *  - deterministic source-interleaved shuffle order    q_interleaved_shuffle
  *  - padding-efficiency length bucketing               q_length_buckets
  *
  * DuckDB mirrors the tokenizer with `regexp_extract_all` + zipped
  * `unnest`; log terms are rounded to integer micro-nats BEFORE summing
  * so both engines aggregate exact integers (FP addition is not
  * associative; integer addition is).
  */
object CorpusQueries {
  type Q = (SparkSession, String) => DataFrame

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  val queries: Map[String, Q] = Map(
    // Heaps-law vocabulary-growth curve: exact (n_tokens, vocab) at
    // three corpus prefixes from ONE token scan (vocab@cut counted
    // from per-token FIRST-occurrence ids — no per-cut rescan).  The
    // tokenizer-vocab-sizing curve, oracle-exact at every cut.
    "q_vocab_growth" -> { (s, dir) =>
      graft.ops.CorpusStats.vocabGrowth(Tables.load(s, dir, "documents"),
        "doc_id", "text", cuts = Seq(100L, 250L, 1000000000L))
    },

    // Heaps-law exponent over five corpus prefixes: the vocab ≈ K·T^β
    // fit (β ~ 0.4-0.6 for natural text) — micro-nat logs + exact
    // DECIMAL OLS moments, bit-identical vs the DuckDB replay.
    "q_heaps_fit" -> { (s, dir) =>
      graft.ops.CorpusStats.heapsFit(Tables.load(s, dir, "documents"),
        "doc_id", "text", cuts = Seq(25L, 50L, 100L, 200L, 400L))
    },

    // Pairwise Jensen-Shannon divergence between source unigram
    // distributions — the source-redundancy matrix mixture design
    // reads; per-token micro-nat ln terms, closed-form ln2 private
    // mass, one sign-split integral ppm division per pair.
    "q_source_jsd" -> { (s, dir) =>
      graft.ops.CorpusStats.sourceJsd(
          Tables.load(s, dir, "documents"), "source", "text")
        .orderBy(col("src_a"), col("src_b"))
    },
    "q_lm_score" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      CorpusStats.unigramLogProb(docs, "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    // DoReMi-style multiplicative-weights mixture step: domains with
    // above-average per-token LM loss upweight by exp(eta * excess),
    // softmax-normalized over the domain frame.  Integer micro-nat
    // losses; one IEEE division per domain; oracle replays exactly.
    "q_domain_reweight" -> { (s, dir) =>
      CorpusStats.domainReweight(Tables.load(s, dir, "documents"),
        "source", "doc_id", "text", eta = 0.5)
    },

    "q_cooccurrence" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 3)
        .filter(col("n_pairs") >= 80)
        .orderBy(col("n_pairs").desc, col("w1"), col("w2")).limit(50)
    },

    "q_interleaved_shuffle" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      CorpusStats.interleavedOrder(docs, "doc_id", "source")
        .orderBy(col("rn"), col("hkey"), col("doc_id")).limit(200)
    },

    "q_length_buckets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(lengthBucketsSql)
    },

    // PPMI word association over the window-3 skip-gram table: strong
    // collocations rank first.  One ln per output row in integer
    // micro-nats — bit-exact vs the DuckDB twin.
    "q_ppmi" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = CorpusStats.skipGramPairs(docs, "doc_id", "text", window = 3)
        .filter(col("n_pairs") >= 40)
      CorpusStats.ppmi(pairs)
        .orderBy(col("ppmi_micro").desc, col("w1"), col("w2")).limit(50)
    },

    // Stratified exact-N sampling: 5 docs per (lang, source) stratum,
    // chosen by deterministic hash rank — reproducible, single shuffle.
    "q_stratified_sample" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(stratifiedSql)
    },

    // Top-p (nucleus) source selection: smallest prefix of sources,
    // by descending doc count, covering ≥90% of the corpus.
    "q_source_topp" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(toppSql)
    },

    // DSIR importance selection: score every document by how much the
    // src0-domain unigram model likes it vs the corpus model; keep the
    // top 50.  src0's own docs should dominate — and do.
    "q_dsir_select" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      CorpusStats.importanceScores(docs, "doc_id", "text",
          col("source") === "src0")
        .orderBy(col("dsir_micro").desc, col("doc_id")).limit(50)
    },

    // One Viterbi-EM round of unigram-LM tokenizer training: integer
    // micro-nat piece costs, min-cost segmentation of the distinct-word
    // table via the integer-DP expression (ties to the smallest piece
    // sequence), frequency-weighted usage counts, re-derived costs.
    // The oracle enumerates EVERY segmentation of each distinct word
    // with a recursive CTE and picks the same (cost, path) argmin.
    "q_unigram_em" -> { (s, dir) =>
      graft.ops.Unigram.viterbiEmRound(
        Tables.load(s, dir, "documents"), "text", unigramVocab)
    },

    // Distributed BPE vocabulary learning: 3 merge rounds over the
    // corpus word table.  The DuckDB twin unrolls the same 3 rounds
    // with list_reduce folds — merge rules and weighted pair counts
    // must agree exactly.
    "q_bpe_merges" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Bpe.learnMerges(docs, "text", k = 3).orderBy(col("iter"))
    },

    // Daily-ingest dedup: a "re-crawl" batch (100 genuinely new docs +
    // 50 exact copies of historical ones under new ids) deduped against
    // a 400-doc history via Bloom prefilter + 128-bit exact verify.
    // The result must equal the plain anti-join — the bloom only prunes.
    "q_incremental_dedup" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val history = docs.filter(col("doc_id") < 400)
      val batch = docs.filter(col("doc_id") >= 400)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.incrementalDedup(batch, history, "text", expectedHistoryRows = 400)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("source"))
    },

    // Two-level incremental dedup at the 100 TB contract: the bloom
    // INDEX is pre-built per bucket and persisted (parquet), so the
    // daily batch never re-scans history to build a filter — history
    // parquet is read ONLY by the verify anti-join over bloom hits
    // (DedupSpec plan-asserts the single history scan).  Same batch
    // construction and the same plain-anti-join oracle as
    // q_incremental_dedup: the index is a pruning layer, never a
    // correctness layer.
    "q_incremental_dedup_bloom2" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val history = docs.filter(col("doc_id") < 400)
      val batch = docs.filter(col("doc_id") >= 400)
        .unionByName(docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 10000))
      val tmp = graft.TmpCleanup.tempDir("graft_bloom2")
      history.write.mode("overwrite").parquet(s"$tmp/history")
      Dedup.bloomIndex(history, "text", buckets = 16,
          expectedHistoryRows = 400)
        .write.mode("overwrite").parquet(s"$tmp/index")
      Dedup.incrementalDedupBloom2(batch,
          s.read.parquet(s"$tmp/history"), s.read.parquet(s"$tmp/index"),
          "text", buckets = 16)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("source"))
    })

  /** Shared text (runs verbatim on both engines). */
  private val stratifiedSql =
    """WITH ranked AS (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY lang, source
      |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
      |  FROM documents)
      |SELECT lang, source, count(*) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM ranked WHERE rk <= 5
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Shared text; the 90% threshold is exact integer cross-
    * multiplication (10·cum_before < 9·total), no FP compare.
    */
  private val toppSql =
    """WITH counts AS (
      |  SELECT source, count(*) AS n FROM documents GROUP BY source),
      |ranked AS (
      |  SELECT source, n,
      |    sum(n) OVER (ORDER BY n DESC, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM counts)
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(cum AS BIGINT) AS cum
      |FROM ranked
      |WHERE 10 * (cum - n) < 9 * (SELECT CAST(sum(n) AS BIGINT) FROM counts)
      |ORDER BY n DESC, source""".stripMargin

  /** Shared text (runs verbatim on both engines). */
  private val lengthBucketsSql =
    """WITH b AS (
      |  SELECT CASE WHEN n_chars < 64 THEN 64 WHEN n_chars < 128 THEN 128
      |              WHEN n_chars < 256 THEN 256 WHEN n_chars < 512 THEN 512
      |              ELSE 1024 END AS bucket,
      |    n_chars
      |  FROM documents)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(bucket - n_chars) AS BIGINT) AS padding_waste
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Unigram-EM demo costs (micro-nats), one source of truth for the
    * Spark expression and the DuckDB recursive-CTE oracle: every
    * [a-z0-9] single char at cost 3.0, plus multi-char pieces priced
    * below their single-char spellings so Viterbi genuinely prefers
    * them on the synthetic corpus's common words.
    */
  private val unigramVocab: Seq[(String, Long)] =
    "abcdefghijklmnopqrstuvwxyz0123456789".map(c => c.toString -> 3000000L) ++
      Seq("ta" -> 2500000L, "ble" -> 3000000L, "sc" -> 2500000L,
        "an" -> 2500000L, "val" -> 3000000L, "ue" -> 2200000L,
        "cust" -> 3500000L, "omer" -> 3500000L, "wind" -> 3800000L,
        "ow" -> 2400000L, "qu" -> 2500000L, "ery" -> 3000000L,
        "fast" -> 4000000L, "st" -> 2400000L, "row" -> 3200000L,
        "key" -> 3200000L, "agg" -> 3300000L, "spark" -> 4200000L,
        "line" -> 3800000L, "sort" -> 3800000L, "data" -> 3800000L)

  val oracle: Map[String, String] = Map(
    "q_unigram_em" -> {
      val values = unigramVocab
        .map { case (p, c) => s"('$p', ${c})" }.mkString(", ")
      s"""WITH RECURSIVE words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        |    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w
        |    FROM documents) GROUP BY 1),
        |vocab(piece, cost) AS (VALUES $values),
        |paths(w, pos, cost, path) AS (
        |  SELECT w, 0, CAST(0 AS BIGINT), '' FROM words
        |  UNION ALL
        |  SELECT p.w, p.pos + len(v.piece), p.cost + v.cost,
        |    CASE WHEN p.pos = 0 THEN v.piece
        |         ELSE p.path || ' ' || v.piece END
        |  FROM paths p JOIN vocab v
        |    ON substr(p.w, p.pos + 1, len(v.piece)) = v.piece
        |  WHERE p.pos < len(p.w)),
        |best AS (SELECT w, path FROM (
        |  SELECT w, path,
        |    row_number() OVER (PARTITION BY w ORDER BY cost, path) AS rn
        |  FROM paths WHERE pos = len(w)) WHERE rn = 1),
        |counts AS (
        |  SELECT piece, CAST(sum(wc) AS BIGINT) AS n_uses FROM (
        |    SELECT words.wc, unnest(string_split(best.path, ' ')) AS piece
        |    FROM best JOIN words USING (w)) GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_uses) AS BIGINT) AS t FROM counts)
        |SELECT piece, n_uses,
        |  CAST(round(ln(CAST(t AS DOUBLE) / n_uses) * 1000000) AS BIGINT)
        |    AS new_cost_micro
        |FROM counts, tot ORDER BY piece""".stripMargin
    },

    "q_vocab_growth" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |f AS (
        |  SELECT tok, min(doc_id) AS fst,
        |    sum(CASE WHEN doc_id < 100 THEN 1 ELSE 0 END) AS n100,
        |    sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS n250,
        |    count(*) AS nall
        |  FROM toks GROUP BY tok)
        |SELECT * FROM (
        |  SELECT CAST(100 AS BIGINT) AS cut,
        |    CAST(sum(n100) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN fst < 100 THEN 1 ELSE 0 END) AS BIGINT) AS vocab
        |  FROM f
        |  UNION ALL
        |  SELECT 250, CAST(sum(n250) AS BIGINT),
        |    CAST(sum(CASE WHEN fst < 250 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |  UNION ALL
        |  SELECT 1000000000, CAST(sum(nall) AS BIGINT),
        |    CAST(count(*) AS BIGINT) FROM f)
        |ORDER BY cut""".stripMargin,

    "q_heaps_fit" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |f AS (
        |  SELECT tok, min(doc_id) AS fst,
        |    sum(CASE WHEN doc_id < 25 THEN 1 ELSE 0 END) AS n25,
        |    sum(CASE WHEN doc_id < 50 THEN 1 ELSE 0 END) AS n50,
        |    sum(CASE WHEN doc_id < 100 THEN 1 ELSE 0 END) AS n100,
        |    sum(CASE WHEN doc_id < 200 THEN 1 ELSE 0 END) AS n200,
        |    sum(CASE WHEN doc_id < 400 THEN 1 ELSE 0 END) AS n400
        |  FROM toks GROUP BY tok),
        |g AS (
        |  SELECT CAST(sum(n25) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN fst < 25 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS vocab FROM f
        |  UNION ALL SELECT CAST(sum(n50) AS BIGINT),
        |    CAST(sum(CASE WHEN fst < 50 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |  UNION ALL SELECT CAST(sum(n100) AS BIGINT),
        |    CAST(sum(CASE WHEN fst < 100 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |  UNION ALL SELECT CAST(sum(n200) AS BIGINT),
        |    CAST(sum(CASE WHEN fst < 200 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |  UNION ALL SELECT CAST(sum(n400) AS BIGINT),
        |    CAST(sum(CASE WHEN fst < 400 THEN 1 ELSE 0 END) AS BIGINT) FROM f),
        |p AS (SELECT
        |    CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1000000, 0)
        |      AS BIGINT) AS x,
        |    CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000, 0)
        |      AS BIGINT) AS y
        |  FROM g WHERE n_tokens > 0 AND vocab > 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM p)
        |SELECT n_points,
        |  round(CAST(n_points * sxy - sx * sy AS DOUBLE)
        |    / CAST(n_points * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
        |  round((CAST(sy AS DOUBLE)
        |      - CAST(n_points * sxy - sx * sy AS DOUBLE)
        |        / CAST(n_points * sxx - sx * sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n_points AS DOUBLE) / 1000000, 6) AS ln_k
        |FROM m WHERE n_points * sxx - sx * sx <> 0""".stripMargin,

    "q_source_jsd" ->
      s"""WITH toks AS (
        |  SELECT source, unnest($toksSql) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
        |  FROM c GROUP BY 1),
        |ct AS (SELECT c.source, c.tok, c.c, t.t
        |  FROM c JOIN t USING (source)),
        |p AS (SELECT a.source AS src_a, b.source AS src_b,
        |    a.c AS ca, a.t AS ta, b.c AS cb, b.t AS tb
        |  FROM ct a JOIN ct b ON b.tok = a.tok AND a.source < b.source),
        |l AS (SELECT src_a, src_b, ca, ta, cb, tb,
        |    CAST(round(ln(CAST(2 * CAST(ca AS HUGEINT) * tb AS DOUBLE)
        |      / CAST(CAST(ca AS HUGEINT) * tb + CAST(cb AS HUGEINT) * ta
        |          AS DOUBLE)) * 1000000, 0) AS BIGINT) AS la,
        |    CAST(round(ln(CAST(2 * CAST(cb AS HUGEINT) * ta AS DOUBLE)
        |      / CAST(CAST(ca AS HUGEINT) * tb + CAST(cb AS HUGEINT) * ta
        |          AS DOUBLE)) * 1000000, 0) AS BIGINT) AS lb
        |  FROM p),
        |g AS (SELECT src_a, src_b,
        |    CAST(count(*) AS BIGINT) AS shared_types,
        |    max(ta) AS t_a, max(tb) AS t_b,
        |    sum(CAST(ca AS HUGEINT) * la) AS sa,
        |    sum(CAST(cb AS HUGEINT) * lb) AS sb,
        |    CAST(sum(ca) AS BIGINT) AS sha,
        |    CAST(sum(cb) AS BIGINT) AS shb
        |  FROM l GROUP BY 1, 2),
        |n AS (SELECT src_a, src_b, shared_types, t_a, t_b,
        |    (sa + 693147 * CAST(t_a - sha AS HUGEINT)) * t_b
        |      + (sb + 693147 * CAST(t_b - shb AS HUGEINT)) * t_a AS num,
        |    2 * CAST(t_a AS HUGEINT) * t_b AS den
        |  FROM g)
        |SELECT src_a, src_b, shared_types, t_a, t_b,
        |  CAST(CASE WHEN num < 0 THEN -((-num) // den)
        |    ELSE num // den END AS BIGINT) AS js_ppm
        |FROM n ORDER BY src_a, src_b""".stripMargin,
    "q_lm_score" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
        |    * 1000000, 0) AS BIGINT)) AS BIGINT) AS logprob_micro
        |FROM toks JOIN freq USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,

    "q_domain_reweight" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
        |doc AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE)
        |      / CAST(total AS DOUBLE)) * 1000000, 0) AS BIGINT)) AS BIGINT)
        |      AS s
        |  FROM toks JOIN freq USING (tok) CROSS JOIN tot0
        |  GROUP BY doc_id),
        |per AS (
        |  SELECT d.source, CAST(sum(doc.n_tokens) AS BIGINT) AS n_toks,
        |         CAST(sum(doc.s) AS BIGINT) AS s
        |  FROM doc JOIN documents d USING (doc_id) GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS tn,
        |               CAST(sum(s) AS BIGINT) AS ts FROM per),
        |ex AS (
        |  SELECT source, n_toks, s,
        |    exp(0.5 * ((CAST(ts AS DOUBLE) / tn
        |      - CAST(s AS DOUBLE) / n_toks) / 1000000)) AS e
        |  FROM per, tot),
        |z AS (SELECT sum(e) AS z FROM ex)
        |SELECT source, n_toks,
        |  round(CAST(s AS DOUBLE) / n_toks, 2) AS mean_logprob_micro,
        |  CAST(round(e / z * 1000000) AS BIGINT) AS weight_micro
        |FROM ex, z ORDER BY source""".stripMargin,

    "q_cooccurrence" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok,
        |    unnest(range(1, len($toksSql) + 1)) AS pos
        |  FROM documents)
        |SELECT a.tok AS w1, b.tok AS w2, count(*) AS n_pairs
        |FROM toks a JOIN toks b
        |  ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
        |GROUP BY 1, 2 HAVING count(*) >= 80
        |ORDER BY n_pairs DESC, w1, w2 LIMIT 50""".stripMargin,

    "q_interleaved_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id, source, (doc_id * 2654435761) % 4294967296 AS hkey
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, source, hkey,
        |    row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS rn
        |  FROM keyed)
        |SELECT doc_id, source, hkey, rn
        |FROM ranked ORDER BY rn, hkey, doc_id LIMIT 200""".stripMargin,

    "q_length_buckets" -> lengthBucketsSql,
    "q_stratified_sample" -> stratifiedSql,
    "q_source_topp" -> toppSql,

    "q_dsir_select" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source = 'src0' AS is_target, unnest($toksSql) AS tok
        |  FROM documents),
        |cf AS (SELECT tok, count(*) AS c_cnt FROM toks GROUP BY tok),
        |tf AS (SELECT tok AS t_tok, count(*) AS t_cnt FROM toks WHERE is_target GROUP BY tok),
        |tot AS (SELECT CAST(sum(c_cnt) AS BIGINT) AS c_total,
        |               CAST(count(*) AS BIGINT) AS vocab FROM cf),
        |tt AS (SELECT CAST(sum(t_cnt) AS BIGINT) AS t_total FROM tf)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(
        |    CAST(round(ln(CAST(coalesce(t_cnt, 0) + 1 AS DOUBLE)
        |      / CAST(t_total + vocab AS DOUBLE)) * 1000000, 0) AS BIGINT)
        |    - CAST(round(ln(CAST(c_cnt AS DOUBLE) / CAST(c_total AS DOUBLE))
        |      * 1000000, 0) AS BIGINT)) AS BIGINT) AS dsir_micro
        |FROM toks
        |JOIN cf USING (tok)
        |LEFT JOIN tf ON tok = t_tok
        |CROSS JOIN tot CROSS JOIN tt
        |GROUP BY doc_id
        |ORDER BY dsir_micro DESC, doc_id LIMIT 50""".stripMargin,

    "q_bpe_merges" ->
      s"""WITH toks AS (
        |  SELECT unnest($toksSql) AS word FROM documents),
        |words AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY word),
        |w0 AS (SELECT freq, regexp_extract_all(word, '.') AS syms FROM words),
        |p1 AS (
        |  SELECT z.l AS l, z.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq, unnest(list_transform(
        |          list_zip(syms[1:length(syms)-1], syms[2:length(syms)]),
        |          s -> {'l': s[1], 'r': s[2]})) AS z
        |        FROM w0 WHERE length(syms) >= 2) t
        |  GROUP BY 1, 2),
        |m1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
        |w1 AS (SELECT freq,
        |        list_reduce(list_transform(syms, x -> [x]),
        |          (acc, x) -> CASE WHEN acc[-1] = m1.l AND x[1] = m1.r
        |                      THEN acc[1:length(acc)-1] || [m1.l || m1.r]
        |                      ELSE acc || x END) AS syms
        |       FROM w0 CROSS JOIN m1),
        |p2 AS (
        |  SELECT z.l AS l, z.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq, unnest(list_transform(
        |          list_zip(syms[1:length(syms)-1], syms[2:length(syms)]),
        |          s -> {'l': s[1], 'r': s[2]})) AS z
        |        FROM w1 WHERE length(syms) >= 2) t
        |  GROUP BY 1, 2),
        |m2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
        |w2 AS (SELECT freq,
        |        list_reduce(list_transform(syms, x -> [x]),
        |          (acc, x) -> CASE WHEN acc[-1] = m2.l AND x[1] = m2.r
        |                      THEN acc[1:length(acc)-1] || [m2.l || m2.r]
        |                      ELSE acc || x END) AS syms
        |       FROM w1 CROSS JOIN m2),
        |p3 AS (
        |  SELECT z.l AS l, z.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq, unnest(list_transform(
        |          list_zip(syms[1:length(syms)-1], syms[2:length(syms)]),
        |          s -> {'l': s[1], 'r': s[2]})) AS z
        |        FROM w2 WHERE length(syms) >= 2) t
        |  GROUP BY 1, 2),
        |m3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r LIMIT 1)
        |SELECT iter, l AS merge_left, r AS merge_right, cnt AS pair_count
        |FROM (SELECT 1 AS iter, l, r, cnt FROM m1
        |      UNION ALL SELECT 2, l, r, cnt FROM m2
        |      UNION ALL SELECT 3, l, r, cnt FROM m3) u
        |ORDER BY iter""".stripMargin,

    "q_ppmi" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok,
        |    unnest(range(1, len($toksSql) + 1)) AS pos
        |  FROM documents),
        |pairs AS (
        |  SELECT a.tok AS w1, b.tok AS w2, count(*) AS n_pairs
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
        |  GROUP BY 1, 2 HAVING count(*) >= 40),
        |la AS (SELECT w1, CAST(sum(n_pairs) AS BIGINT) AS n_left FROM pairs GROUP BY w1),
        |rb AS (SELECT w2, CAST(sum(n_pairs) AS BIGINT) AS n_right FROM pairs GROUP BY w2),
        |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS n_total FROM pairs)
        |SELECT w1, w2, n_pairs,
        |  greatest(0, CAST(round(ln(CAST(n_pairs * n_total AS DOUBLE)
        |    / CAST(n_left * n_right AS DOUBLE)) * 1000000, 0) AS BIGINT)) AS ppmi_micro
        |FROM pairs JOIN la USING (w1) JOIN rb USING (w2) CROSS JOIN tot
        |ORDER BY ppmi_micro DESC, w1, w2 LIMIT 50""".stripMargin,

    "q_incremental_dedup" ->
      s"""WITH hist AS (
        |  SELECT $normSql AS nt FROM documents WHERE doc_id < 400),
        |batch AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, source, text FROM documents
        |  WHERE doc_id < 50),
        |kept AS (
        |  SELECT b.doc_id, b.source FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.nt = $normSql))
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,

    // identical post-state to q_incremental_dedup — the two-level bloom
    // index must be invisible in the result
    "q_incremental_dedup_bloom2" ->
      s"""WITH hist AS (
        |  SELECT $normSql AS nt FROM documents WHERE doc_id < 400),
        |batch AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, source, text FROM documents
        |  WHERE doc_id < 50),
        |kept AS (
        |  SELECT b.doc_id, b.source FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.nt = $normSql))
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source ORDER BY source""".stripMargin)

  /** DuckDB twin of TextAnalysis.normalize (same as OpsQueries'). */
  private def normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
}
