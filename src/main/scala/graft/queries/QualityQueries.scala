package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Checks, Classifier, CorpusStats}

/** Document-quality model gates — the round-6 additions to the corpus
  * battery:
  *
  *  - bigram LM scoring (add-one smoothed, micro-nat exact)  q_bigram_lm
  *  - hashed linear classifier scoring (fastText-style)      q_linear_classifier
  *
  * Both DuckDB twins replay the identical integer pipeline — char-fold
  * hashes and micro-nat rounding happen per term BEFORE any sum, so the
  * comparison is bit-exact (integer addition is associative; double
  * accumulation is not).
  */
object QualityQueries {
  type Q = (SparkSession, String) => DataFrame

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  val queries: Map[String, Q] = Map(
    // k-anonymity + l-diversity release screen over the customer
    // quasi-identifiers (nation, segment) with account balance as the
    // sensitive attribute — exact group counts, scalar summary.
    "q_k_anonymity" -> { (s, dir) =>
      graft.ops.Privacy.anonymityReport(Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 5L, l = 3L)
    },

    // Suppression step of the k-anonymization loop: rows in QI groups
    // below k are dropped; survivors summarized per nation so the gate
    // output stays bounded.  k is DATA-DERIVED — half the largest QI
    // group (floor, min 2) — so the gate has rows at every rung by
    // construction: a fixed k=12 went `pass EMPTY` at sf0.001, where
    // the largest (nation, segment) group holds ~4 customers (round-15
    // verdict item 2).  Half-the-max guarantees the largest group
    // itself always survives; integer halving on a non-negative count
    // matches DuckDB `//` exactly.  The k scalar rides a 1-row
    // broadcast inside the op (one job) instead of a driver collect
    // (r16 verdict item 6).
    "q_k_suppress" -> { (s, dir) =>
      graft.ops.Privacy.suppressBelowHalfMax(
          Tables.load(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_kept"),
          count_distinct(col("c_mktsegment")).as("n_segments"))
        .orderBy(col("c_nationkey"))
    },

    // Order-invariant dataset fingerprint over orders' key columns:
    // (count, sum mod 2^61, xor) of per-row engine-agnostic hashes —
    // the stamp two pipelines compare to prove identical output.
    "q_dataset_fingerprint" -> { (s, dir) =>
      Checks.datasetFingerprint(Tables.load(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    },

    // Poisson-bootstrap 95% CI for the mean event value: one pass,
    // hash-deterministic Poisson(1) weights against integer CDF
    // thresholds, exact integer resample sums, IEEE ratio ordering of
    // the 200-row resample frame.  The DuckDB twin replays the
    // identical integer pipeline.
    "q_bootstrap_ci" -> { (s, dir) =>
      Checks.bootstrapMeanCI(Tables.load(s, dir, "events"),
        "event_id", "value", b = 200, seed = 7L)
    },

    // Paired bootstrap system comparison over consecutive-event pairs
    // (the q_bradley_terry pairing device): CI of the mean paired
    // value difference + exact resample win counts — "does the first
    // of each pair systematically exceed the second?"
    "q_paired_bootstrap" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events").where(col("value").isNotNull)
      val e1 = ev.where(pmod(col("event_id"), lit(2L)) === 0L)
        .select(col("event_id").as("pid"), col("value").as("va"))
      val e2 = ev.select((col("event_id") - 1L).as("pid"),
        col("value").as("vb"))
      graft.ops.Eval.pairedBootstrap(e1.join(e2, "pid"), "pid",
        "va", "vb", b = 200, seed = 11L)
    },

    "q_bigram_lm" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      CorpusStats.bigramLogProb(docs, "doc_id", "text")
        .orderBy(col("doc_id")).limit(200)
    },

    // Per-source classifier parity: the segment-QA read a filter model
    // gets BEFORE deployment — accuracy per source, so one domain
    // silently misclassified (and so over/under-filtered in the
    // mixture) is visible as a per-source gap, not averaged away.
    "q_classifier_parity" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.ops.Classifier.linearScore(docs, "doc_id", "text",
          buckets = 4096)
        .join(docs.filter(col("lang").isNotNull)
          .select(col("doc_id"), col("source"),
            (col("lang") === "en").as("__y")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__y"), 1L).otherwise(0L)).cast("long")
            .as("n_pos"),
          sum(when((col("score_micro") >= 0L) === col("__y"), 1L)
            .otherwise(0L)).cast("long").as("n_correct"))
        .selectExpr("source", "n_docs", "n_pos", "n_correct",
          "CAST((CAST(n_correct AS DECIMAL(38,0)) * 1000000) div n_docs " +
            "AS BIGINT) AS acc_ppm")
        .orderBy(col("source"))
    },

    "q_linear_classifier" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Classifier.linearScore(docs, "doc_id", "text", buckets = 4096)
        .orderBy(col("doc_id")).limit(200)
    },

    // Supervised evaluation of the quality classifier against the
    // is-English label: confusion row at p >= 0.5, exact rank-based
    // AUC (Mann-Whitney 2U), 10-bin ECE — the model-quality report a
    // pipeline reads before trusting a filter to curate data.  The raw
    // score squashes to a [0, 1e6] micro-probability by a clamped
    // affine map (integer-exact on both engines).
    "q_classifier_eval" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val scored = graft.ops.Classifier
        .linearScore(docs, "doc_id", "text", buckets = 4096)
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          "doc_id")
        .selectExpr(
          "(least(greatest(score_micro, -1000000), 1000000) + 1000000) div 2" +
            " AS p_micro",
          "is_en")
      graft.ops.Eval.classifierEval(scored, "p_micro", "is_en",
        thresholdMicro = 500000L, bins = 10)
    },

    // The threshold-picking artifact: exact precision/recall at EVERY
    // distinct score threshold, swept in one window pass over the
    // distinct-score frame.
    "q_pr_curve" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val scored = graft.ops.Classifier
        .linearScore(docs, "doc_id", "text", buckets = 4096)
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          "doc_id")
        .selectExpr(
          "(least(greatest(score_micro, -1000000), 1000000) + 1000000) div 2" +
            " AS p_micro",
          "is_en")
      graft.ops.Eval.prCurve(scored, "p_micro", "is_en")
    },

    // The per-bin reliability table behind the scalar ECE: support,
    // mean confidence, empirical accuracy, and the SIGNED gap per
    // probability decile.
    "q_calibration_bins" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val scored = graft.ops.Classifier
        .linearScore(docs, "doc_id", "text", buckets = 4096)
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          "doc_id")
        .selectExpr(
          "(least(greatest(score_micro, -1000000), 1000000) + 1000000) div 2" +
            " AS p_micro",
          "is_en")
      graft.ops.Eval.calibrationBins(scored, "p_micro", "is_en", bins = 10)
    },

    // Forecast sanity floor: persistence (lag-1) prediction of event
    // cents per user — exact error sums and sign-split R² vs the mean
    // predictor (the MASE-denominator baseline a trained forecaster
    // must beat).
    "q_persistence_baseline" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      graft.ops.Eval.persistenceBaseline(ev, "user_id", "ts", "event_id",
        "cents")
    },

    // Clipped n-gram overlap (the BLEU/ROUGE kernel) between each doc
    // and a deterministic "hypothesis" of itself with every 7th token
    // dropped — realistic high-but-imperfect overlap that exercises
    // the per-gram clipping at every n.  Space-split on BOTH engines
    // so the gram strings are byte-identical.
    "q_ngram_overlap" -> { (s, dir) =>
      graft.ops.Eval.ngramOverlap(bleuPairs(s, dir), "doc_id",
        "cand_toks", "ref_toks").orderBy(col("n"))
    },

    // Corpus BLEU-4 composed from the same integer sums: brevity
    // penalty × geometric mean of the four clipped precisions, the
    // single final exp/ln on one row.
    "q_bleu" -> { (s, dir) =>
      graft.ops.Eval.corpusBleu(bleuPairs(s, dir), "doc_id",
        "cand_toks", "ref_toks")
    },

    // Per-source quantile normalization of doc length onto a shared
    // 1..10 bucket axis (integer cumulative-count edges, ties share a
    // bucket); reported as per-(source, bucket) counts + value ranges
    // so every cut point is pinned exactly.
    "q_quantile_norm" -> { (s, dir) =>
      graft.ops.Profile.groupQuantileNormalize(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars", buckets = 10)
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_v"), max(col("n_chars")).as("max_v"))
        .orderBy(col("source"), col("bucket"))
    },

    // chrF over a vowel-stripped candidate — the morphological
    // near-miss case word-gram BLEU scores zero but char grams credit.
    // Text capped at 48 chars (unit volume bound); per-order F-2 is
    // ONE integral division over the exact corpus sums.
    "q_chrf" -> { (s, dir) =>
      // fanOut: same single-task-kernel fix as bleuPairs (guide §2.5)
      val p = graft.ops.Layout.fanOut(Tables.load(s, dir, "documents")
          .select(col("doc_id"), substring(col("text"), 1, 48).as("ref_txt")))
        .withColumn("cand_txt",
          regexp_replace(col("ref_txt"), "[aeiou]", ""))
      graft.ops.Eval.chrF(p, "doc_id", "cand_txt", "ref_txt")
        .orderBy(col("n"))
    },

    // ROUGE-L over a candidate that both DROPS (every 5th token) and
    // CORRUPTS (every 3rd survivor -> "_"): deletions shorten the LCS
    // path and corruptions force the DP to re-match via duplicate
    // tokens — the order-aware case clipped n-gram overlap can't see.
    // Both sides capped at 16 tokens (the quadratic-kernel contract);
    // the DuckDB twin replays the identical DP as a recursive CTE.
    "q_rouge_l" -> { (s, dir) =>
      val p = Tables.load(s, dir, "documents")
        .select(slice(split(col("text"), " "), 1, 16).as("ref_toks"))
        .withColumn("cand_toks",
          transform(filter(col("ref_toks"), (_, i) => i % 5 =!= 0),
            (x, i) => when(i % 3 === 0, lit("_")).otherwise(x)))
      graft.ops.Eval.rougeL(p, "cand_toks", "ref_toks")
    },

    // Flesch reading-ease per source: exact integer word/sentence/
    // syllable-proxy totals from one codegen regex pass, one fixed
    // IEEE formula over the sums — the readability screen next to the
    // quality-metrics funnel.
    "q_readability" -> { (s, dir) =>
      graft.ops.TextAnalysis.readability(
          Tables.load(s, dir, "documents"), "source", "text")
        .orderBy(col("source"))
    },

    // Self-BLEU diversity per source: each source's first 6 docs (via
    // the bounded TopKPerKey heap) pair all-vs-all and the clipped
    // 1/2-gram overlap runs in-row through the codegen kernel — high
    // self_ppm flags templated sources that exact dedup misses.
    "q_self_bleu" -> { (s, dir) =>
      graft.ops.Eval.selfOverlap(Tables.load(s, dir, "documents"),
          "source", "doc_id", "text", k = 6, maxN = 2)
        .orderBy(col("source"), col("n"))
    },

    // Distinct-1/distinct-2 diversity ratios per source: the
    // corpus-wide templating screen — exact distinct over total grams,
    // one integral ppm division.
    "q_distinct_n" -> { (s, dir) =>
      graft.ops.Eval.distinctNgramRatio(Tables.load(s, dir, "documents"),
          "source", "text", maxN = 2)
        .orderBy(col("source"), col("n"))
    })

  /** (candidate, reference) token pairs for the BLEU/ROUGE gates:
    * reference = space-split doc text, candidate = the same tokens
    * with 0-based positions ≡ 0 (mod 7) removed.
    */
  private def bleuPairs(s: SparkSession, dir: String): DataFrame =
    // fanOut: the clipped-match kernels above this projection otherwise
    // run inside the single-row-group scan's ONE task (guide §2.5 input
    // skew; BenchProbe r16: one 1.6 s task on 32 idle cores)
    graft.ops.Layout.fanOut(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ref_toks")))
      .withColumn("cand_toks",
        filter(col("ref_toks"), (_, i) => i % 7 =!= 0))

  val oracle: Map[String, String] = Map(
    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |         count(DISTINCT c_acctbal) AS d
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(n) AS BIGINT) AS min_group_size,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below_k,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k,
        |  CAST(sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_below_l,
        |  CAST(min(d) AS BIGINT) AS worst_diversity
        |FROM g""".stripMargin,

    "q_k_suppress" ->
      """WITH sizes AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS group_size
        |  FROM customer GROUP BY 1, 2)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(count(DISTINCT c.c_mktsegment) AS BIGINT) AS n_segments
        |FROM customer c JOIN sizes s
        |  ON c.c_nationkey = s.c_nationkey
        | AND c.c_mktsegment = s.c_mktsegment
        |WHERE s.group_size >= (
        |  SELECT greatest(2, CAST(max(group_size) // 2 AS BIGINT)) FROM sizes)
        |GROUP BY 1 ORDER BY c.c_nationkey""".stripMargin,

    "q_dataset_fingerprint" ->
      """WITH rows_h AS (
        |  SELECT list_reduce([CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(
        |        concat_ws('|', CAST(o_orderkey AS VARCHAR),
        |          CAST(o_custkey AS VARCHAR), o_orderstatus,
        |          o_orderpriority), '.'),
        |      c -> CAST(ord(c) AS BIGINT)),
        |    (a, x) -> (a * 31 + x) % 2147483648) AS h
        |  FROM orders)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h) % 2305843009213693952 AS BIGINT) AS hash_sum,
        |  CAST(bit_xor(h) AS BIGINT) AS hash_xor
        |FROM rows_h""".stripMargin,

    "q_bootstrap_ci" ->
      """WITH cents AS (
        |  SELECT event_id AS i, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |drawn AS (
        |  SELECT i, c, r.j,
        |    (i * 2654435761 + r.j * 40503 + 7) % 2147483648 AS u1
        |  FROM cents, range(0, 200) r(j)),
        |weighted AS (
        |  SELECT j, c,
        |    CASE WHEN u < 790015084 THEN 0
        |         WHEN u < 1580030169 THEN 1
        |         WHEN u < 1975037711 THEN 2
        |         WHEN u < 2106706892 THEN 3
        |         WHEN u < 2139624187 THEN 4
        |         ELSE 5 END AS w
        |  FROM (SELECT i, c, j, (u1 * 48271 + j) % 2147483648 AS u
        |        FROM drawn)),
        |res AS (
        |  SELECT j, CAST(sum(w * c) AS BIGINT) AS s,
        |         CAST(sum(w) AS BIGINT) AS n
        |  FROM weighted GROUP BY 1 HAVING sum(w) > 0),
        |ranked AS (
        |  SELECT j, CAST(s AS DOUBLE) / n AS mv,
        |    row_number() OVER (ORDER BY CAST(s AS DOUBLE) / n, j) AS r
        |  FROM res),
        |tot AS (SELECT count(*) AS n_rows, CAST(sum(c) AS BIGINT) AS ts
        |        FROM cents)
        |SELECT t.n_rows,
        |  (SELECT count(*) FROM ranked) AS b_eff,
        |  round(CAST(t.ts AS DOUBLE) / 100 / t.n_rows, 6) AS mean,
        |  round((SELECT mv FROM ranked WHERE r = 5) / 100, 6) AS ci_lo,
        |  round((SELECT mv FROM ranked WHERE r = 195) / 100, 6) AS ci_hi
        |FROM tot t""".stripMargin,

    "q_classifier_parity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |    '[a-z0-9'']+')) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000003) AS hh
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    ((hh % 4096) * 2654435761) % 4294967296 % 2000001 - 1000000
        |      AS wt
        |  FROM h),
        |agg AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score_micro
        |  FROM w GROUP BY doc_id),
        |d AS (SELECT doc_id, source, (lang = 'en') AS y
        |  FROM documents WHERE lang IS NOT NULL),
        |j AS (SELECT d.source, d.y, coalesce(a.score_micro, 0) AS sm
        |  FROM d LEFT JOIN agg a USING (doc_id))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN (sm >= 0) = y THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  CAST((CAST(sum(CASE WHEN (sm >= 0) = y THEN 1 ELSE 0 END)
        |      AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS acc_ppm
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_paired_bootstrap" ->
      """WITH ev AS (SELECT event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |cents AS (
        |  SELECT e1.event_id AS i, e1.c - e2.c AS d
        |  FROM ev e1 JOIN ev e2 ON e2.event_id = e1.event_id + 1
        |  WHERE e1.event_id % 2 = 0),
        |drawn AS (
        |  SELECT i, d, r.j,
        |    (i * 2654435761 + r.j * 40503 + 11) % 2147483648 AS u1
        |  FROM cents, range(0, 200) r(j)),
        |weighted AS (
        |  SELECT j, d,
        |    CASE WHEN u < 790015084 THEN 0
        |         WHEN u < 1580030169 THEN 1
        |         WHEN u < 1975037711 THEN 2
        |         WHEN u < 2106706892 THEN 3
        |         WHEN u < 2139624187 THEN 4
        |         ELSE 5 END AS w
        |  FROM (SELECT i, d, j, (u1 * 48271 + j) % 2147483648 AS u
        |        FROM drawn)),
        |res AS (
        |  SELECT j, CAST(sum(w * d) AS BIGINT) AS s,
        |         CAST(sum(w) AS BIGINT) AS n
        |  FROM weighted GROUP BY 1 HAVING sum(w) > 0),
        |ranked AS (
        |  SELECT j, s, CAST(s AS DOUBLE) / n AS mv,
        |    row_number() OVER (ORDER BY CAST(s AS DOUBLE) / n, j) AS r
        |  FROM res),
        |tot AS (SELECT count(*) AS n_rows, CAST(sum(d) AS BIGINT) AS ts
        |        FROM cents)
        |SELECT t.n_rows,
        |  (SELECT count(*) FROM ranked) AS b_eff,
        |  round(CAST(t.ts AS DOUBLE) / 100 / t.n_rows, 6) AS mean_diff,
        |  round((SELECT mv FROM ranked WHERE r = 5) / 100, 6) AS ci_lo,
        |  round((SELECT mv FROM ranked WHERE r = 195) / 100, 6) AS ci_hi,
        |  (SELECT CAST(count(*) FILTER (s > 0) AS BIGINT) FROM ranked)
        |    AS wins_a,
        |  (SELECT CAST(count(*) FILTER (s = 0) AS BIGINT) FROM ranked)
        |    AS ties,
        |  (SELECT CAST(count(*) FILTER (s < 0) AS BIGINT) FROM ranked)
        |    AS wins_b
        |FROM tot t""".stripMargin,

    "q_bigram_lm" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |bgn AS (
        |  SELECT doc_id, z.l AS w1, z.r AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(
        |          list_zip(t[1:length(t)-1], t[2:length(t)]),
        |          s -> {'l': s[1], 'r': s[2]})) AS z
        |        FROM toks WHERE length(t) >= 2) u),
        |cnts AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_cnt
        |         FROM bgn GROUP BY 1, 2),
        |lm AS (SELECT w1, CAST(sum(bg_cnt) AS BIGINT) AS left_cnt
        |       FROM cnts GROUP BY 1),
        |voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
        |        FROM (SELECT unnest(t) AS tok FROM toks) v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(round(ln(CAST(bg_cnt + 1 AS DOUBLE)
        |    / CAST(left_cnt + vocab AS DOUBLE)) * 1000000, 0) AS BIGINT))
        |    AS BIGINT) AS bigram_micro
        |FROM bgn JOIN cnts USING (w1, w2) JOIN lm USING (w1) CROSS JOIN voc
        |GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,

    "q_linear_classifier" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000003) AS hh
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    ((hh % 4096) * 2654435761) % 4294967296 % 2000001 - 1000000 AS wt
        |  FROM h),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(wt) AS BIGINT) AS score_micro
        |  FROM w GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(a.n_tokens, 0) AS n_tokens,
        |  coalesce(a.score_micro, 0) AS score_micro,
        |  coalesce(a.score_micro, 0) > 0 AS keep
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id LIMIT 200""".stripMargin,

    "q_classifier_eval" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000003) AS hh
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    ((hh % 4096) * 2654435761) % 4294967296 % 2000001 - 1000000 AS wt
        |  FROM h),
        |agg AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score_micro
        |  FROM w GROUP BY doc_id),
        |p AS (
        |  SELECT (least(greatest(coalesce(a.score_micro, 0), -1000000),
        |            1000000) + 1000000) // 2 AS p,
        |    (d.lang = 'en') AS y
        |  FROM documents d LEFT JOIN agg a USING (doc_id)
        |  WHERE d.lang IS NOT NULL),
        |conf AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN y AND p >= 500000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN NOT y AND p >= 500000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT y AND p < 500000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN y AND p < 500000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn
        |  FROM p),
        |cnt AS (SELECT p AS v,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS cb
        |  FROM p GROUP BY 1),
        |r AS (SELECT ca, cb,
        |    coalesce(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS fbb
        |  FROM cnt),
        |u AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |    CAST(sum(cb) AS BIGINT) AS n_b,
        |    CAST(sum(ca * (fbb * 2 + cb)) AS BIGINT) AS u2 FROM r),
        |b AS (SELECT least((p * 10) // 1000000, 9) AS bin, count(*) AS nb,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS pb, sum(p) AS sp
        |  FROM p GROUP BY 1),
        |e AS (SELECT CAST(sum(abs(CAST(sp AS HUGEINT)
        |      - CAST(pb AS HUGEINT) * 1000000)) // sum(nb) AS BIGINT)
        |    AS ece_ppm FROM b)
        |SELECT n, n_pos, tp, fp, tn, fn,
        |  CAST(CASE WHEN tp + fp > 0 THEN (CAST(tp AS HUGEINT) * 1000000)
        |    // (tp + fp) ELSE -1 END AS BIGINT) AS precision_ppm,
        |  CAST(CASE WHEN tp + fn > 0 THEN (CAST(tp AS HUGEINT) * 1000000)
        |    // (tp + fn) ELSE -1 END AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    (CAST(tp AS HUGEINT) * 2000000) // (2 * tp + fp + fn)
        |    ELSE -1 END AS BIGINT) AS f1_ppm,
        |  CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    (CAST(u2 AS HUGEINT) * 1000000) // (CAST(2 AS HUGEINT) * n_a * n_b)
        |    ELSE -1 END AS BIGINT) AS auc_ppm,
        |  ece_ppm
        |FROM conf, u, e""".stripMargin,

    "q_pr_curve" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000003) AS hh
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    ((hh % 4096) * 2654435761) % 4294967296 % 2000001 - 1000000 AS wt
        |  FROM h),
        |agg AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score_micro
        |  FROM w GROUP BY doc_id),
        |p AS (
        |  SELECT (least(greatest(coalesce(a.score_micro, 0), -1000000),
        |            1000000) + 1000000) // 2 AS p,
        |    (d.lang = 'en') AS y
        |  FROM documents d LEFT JOIN agg a USING (doc_id)
        |  WHERE d.lang IS NOT NULL),
        |cnt AS (SELECT p AS threshold_micro,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN y THEN 0 ELSE 1 END) AS cb
        |  FROM p GROUP BY 1),
        |c2 AS (SELECT threshold_micro,
        |    CAST(sum(ca) OVER (ORDER BY threshold_micro DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS tp,
        |    CAST(sum(cb) OVER (ORDER BY threshold_micro DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS fp,
        |    CAST(sum(ca) OVER () AS BIGINT) AS pos
        |  FROM cnt)
        |SELECT threshold_micro, tp, fp,
        |  CAST((CAST(tp AS HUGEINT) * 1000000) // (tp + fp) AS BIGINT)
        |    AS precision_ppm,
        |  CAST(CASE WHEN pos > 0 THEN (CAST(tp AS HUGEINT) * 1000000) // pos
        |    ELSE -1 END AS BIGINT) AS recall_ppm
        |FROM c2 ORDER BY threshold_micro DESC""".stripMargin,

    "q_calibration_bins" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
        |h AS (
        |  SELECT doc_id, list_reduce(
        |    [CAST(0 AS BIGINT)] || list_transform(
        |      regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000003) AS hh
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    ((hh % 4096) * 2654435761) % 4294967296 % 2000001 - 1000000 AS wt
        |  FROM h),
        |agg AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score_micro
        |  FROM w GROUP BY doc_id),
        |p AS (
        |  SELECT (least(greatest(coalesce(a.score_micro, 0), -1000000),
        |            1000000) + 1000000) // 2 AS p,
        |    (d.lang = 'en') AS y
        |  FROM documents d LEFT JOIN agg a USING (doc_id)
        |  WHERE d.lang IS NOT NULL),
        |b AS (SELECT least((p * 10) // 1000000, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    sum(p) AS sp
        |  FROM p GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(CAST(sp AS HUGEINT) // n AS BIGINT) AS conf_ppm,
        |  CAST((CAST(n_pos AS HUGEINT) * 1000000) // n AS BIGINT) AS acc_ppm,
        |  CAST(CASE WHEN CAST(sp AS HUGEINT) - CAST(n_pos AS HUGEINT)
        |      * 1000000 < 0
        |    THEN -((CAST(n_pos AS HUGEINT) * 1000000 - sp) // n)
        |    ELSE (CAST(sp AS HUGEINT) - CAST(n_pos AS HUGEINT) * 1000000)
        |      // n END AS BIGINT) AS gap_ppm
        |FROM b ORDER BY bin""".stripMargin,

    "q_persistence_baseline" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |l AS (SELECT y, lag(y) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev FROM t),
        |f AS (SELECT y, prev FROM l WHERE prev IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(abs(y - prev)) AS BIGINT) AS sae,
        |    sum(CAST(y - prev AS HUGEINT) * (y - prev)) AS sse,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM f)
        |SELECT n, sae AS sum_abs_err, CAST(sse AS BIGINT) AS sum_sq_err,
        |  CAST(CASE WHEN n * syy - sy * sy = 0 THEN -1000001
        |    WHEN (n * syy - sy * sy) - n * sse < 0 THEN
        |      -(((n * sse - (n * syy - sy * sy)) * 1000000)
        |        // (n * syy - sy * sy))
        |    ELSE (((n * syy - sy * sy) - n * sse) * 1000000)
        |      // (n * syy - sy * sy) END AS BIGINT) AS r2_ppm
        |FROM a""".stripMargin,

    "q_ngram_overlap" ->
      (bleuPerSql + """
        |SELECT n, matched, cand_total, ref_total,
        |  CAST(CASE WHEN cand_total > 0 THEN
        |    (CAST(matched AS HUGEINT) * 1000000) // cand_total
        |    ELSE -1 END AS BIGINT) AS prec_ppm,
        |  CAST(CASE WHEN ref_total > 0 THEN
        |    (CAST(matched AS HUGEINT) * 1000000) // ref_total
        |    ELSE -1 END AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN cand_total + ref_total > 0 THEN
        |    (CAST(matched AS HUGEINT) * 2000000) // (cand_total + ref_total)
        |    ELSE -1 END AS BIGINT) AS f1_ppm
        |FROM per ORDER BY n""".stripMargin),

    "q_bleu" ->
      (bleuPerSql + """,
        |s AS (SELECT
        |    CAST(sum(CASE WHEN n = 1 THEN cand_total END) AS BIGINT)
        |      AS c_len,
        |    CAST(sum(CASE WHEN n = 1 THEN ref_total END) AS BIGINT)
        |      AS r_len,
        |    CAST(sum(CASE WHEN n = 1 THEN matched END) AS BIGINT) AS m1,
        |    CAST(sum(CASE WHEN n = 2 THEN matched END) AS BIGINT) AS m2,
        |    CAST(sum(CASE WHEN n = 3 THEN matched END) AS BIGINT) AS m3,
        |    CAST(sum(CASE WHEN n = 4 THEN matched END) AS BIGINT) AS m4,
        |    CAST(sum(CASE WHEN n = 1 THEN cand_total END) AS BIGINT) AS t1,
        |    CAST(sum(CASE WHEN n = 2 THEN cand_total END) AS BIGINT) AS t2,
        |    CAST(sum(CASE WHEN n = 3 THEN cand_total END) AS BIGINT) AS t3,
        |    CAST(sum(CASE WHEN n = 4 THEN cand_total END) AS BIGINT) AS t4
        |  FROM per)
        |SELECT c_len, r_len, m1, m2, m3, m4, t1, t2, t3, t4,
        |  CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN
        |    round(least(CAST(1.0 AS DOUBLE),
        |        exp(1.0 - CAST(r_len AS DOUBLE) / c_len)) *
        |      exp((ln(CAST(m1 AS DOUBLE) / t1) + ln(CAST(m2 AS DOUBLE) / t2)
        |        + ln(CAST(m3 AS DOUBLE) / t3) + ln(CAST(m4 AS DOUBLE) / t4))
        |        / 4.0), 6)
        |  ELSE 0.0 END AS bleu
        |FROM s""".stripMargin),

    "q_quantile_norm" ->
      """WITH b AS (SELECT doc_id, source, n_chars,
        |    count(*) OVER (PARTITION BY source) AS n,
        |    count(*) OVER (PARTITION BY source ORDER BY n_chars
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS below
        |  FROM documents),
        |a AS (SELECT source, 1 + (below * 10) // n AS bucket, n_chars
        |  FROM b)
        |SELECT source, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS min_v, max(n_chars) AS max_v
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_chrf" ->
      """WITH d AS (SELECT doc_id,
        |    regexp_replace(substring(text, 1, 48), '\s+', '', 'g') AS rs
        |  FROM documents),
        |p AS (SELECT doc_id, rs,
        |    regexp_replace(rs, '[aeiou]', '', 'g') AS cs FROM d),
        |ch AS (SELECT doc_id,
        |    list_transform(range(1, length(cs)+1), i -> cs[i:i]) AS cch,
        |    list_transform(range(1, length(rs)+1), i -> rs[i:i]) AS rch
        |  FROM p),
        |nn AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
        |cg AS (SELECT doc_id, n, array_to_string(cch[i:i+n-1], ' ') AS g,
        |    1 AS c, 0 AS r FROM (SELECT doc_id, n, cch,
        |      unnest(range(1, len(cch) - n + 2)) AS i
        |    FROM ch CROSS JOIN nn)),
        |rg AS (SELECT doc_id, n, array_to_string(rch[i:i+n-1], ' ') AS g,
        |    0 AS c, 1 AS r FROM (SELECT doc_id, n, rch,
        |      unnest(range(1, len(rch) - n + 2)) AS i
        |    FROM ch CROSS JOIN nn)),
        |cnt AS (SELECT doc_id, n, g, sum(c) AS cc, sum(r) AS rc
        |  FROM (SELECT * FROM cg UNION ALL SELECT * FROM rg)
        |  GROUP BY 1, 2, 3),
        |per AS (SELECT n, CAST(sum(least(cc, rc)) AS BIGINT) AS matched,
        |    CAST(sum(cc) AS BIGINT) AS cand_total,
        |    CAST(sum(rc) AS BIGINT) AS ref_total
        |  FROM cnt GROUP BY 1)
        |SELECT n, matched, cand_total, ref_total,
        |  CAST(CASE WHEN 4 * ref_total + cand_total > 0 THEN
        |    (CAST(matched AS HUGEINT) * 5000000)
        |      // (4 * ref_total + cand_total)
        |    ELSE -1 END AS BIGINT) AS fbeta_ppm
        |FROM per ORDER BY n""".stripMargin,

    // The running-max LCS recurrence: L[i][j] = max(L[i-1][j],
    // max_{k<=j, cand[i]=ref[k]} L[i-1][k-1]+1) — left-dependency-free,
    // so each DP row is ONE list_transform and the recursive CTE only
    // iterates over candidate positions.
    "q_rouge_l" ->
      """WITH RECURSIVE p AS (SELECT doc_id,
        |    string_split(text, ' ')[1:16] AS ref,
        |    list_transform(
        |      list_filter(string_split(text, ' ')[1:16],
        |        (x, i) -> (i-1) % 5 != 0),
        |      (x, i) -> CASE WHEN (i-1) % 3 = 0 THEN '_' ELSE x END)
        |      AS cand
        |  FROM documents),
        |rec AS (
        |  SELECT doc_id, ref, cand, 1 AS i,
        |    list_transform(ref, x -> 0) AS dp FROM p
        |  UNION ALL
        |  SELECT doc_id, ref, cand, i + 1,
        |    list_transform(range(1, len(ref)+1), j ->
        |      greatest(dp[j], coalesce(list_max(
        |        list_transform(range(1, j+1), k ->
        |          CASE WHEN cand[i] = ref[k]
        |            THEN (CASE WHEN k = 1 THEN 0 ELSE dp[k-1] END) + 1
        |          END)), 0))) AS dp
        |  FROM rec WHERE i <= len(cand)),
        |per AS (SELECT doc_id, len(cand) AS nc, len(ref) AS nr,
        |    CASE WHEN len(ref) = 0 THEN 0 ELSE dp[len(ref)] END AS lcs
        |  FROM rec WHERE i = len(cand) + 1)
        |SELECT CAST(sum(lcs) AS BIGINT) AS lcs_total,
        |  CAST(sum(nc) AS BIGINT) AS cand_total,
        |  CAST(sum(nr) AS BIGINT) AS ref_total,
        |  CAST(CASE WHEN sum(nc) > 0 THEN
        |    (CAST(sum(lcs) AS HUGEINT) * 1000000) // sum(nc)
        |    ELSE -1 END AS BIGINT) AS prec_ppm,
        |  CAST(CASE WHEN sum(nr) > 0 THEN
        |    (CAST(sum(lcs) AS HUGEINT) * 1000000) // sum(nr)
        |    ELSE -1 END AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN sum(nc) + sum(nr) > 0 THEN
        |    (CAST(sum(lcs) AS HUGEINT) * 2000000) // (sum(nc) + sum(nr))
        |    ELSE -1 END AS BIGINT) AS f1_ppm
        |FROM per""".stripMargin,

    "q_readability" ->
      """WITH d AS (SELECT source,
        |    len(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS words,
        |  CAST(sum(s) AS BIGINT) AS sentences,
        |  CAST(sum(y) AS BIGINT) AS syllables,
        |  round(206.835
        |    - 1.015 * CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE)
        |    - 84.6 * CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
        |    AS flesch
        |FROM d WHERE w > 0 GROUP BY source ORDER BY source""".stripMargin,

    "q_self_bleu" ->
      """WITH d AS (SELECT source, doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS rn
        |  FROM documents),
        |s AS (SELECT source, doc_id, toks FROM d WHERE rn <= 6),
        |p AS (SELECT a.source AS src, a.doc_id AS ca, b.doc_id AS rb,
        |    a.toks AS ct, b.toks AS rt
        |  FROM s a JOIN s b
        |    ON b.source = a.source AND b.doc_id <> a.doc_id),
        |nn AS (SELECT unnest([1, 2]) AS n),
        |ci AS (SELECT src, ca, rb, n, ct,
        |    unnest(range(1, len(ct) - n + 2)) AS i FROM p CROSS JOIN nn),
        |cg AS (SELECT src, ca, rb, n,
        |    array_to_string(ct[i:i+n-1], ' ') AS g, 1 AS c, 0 AS r
        |  FROM ci),
        |ri AS (SELECT src, ca, rb, n, rt,
        |    unnest(range(1, len(rt) - n + 2)) AS i FROM p CROSS JOIN nn),
        |rg AS (SELECT src, ca, rb, n,
        |    array_to_string(rt[i:i+n-1], ' ') AS g, 0 AS c, 1 AS r
        |  FROM ri),
        |cnt AS (SELECT src, ca, rb, n, g, sum(c) AS cc, sum(r) AS rc
        |  FROM (SELECT * FROM cg UNION ALL SELECT * FROM rg)
        |  GROUP BY 1, 2, 3, 4, 5),
        |per AS (SELECT src AS source, n,
        |    CAST(sum(least(cc, rc)) AS BIGINT) AS matched,
        |    CAST(sum(cc) AS BIGINT) AS cand_total
        |  FROM cnt GROUP BY 1, 2)
        |SELECT source, CAST(n AS INT) AS n, matched, cand_total,
        |  CAST((CAST(matched AS HUGEINT) * 1000000) // cand_total
        |    AS BIGINT) AS self_ppm
        |FROM per WHERE cand_total > 0
        |ORDER BY source, n""".stripMargin,

    "q_distinct_n" ->
      """WITH d AS (SELECT source,
        |    regexp_extract_all(lower(text), '[a-z0-9'']+') AS toks
        |  FROM documents),
        |nn AS (SELECT unnest([1, 2]) AS n),
        |gi AS (SELECT source, n, toks,
        |    unnest(range(1, len(toks) - n + 2)) AS i
        |  FROM d CROSS JOIN nn),
        |g AS (SELECT source, n,
        |    array_to_string(toks[i:i+n-1], ' ') AS gram FROM gi)
        |SELECT source, CAST(n AS INT) AS n,
        |  CAST(count(*) AS BIGINT) AS total_grams,
        |  CAST(count(DISTINCT gram) AS BIGINT) AS distinct_grams,
        |  CAST((CAST(count(DISTINCT gram) AS HUGEINT) * 1000000)
        |    // count(*) AS BIGINT) AS distinct_ppm
        |FROM g GROUP BY source, n
        |ORDER BY source, n""".stripMargin)

  /** Shared DuckDB prelude for the BLEU-kernel gates: the per-n clipped
    * match / total sums over the (candidate = drop-every-7th-token,
    * reference = full) pairs, replayed with byte-identical space-joined
    * gram strings.
    */
  private[queries] def bleuPerSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tr
      |  FROM documents),
      |p AS (SELECT doc_id,
      |    list_filter(tr, (x, i) -> (i - 1) % 7 != 0) AS tc, tr FROM d),
      |nn AS (SELECT unnest([1, 2, 3, 4]) AS n),
      |ci AS (SELECT doc_id, n, tc,
      |    unnest(range(1, len(tc) - n + 2)) AS i FROM p CROSS JOIN nn),
      |cg AS (SELECT doc_id, n, array_to_string(tc[i:i+n-1], ' ') AS g,
      |    1 AS c, 0 AS r FROM ci),
      |ri AS (SELECT doc_id, n, tr,
      |    unnest(range(1, len(tr) - n + 2)) AS i FROM p CROSS JOIN nn),
      |rg AS (SELECT doc_id, n, array_to_string(tr[i:i+n-1], ' ') AS g,
      |    0 AS c, 1 AS r FROM ri),
      |cnt AS (SELECT doc_id, n, g, sum(c) AS cc, sum(r) AS rc
      |  FROM (SELECT * FROM cg UNION ALL SELECT * FROM rg)
      |  GROUP BY 1, 2, 3),
      |per AS (SELECT n, CAST(sum(least(cc, rc)) AS BIGINT) AS matched,
      |    CAST(sum(cc) AS BIGINT) AS cand_total,
      |    CAST(sum(rc) AS BIGINT) AS ref_total
      |  FROM cnt GROUP BY 1)""".stripMargin
}
