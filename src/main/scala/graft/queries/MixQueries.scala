package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{PipelineOps, Similarity, TextAnalysis, TimeSeries}

/** Round-9 training-mix assembly gates: hard-negative mining for
  * contrastive objectives, character-entropy gibberish screening,
  * length-bucketed batching (padding-waste accounting), token-budget
  * mixture building, scalable global row numbering (the shard-id
  * assignment step, with no partitionless window), and deterministic
  * weighted sampling (Efraimidis–Spirakis A-ES).
  *
  * Every entry is oracle-checked against DuckDB running the identical
  * relational definition; selections that hinge on float ordering
  * (cosine ranks, A-ES keys) use engine-portable arithmetic and a
  * unique integer tiebreak, per the oracle-parity notes.
  */
object MixQueries {

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hard-negative mining: top-5 most-similar different-label vectors
    // per query, with the best same-label cosine and the margin.
    "q_hard_negatives" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      Similarity.hardNegatives(emb, queries, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // Character Shannon entropy per document — gibberish/padding screen.
    "q_char_entropy" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
      TextAnalysis.charEntropy(docs, "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // Length-bucketed batching report: padding waste + truncation loss
    // per bucket edge at batchSize=8.
    "q_pad_waste" -> { (s, dir) =>
      PipelineOps.lengthBuckets(Tables.load(s, dir, "documents"),
        "doc_id", "text", edges = Seq(16, 32, 48, 64), batchSize = 8)
    },

    // Token-budget mixture: greedy deterministic-priority prefix per
    // domain until each domain's token budget is reached.
    "q_mixture_budget" -> { (s, dir) =>
      PipelineOps.tokenBudgetMixture(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source",
          Map("src0" -> 400L, "src1" -> 300L, "src3" -> 250L))
        .orderBy(col("source"), col("cum_tokens"), col("doc_id"))
    },

    // Global consecutive row numbering over lineitem WITHOUT a
    // partitionless window — verified by a permutation-sensitive
    // checksum against row_number() in the oracle.
    "q_global_rownum" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val numbered = PipelineOps.globalRowNumber(
        li, Seq("l_orderkey", "l_linenumber"))
      val out = numbered.agg(
        count(lit(1)).as("n_rows"),
        min(col("rn")).cast("long").as("min_rn"),
        max(col("rn")).cast("long").as("max_rn"),
        sum(col("rn") * pmod(col("l_partkey"), lit(97L)))
          .cast("long").as("checksum"))
      graft.ops.CacheScope.releasing(out, numbered)
    },

    // A-ES weighted sampling: top-3 per source by u^(1/n_chars) with a
    // hash-uniform u — reproducible on any cluster, no RNG state.
    "q_aes_sample" -> { (s, dir) =>
      PipelineOps.weightedSample(Tables.load(s, dir, "documents"),
          "doc_id", "n_chars", "source", k = 3)
        .select(col("source"), col("sample_rank"), col("doc_id"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("source"), col("sample_rank"))
    },

    // Ordered funnel view -> click -> purchase within one day of the
    // user's first view.
    "q_event_funnel" -> { (s, dir) =>
      TimeSeries.funnel(Tables.load(s, dir, "events"),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), "INTERVAL 1 DAY")
    },

    // Exact OLS trend per user via DECIMAL(38,0) integer moments —
    // cancellation-proof where float sums lose the slope's digits.
    "q_ols_trend" -> { (s, dir) =>
      TimeSeries.olsTrend(Tables.load(s, dir, "events"),
          "user_id", "ts", "value")
        .orderBy(col("user_id"))
    },

    // Exact two-sample KS statistic: view vs purchase value
    // distributions, cross-multiplied integer D.
    "q_ks_test" -> { (s, dir) =>
      import graft.ops.Drift
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      Drift.ksStatistic(ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"), "cents")
    },

    // Exact KS on a genuinely CONTINUOUS column — raw double values,
    // distinct ≈ rows (9.5k of 10k at sf0.01-alt) — the exact case the
    // r15 segmented-scan reshape exists for: the old global ordered
    // window would pin this whole distinct-value frame to one task.
    // The +1000.0 shift (IEEE-identical on both engines) keeps the
    // domain strictly positive so no ±0.0 grouping corner can open.
    "q_ks_continuous" -> { (s, dir) =>
      import graft.ops.Drift
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), (col("value") + lit(1000.0)).as("v"))
      Drift.ksStatistic(ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"), "v")
    },

    // Chi-squared association of event_type x user bucket, with
    // Cramér's V effect size.
    "q_chi_squared" -> { (s, dir) =>
      graft.ops.Drift.chiSquared(
        Tables.load(s, dir, "events")
          .select(col("event_type"), pmod(col("user_id"), lit(4L)).as("bucket")),
        "event_type", "bucket")
    },

    // Exact cross-source vocabulary-overlap matrix (top pairs by
    // Jaccard of distinct-token sets).
    "q_vocab_overlap" -> { (s, dir) =>
      graft.ops.CorpusStats.vocabOverlap(
          Tables.load(s, dir, "documents"), "text", "source")
        .orderBy(col("src_a"), col("src_b"))
    },

    // Exact Mann-Whitney rank-sum (2U integer, tie-corrected):
    // click vs error value distributions.
    "q_rank_sum" -> { (s, dir) =>
      import graft.ops.Drift
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      Drift.rankSumU(ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"), "cents")
    },

    // Benford first-digit forensic profile of the value feed.
    "q_benford" -> { (s, dir) =>
      graft.ops.Drift.benfordProfile(
        Tables.load(s, dir, "events"), "value")
    },

    // Robust trend per user: Theil-Sen median pairwise slope of spend
    // (cents/hour) — outlier-immune where least squares is not.
    "q_theil_sen" -> { (s, dir) =>
      TimeSeries.theilSen(
          Tables.load(s, dir, "events").filter(col("user_id") < 40),
          "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id"))
    },

    // Smoothed target encoding of event_type by value (m=20), all
    // integer micro-units — bit-identical shrunk means.
    "q_target_encode" -> { (s, dir) =>
      PipelineOps.targetEncode(Tables.load(s, dir, "events"),
          "event_type", "value", m = 20L)
        .orderBy(col("event_type"))
    },

    // Last-touch attribution: purchases credited to the user's most
    // recent preceding click/view (or 'direct'), value summed exactly.
    "q_attribution" -> { (s, dir) =>
      TimeSeries.lastTouchAttribution(Tables.load(s, dir, "events"),
        "user_id", "ts", "event_type", "value",
        conversionType = "purchase", touchTypes = Seq("click", "view"))
    },

    // Deterministic node2vec-style walks over the item co-occurrence
    // graph: hash-driven inverse-CDF steps, bit-identical corpus.
    "q_random_walks" -> { (s, dir) =>
      import graft.ops.GraphOps
      // fanOut: the JSON-path parse otherwise runs inside the
      // single-row-group scan's one task (guide §2.5 input skew)
      val ev = graft.ops.Layout.fanOut(Tables.load(s, dir, "events")
        .select(col("user_id"), col("props")))
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").as("item"))
      val pairs = GraphOps.itemCooccurrence(ev, "user_id", "item",
          minUsers = 3L)
        .select(col("item_a").cast("long").as("a"),
          col("item_b").cast("long").as("b"), col("n_ab"))
      // symmetrize with one in-row explode instead of a union of two
      // projections of `pairs`: the union planned the whole
      // co-occurrence build (events parse + distinct + self-join +
      // two aggregations) TWICE (guide §2.4 — remove duplicated
      // subtrees; BenchProbe r16 showed the duplicated 0.7 MB
      // map-side stages back to back).  Same rows, same downstream
      // aggregates — row order is irrelevant to the walk index build.
      val edges = pairs.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst"),
            col("n_ab").as("w")),
          struct(col("b").as("src"), col("a").as("dst"),
            col("n_ab").as("w")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.w").as("w"))
      GraphOps.deterministicWalks(edges, walksPerNode = 2, steps = 4,
          seed = 11L)
        .orderBy(col("walk_id"))
    },

    // Row-pattern matching (MATCH_RECOGNIZE workload as a per-key
    // symbol-string regex): count view -> clicks/errors* -> purchase
    // chains per user.
    "q_seq_pattern" -> { (s, dir) =>
      TimeSeries.sequencePatternCounts(Tables.load(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type", "v[ce]*p")
        .orderBy(col("user_id"))
    },

    // Rank-based quality fusion: token-count and char-count deciles by
    // integer cumulative-count arithmetic (no interpolated edges, no
    // row-frame window), fused by bucket sum.
    "q_quality_fusion" -> { (s, dir) =>
      import graft.ops.Profile
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
          col("n_chars"))
      Profile.decileFusion(t, "doc_id", Seq("n_tok", "n_chars"))
        .orderBy(col("doc_id"))
    },

    // Embedding OOD screen ENVELOPE (oracle-checked): a 1000x-scaled
    // clone of vector 0 is injected; its Mahalanobis distance under
    // the corpus covariance is orders of magnitude beyond the natural
    // range (whitened coordinates scale linearly), so it MUST rank 1 —
    // moments, Cholesky, the whitening solve and the norm fold all
    // have to work for the row to match.
    "q_embed_outlier" -> { (s, dir) =>
      import graft.ops.Whitening
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val outlier = emb.filter(col("vec_id") === 0)
        .select(lit(1000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(1000.0f)).as("embedding"))
      Whitening.mahalanobis(emb.union(outlier), "vec_id", "embedding",
          d = 16)
        .orderBy(desc("m2"), col("vec_id")).limit(1)
        .select(lit(1L).as("rank"), col("vec_id"))
    },

    // Embedding-distribution drift between the even/odd snapshot
    // halves: per-dimension exact micro-unit moments each side, one
    // IEEE division per statistic — the encoder-skew monitor, bit-
    // identical vs the DuckDB replay.
    "q_embed_drift" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      graft.ops.Drift.embedDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding", d = 16)
    },

    // Margin-based bitext mining over the even/odd embedding halves:
    // integer-micro cosines, bounded-heap top-4 neighborhood
    // penalties, sign-split ppm margins, mutual-best pairing — all
    // integer-total, replayed exactly by the DuckDB twin.
    "q_bitext_margin" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      graft.ops.Similarity.bitextMargin(
          // the filter yields exactly 8 rows; the limit is a no-op
          // that makes the broadcast side provably bounded in-plan
          emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 16)
            .limit(8),
          emb.filter(col("vec_id") % 2 === 1), k = 4)
        .orderBy(col("a_id"))
    },

    // Negative sampling: 500 deterministic draws from the
    // unigram^0.75 distribution via the integer inverse-CDF + binned
    // range join (no driver alias table).
    "q_negative_sampling" -> { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val weights = toks.groupBy(col("token"))
        .agg(round(pow(count(lit(1)), 0.75) * 1000000)
          .cast("long").as("w"))
      PipelineOps.sampleCategorical(weights, "token", "w",
          n = 500L, seed = 42L)
        .orderBy(col("draw_id"))
    },

    // Item-item co-occurrence similarity (item-based CF kernel) over
    // the events props item ids.
    "q_item_cooc" -> { (s, dir) =>
      // fanOut: parallelize the JSON-path parse off the monolithic
      // scan's single task (guide §2.5, same fix as q_random_walks)
      graft.ops.GraphOps.itemCooccurrence(
          graft.ops.Layout.fanOut(Tables.load(s, dir, "events")
            .select(col("user_id"), col("props")))
            .select(col("user_id"),
              get_json_object(col("props"), "$.k").as("item")),
          "user_id", "item", minUsers = 5L)
        .orderBy(col("item_a"), col("item_b"))
    },

    // Survivorship / golden-record merge per user: newest event type,
    // longest props, max value (one hash agg) + modal event type (one
    // value-cardinality pre-agg) — the step after entity matching.
    "q_survivorship" -> { (s, dir) =>
      import graft.ops.Linkage
      import Linkage.SurvivorRule._
      Linkage.survivorship(Tables.load(s, dir, "events"), "user_id", Seq(
          ("last_type", "event_type", Newest(Seq("ts", "event_id"))),
          ("longest_props", "props", Longest),
          ("max_value", "value", MaxNum),
          ("top_type", "event_type", ModeAsc)))
        .orderBy(col("user_id"))
    },

    // Integer-exact rolling z-score anomalies: value deviates from the
    // trailing-20 mean by > 3 sigma, tested in cross-multiplied integer
    // cents so the flag set is bit-identical on any engine.
    "q_rolling_anomaly" -> { (s, dir) =>
      TimeSeries.rollingAnomalies(Tables.load(s, dir, "events"),
          "user_id", "event_id", "ts", "value", n = 20, z = 3)
        .orderBy(col("user_id"), col("event_id"))
    },

    // Blocking-quality audit for entity resolution: reduction ratio
    // of the (lang, length-bucket) blocking key and pair completeness
    // against a labelled truth set (same-source consecutive ids) —
    // exact pair counts, one ppm division each, no pair ever
    // materialized.
    "q_blocking_quality" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val recs = docs.select(col("doc_id"),
        expr("lang || '|' || CAST(n_chars div 50 AS STRING)").as("bkey"))
      val d2 = docs.select((col("doc_id") - 1L).as("a"),
        col("doc_id").as("b"), col("source").as("__s2"))
      val truth = docs.select(col("doc_id").as("a"), col("source"))
        .join(d2, Seq("a")).filter(col("source") === col("__s2"))
        .select(col("a"), col("b"))
      graft.ops.Linkage.blockingQuality(recs, "doc_id", "bkey", truth)
    },

    // CUSUM changepoint per user: argmax_t |n·P_t − t·S| in
    // cross-multiplied integer cents — position and score bit-exact
    // vs the DuckDB window replay; argmax via the bounded heap.
    "q_cusum" -> { (s, dir) =>
      TimeSeries.cusumChangepoint(Tables.load(s, dir, "events"),
          "user_id", "event_id", "ts", "value")
        .orderBy(col("user_id"))
    },

    // Power-law decay fit over the aggregated retention curve:
    // R_w ~ R_1 * w^s via the shared micro-nat OLS kernel — the churn
    // steepness single number, bit-exact vs the DuckDB replay.
    "q_retention_fit" -> { (s, dir) =>
      TimeSeries.retentionDecayFit(Tables.load(s, dir, "events"),
        "user_id", "ts")
    },

    // Weekly cohort-retention triangle over the events stream (dates
    // formatted as strings for the cross-engine compare).
    "q_cohort_weekly" -> { (s, dir) =>
      TimeSeries.cohortRetention(Tables.load(s, dir, "events"),
          "user_id", "ts")
        .select(date_format(col("cohort_week"), "yyyy-MM-dd")
            .as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    })

  val oracle: Map[String, String] = Map(
    "q_hard_negatives" ->
      """WITH q AS (SELECT * FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.label AS qlab,
        |    c.vec_id AS corpus_id, c.label AS clab,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |negs AS (
        |  SELECT query_id, corpus_id, round(cos, 6) AS neg_cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS rank
        |  FROM scored WHERE clab <> qlab),
        |pos AS (SELECT query_id, round(max(cos), 6) AS pos_cos
        |        FROM scored WHERE clab = qlab GROUP BY 1)
        |SELECT n.query_id, n.rank, n.corpus_id, n.neg_cos, p.pos_cos,
        |  round(p.pos_cos - n.neg_cos, 6) AS margin
        |FROM negs n LEFT JOIN pos p USING (query_id)
        |WHERE n.rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1),
        |      i -> text[i])) AS c
        |  FROM documents WHERE doc_id < 200),
        |pc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
        |  count(*) AS n_distinct_chars,
        |  round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4) AS entropy
        |FROM pc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_pad_waste" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |    CAST(CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |         WHEN n <= 48 THEN 48 ELSE 64 END AS BIGINT) AS bucket_edge
        |  FROM t)
        |SELECT bucket_edge, count(*) AS n_docs,
        |  CAST(sum(least(n, bucket_edge)) AS BIGINT) AS n_tokens,
        |  CAST(sum(bucket_edge - least(n, bucket_edge)) AS BIGINT) AS n_pad,
        |  CAST(sum(greatest(n - bucket_edge, 0)) AS BIGINT) AS n_truncated,
        |  CAST(ceil(count(*) / 8.0) AS BIGINT) AS n_batches
        |FROM b GROUP BY 1 ORDER BY bucket_edge""".stripMargin,

    "q_mixture_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
        |    len($toksSql) AS n_tok,
        |    (doc_id * 2654435761) % 1048576 AS prio
        |  FROM documents WHERE source IN ('src0', 'src1', 'src3')),
        |b AS (SELECT *,
        |    CASE source WHEN 'src0' THEN 400 WHEN 'src1' THEN 300
        |         ELSE 250 END AS budget,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY prio, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(before + n_tok AS BIGINT) AS cum_tokens
        |FROM b WHERE before < budget
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,

    "q_global_rownum" ->
      """WITH r AS (SELECT l_partkey,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |SELECT count(*) AS n_rows,
        |  CAST(min(rn) AS BIGINT) AS min_rn,
        |  CAST(max(rn) AS BIGINT) AS max_rn,
        |  CAST(sum(rn * (l_partkey % 97)) AS BIGINT) AS checksum
        |FROM r""".stripMargin,

    "q_ols_trend" ->
      """WITH b AS (SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |s AS (SELECT user_id, count(*) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cps
        |FROM s WHERE n * sxx - sx * sx <> 0
        |ORDER BY user_id""".stripMargin,

    "q_ks_test" ->
      """WITH av AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'view'),
        |bv AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |ca AS (SELECT v, count(*) AS c FROM av GROUP BY 1),
        |cb AS (SELECT v, count(*) AS c FROM bv GROUP BY 1),
        |m AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.c, 0) AS cca, coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(cca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS fa,
        |    sum(ccb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS fb
        |  FROM m),
        |t AS (SELECT max(fa) AS na, max(fb) AS nb FROM c)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |  CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS BIGINT) AS d_num,
        |  round(CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS DOUBLE)
        |    / (t.na * t.nb), 6) AS ks
        |FROM c, t GROUP BY t.na, t.nb""".stripMargin,

    "q_ks_continuous" ->
      """WITH av AS (SELECT value + 1000.0 AS v
        |  FROM events WHERE event_type = 'view'),
        |bv AS (SELECT value + 1000.0 AS v
        |  FROM events WHERE event_type = 'click'),
        |ca AS (SELECT v, count(*) AS c FROM av GROUP BY 1),
        |cb AS (SELECT v, count(*) AS c FROM bv GROUP BY 1),
        |m AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.c, 0) AS cca, coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v,
        |    sum(cca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS fa,
        |    sum(ccb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS fb
        |  FROM m),
        |t AS (SELECT max(fa) AS na, max(fb) AS nb FROM c)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |  CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS BIGINT) AS d_num,
        |  round(CAST(max(abs(c.fa * t.nb - c.fb * t.na)) AS DOUBLE)
        |    / (t.na * t.nb), 6) AS ks
        |FROM c, t GROUP BY t.na, t.nb""".stripMargin,

    "q_chi_squared" ->
      """WITH cells AS (SELECT event_type AS a, user_id % 4 AS b,
        |    count(*) AS o
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b, sum(o) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM cells),
        |g AS (SELECT ra.a, ra.r, cb.b, cb.c FROM ra, cb),
        |f AS (SELECT g.a, g.r, g.b, g.c, coalesce(cl.o, 0) AS o
        |  FROM g LEFT JOIN cells cl ON cl.a = g.a AND cl.b = g.b)
        |SELECT t.n,
        |  CAST((t.ka - 1) * (t.kb - 1) AS BIGINT) AS dof,
        |  round(sum(pow(f.o * t.n - f.r * f.c, 2)
        |    / CAST(f.r * f.c AS DOUBLE) / CAST(t.n AS DOUBLE)), 4)
        |    AS chi2,
        |  round(sqrt(sum(pow(f.o * t.n - f.r * f.c, 2)
        |    / CAST(f.r * f.c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    / CAST(t.n * least(t.ka - 1, t.kb - 1) AS DOUBLE)), 4)
        |    AS cramers_v
        |FROM f, tot t
        |GROUP BY t.n, t.ka, t.kb""".stripMargin,

    "q_vocab_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source AS s,
        |    unnest($toksSql) AS t
        |  FROM documents),
        |sz AS (SELECT s, count(*) AS n FROM st GROUP BY 1),
        |iv AS (SELECT a.s AS src_a, b.s AS src_b, count(*) AS n_common
        |  FROM st a JOIN st b ON a.t = b.t AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
        |  CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
        |  round(CAST(n_common AS DOUBLE)
        |    / (za.n + zb.n - n_common), 6) AS jaccard
        |FROM iv JOIN sz za ON za.s = iv.src_a
        |  JOIN sz zb ON zb.s = iv.src_b
        |ORDER BY src_a, src_b""".stripMargin,

    "q_rank_sum" ->
      """WITH av AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'click'),
        |bv AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'error'),
        |ca AS (SELECT v, count(*) AS c FROM av GROUP BY 1),
        |cb AS (SELECT v, count(*) AS c FROM bv GROUP BY 1),
        |m AS (SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(ca.c, 0) AS cca, coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL JOIN cb ON ca.v = cb.v),
        |c AS (SELECT v, cca, ccb,
        |    coalesce(sum(ccb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS fbb
        |  FROM m)
        |SELECT CAST(sum(cca) AS BIGINT) AS n_a,
        |  CAST(sum(ccb) AS BIGINT) AS n_b,
        |  CAST(sum(cca * (fbb * 2 + ccb)) AS BIGINT) AS u2
        |FROM c""".stripMargin,

    "q_benford" ->
      """SELECT digit, count(*) AS n,
        |  CAST(round(log10(1.0 + 1.0 / digit) * 1000000) AS BIGINT)
        |    AS benford_ppm
        |FROM (
        |  SELECT CAST(substr(CAST(CAST(round(abs(value) * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM events
        |  WHERE value IS NOT NULL AND round(abs(value) * 100) > 0)
        |GROUP BY digit ORDER BY digit""".stripMargin,

    "q_theil_sen" ->
      """WITH b AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE user_id < 40),
        |p AS (SELECT x.user_id,
        |    (y.c - x.c) * 3600.0 / (y.t - x.t) AS s
        |  FROM b x JOIN b y ON x.user_id = y.user_id
        |    AND x.event_id < y.event_id AND x.t <> y.t)
        |SELECT user_id, count(*) AS n_pairs,
        |  round(quantile_cont(s, 0.5), 6) AS slope_cph
        |FROM p GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_target_encode" ->
      """WITH c AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cc FROM events),
        |s AS (SELECT event_type, count(*) AS n, sum(cc) AS sm
        |      FROM c GROUP BY 1),
        |t AS (SELECT count(*) AS tn, sum(cc) AS ts FROM c)
        |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
        |  CAST((CAST(sm AS HUGEINT) * tn + 20 * ts) * 1000000
        |    // ((n + 20) * CAST(tn AS HUGEINT)) AS BIGINT) AS enc_micro
        |FROM s, t ORDER BY event_type""".stripMargin,

    "q_attribution" ->
      """WITH conv AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |    CAST(value AS DECIMAL(12,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |    event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT conv.v, tch.channel
        |  FROM conv ASOF LEFT JOIN tch
        |    ON conv.user_id = tch.user_id AND conv.t >= tch.t)
        |SELECT coalesce(channel, 'direct') AS channel,
        |  count(*) AS n_conversions,
        |  CAST(sum(v) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_random_walks" -> {
      val step = (s: Int) =>
        s"""w$s AS (SELECT w.walk_id, ct.dst AS cur,
          |    w.path || '->' || CAST(ct.dst AS VARCHAR) AS path
          |  FROM w${s - 1} w JOIN ct ON ct.src = w.cur
          |  WHERE (w.walk_id * 2654435761 + ${s * 40503} + 11) % ct.total
          |    BETWEEN ct.lo AND ct.lo + ct.w - 1)""".stripMargin
      s"""WITH ui AS (SELECT DISTINCT user_id,
        |    json_extract_string(props, 'k') AS item
        |  FROM events WHERE props IS NOT NULL),
        |p AS (SELECT CAST(a.item AS BIGINT) AS a, CAST(b.item AS BIGINT) AS b,
        |    count(*) AS w
        |  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |e AS (SELECT a AS src, b AS dst, w FROM p
        |      UNION ALL SELECT b, a, w FROM p),
        |c AS (SELECT src, dst, w,
        |    coalesce(sum(w) OVER (PARTITION BY src ORDER BY dst
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |  FROM e),
        |t AS (SELECT src, CAST(sum(w) AS BIGINT) AS total FROM e GROUP BY 1),
        |ct AS (SELECT c.src, c.dst, c.w, c.lo, t.total
        |       FROM c JOIN t USING (src)),
        |n AS (SELECT DISTINCT src FROM e),
        |w0 AS (SELECT src * 2 + r.j AS walk_id, src AS cur,
        |    CAST(src AS VARCHAR) AS path
        |  FROM n, range(0, 2) r(j)),
        |${step(1)},
        |${step(2)},
        |${step(3)},
        |${step(4)}
        |SELECT walk_id, path FROM w4 ORDER BY walk_id""".stripMargin
    },

    "q_seq_pattern" ->
      """WITH s AS (SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT)
        |    AS n_matches
        |FROM s ORDER BY user_id""".stripMargin,

    "q_quality_fusion" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok,
        |    n_chars
        |  FROM documents),
        |nn AS (SELECT count(*) AS n FROM t),
        |m1 AS (SELECT n_tok, count(*) AS m FROM t GROUP BY 1),
        |b1 AS (SELECT n_tok, CAST(1 + coalesce(sum(m) OVER (ORDER BY n_tok
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10
        |    // (SELECT n FROM nn) AS BIGINT) AS b_n_tok
        |  FROM m1),
        |m2 AS (SELECT n_chars, count(*) AS m FROM t GROUP BY 1),
        |b2 AS (SELECT n_chars, CAST(1 + coalesce(sum(m) OVER (ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10
        |    // (SELECT n FROM nn) AS BIGINT) AS b_n_chars
        |  FROM m2)
        |SELECT t.doc_id, b1.b_n_tok, b2.b_n_chars,
        |  b1.b_n_tok + b2.b_n_chars AS fused
        |FROM t JOIN b1 USING (n_tok) JOIN b2 USING (n_chars)
        |ORDER BY doc_id""".stripMargin,

    "q_embed_outlier" ->
      """SELECT CAST(1 AS BIGINT) AS rank,
        |  CAST(1000000 AS BIGINT) AS vec_id""".stripMargin,

    "q_embed_drift" ->
      """WITH dims AS (
        |  SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT) AS dim),
        |qa AS (SELECT dim,
        |    CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000000.0,
        |      0) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN dims WHERE vec_id % 2 = 0),
        |qb AS (SELECT dim,
        |    CAST(round(CAST(embedding[dim + 1] AS DOUBLE) * 1000000.0,
        |      0) AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN dims WHERE vec_id % 2 = 1),
        |ca AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_a,
        |    sum(CAST(v AS HUGEINT)) AS s_a,
        |    sum(CAST(v AS HUGEINT) * v) AS ss_a
        |  FROM qa GROUP BY dim),
        |cb AS (SELECT dim, CAST(count(*) AS BIGINT) AS n_b,
        |    sum(CAST(v AS HUGEINT)) AS s_b,
        |    sum(CAST(v AS HUGEINT) * v) AS ss_b
        |  FROM qb GROUP BY dim)
        |SELECT dim, n_a, n_b,
        |  round(CAST(s_a * n_b - s_b * n_a AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * n_b * 1000000.0), 6) AS mean_shift,
        |  round(CAST(n_a * ss_a - s_a * s_a AS DOUBLE)
        |    / (CAST(n_a AS DOUBLE) * n_a * 1e12), 6) AS var_a,
        |  round(CAST(n_b * ss_b - s_b * s_b AS DOUBLE)
        |    / (CAST(n_b AS DOUBLE) * n_b * 1e12), 6) AS var_b
        |FROM ca JOIN cb USING (dim) ORDER BY dim""".stripMargin,

    "q_bitext_margin" ->
      """WITH a AS (SELECT vec_id AS a_id, embedding AS av
        |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 16),
        |b AS (SELECT vec_id AS b_id, embedding AS bv
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |s AS (SELECT a_id, b_id,
        |    CAST(round(list_cosine_similarity(CAST(av AS DOUBLE[]),
        |      CAST(bv AS DOUBLE[])) * 1000000, 0) AS BIGINT) AS cosm
        |  FROM a CROSS JOIN b),
        |pa AS (SELECT a_id, CAST(sum(cosm) AS BIGINT) AS pa FROM (
        |    SELECT a_id, cosm, row_number() OVER (PARTITION BY a_id
        |      ORDER BY cosm DESC, b_id) AS r FROM s)
        |  WHERE r <= 4 GROUP BY 1),
        |pb AS (SELECT b_id, CAST(sum(cosm) AS BIGINT) AS pb FROM (
        |    SELECT b_id, cosm, row_number() OVER (PARTITION BY b_id
        |      ORDER BY cosm DESC, a_id) AS r FROM s)
        |  WHERE r <= 4 GROUP BY 1),
        |m AS (SELECT s.a_id, s.b_id, s.cosm,
        |    CASE WHEN pa.pa + pb.pb <= 0 THEN CAST(-2000000000 AS BIGINT)
        |      WHEN s.cosm < 0 THEN CAST(
        |        -((CAST(-s.cosm AS HUGEINT) * 8000000) // (pa.pa + pb.pb))
        |        AS BIGINT)
        |      ELSE CAST((CAST(s.cosm AS HUGEINT) * 8000000)
        |        // (pa.pa + pb.pb) AS BIGINT) END AS margin_ppm
        |  FROM s JOIN pa USING (a_id) JOIN pb USING (b_id)),
        |fwd AS (SELECT a_id, b_id, cosm, margin_ppm FROM (
        |    SELECT m.*, row_number() OVER (PARTITION BY a_id
        |      ORDER BY margin_ppm DESC, b_id) AS r FROM m) WHERE r = 1),
        |bwd AS (SELECT a_id, b_id FROM (
        |    SELECT a_id, b_id, row_number() OVER (PARTITION BY b_id
        |      ORDER BY margin_ppm DESC, a_id) AS r FROM m) WHERE r = 1)
        |SELECT f.a_id, f.b_id, f.cosm AS cos_micro, f.margin_ppm,
        |  (bwd.a_id IS NOT NULL) AS mutual
        |FROM fwd f LEFT JOIN bwd
        |  ON bwd.a_id = f.a_id AND bwd.b_id = f.b_id
        |ORDER BY f.a_id""".stripMargin,

    "q_negative_sampling" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
        |v AS (SELECT token,
        |    CAST(round(pow(count(*), 0.75) * 1000000) AS BIGINT) AS w
        |  FROM tok GROUP BY 1),
        |c AS (SELECT token, w,
        |    coalesce(sum(w) OVER (ORDER BY token
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |  FROM v),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM v),
        |d AS (SELECT r.i AS draw_id,
        |    (r.i * 2654435761 + 42) % t.total AS u
        |  FROM range(0, 500) r(i), tot t)
        |SELECT d.draw_id, c.token
        |FROM d JOIN c ON d.u >= c.lo AND d.u < c.lo + c.w
        |ORDER BY d.draw_id""".stripMargin,

    "q_item_cooc" ->
      """WITH ui AS (SELECT DISTINCT user_id,
        |    json_extract_string(props, 'k') AS item
        |  FROM events WHERE props IS NOT NULL),
        |ic AS (SELECT item, count(*) AS n FROM ui GROUP BY 1),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |    count(*) AS n_ab
        |  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
        |  round(n_ab / sqrt(CAST(ia.n * ib.n AS DOUBLE)), 6) AS cosine
        |FROM p JOIN ic ia ON ia.item = p.item_a
        |  JOIN ic ib ON ib.item = p.item_b
        |ORDER BY item_a, item_b""".stripMargin,

    "q_survivorship" ->
      """WITH lastt AS (
        |  SELECT user_id, event_type AS last_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type IS NOT NULL) WHERE rn = 1),
        |lng AS (
        |  SELECT user_id, props AS longest_props FROM (
        |    SELECT user_id, props, row_number() OVER (
        |      PARTITION BY user_id
        |      ORDER BY length(props) DESC, props DESC) AS rn
        |    FROM events WHERE props IS NOT NULL) WHERE rn = 1),
        |mx AS (SELECT user_id, max(value) AS max_value
        |       FROM events GROUP BY 1),
        |md AS (
        |  SELECT user_id, event_type AS top_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        |    FROM (SELECT user_id, event_type, count(*) AS cnt
        |          FROM events WHERE event_type IS NOT NULL
        |          GROUP BY 1, 2)) WHERE rn = 1)
        |SELECT user_id, last_type, longest_props, max_value, top_type
        |FROM lastt JOIN lng USING (user_id) JOIN mx USING (user_id)
        |  JOIN md USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_rolling_anomaly" ->
      """WITH t AS (SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |w AS (SELECT user_id, event_id, c,
        |    sum(c) OVER win AS s1, sum(c * c) OVER win AS s2,
        |    count(*) OVER win AS m
        |  FROM t WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, c AS cents,
        |  CAST((c * 20 - s1) * (c * 20 - s1) AS BIGINT) AS dev_sq,
        |  CAST(9 * (s2 * 20 - s1 * s1) AS BIGINT) AS bound
        |FROM w WHERE m = 20
        |  AND (c * 20 - s1) * (c * 20 - s1) > 9 * (s2 * 20 - s1 * s1)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_blocking_quality" ->
      """WITH k AS (SELECT doc_id,
        |    lang || '|' || CAST(n_chars // 50 AS VARCHAR) AS bkey
        |  FROM documents),
        |b AS (SELECT bkey, count(*) AS nb FROM k
        |  WHERE bkey IS NOT NULL GROUP BY 1),
        |ba AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    COALESCE(sum(CAST(nb AS HUGEINT) * (nb - 1) // 2), 0) AS cand
        |  FROM b),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM k),
        |tp AS (SELECT d1.doc_id AS a, d2.doc_id AS b
        |  FROM documents d1 JOIN documents d2
        |    ON d2.doc_id = d1.doc_id + 1 AND d2.source = d1.source),
        |cp AS (SELECT CAST(count(*) AS BIGINT) AS true_pairs,
        |    CAST(COALESCE(sum(CASE WHEN ka.bkey IS NOT NULL
        |      AND ka.bkey = kb.bkey THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS captured_pairs
        |  FROM tp JOIN k ka ON ka.doc_id = tp.a
        |    JOIN k kb ON kb.doc_id = tp.b)
        |SELECT n_records, n_blocks, CAST(cand AS BIGINT) AS candidate_pairs,
        |  CAST(CAST(n_records AS HUGEINT) * (n_records - 1) // 2
        |    AS BIGINT) AS all_pairs,
        |  CAST(CASE WHEN n_records >= 2 THEN
        |    ((CAST(n_records AS HUGEINT) * (n_records - 1) // 2 - cand)
        |      * 1000000)
        |    // (CAST(n_records AS HUGEINT) * (n_records - 1) // 2)
        |    ELSE -1 END AS BIGINT) AS reduction_ppm,
        |  true_pairs, captured_pairs,
        |  CAST(CASE WHEN true_pairs > 0 THEN
        |    (CAST(captured_pairs AS HUGEINT) * 1000000) // true_pairs
        |    ELSE -1 END AS BIGINT) AS completeness_ppm
        |FROM t, ba, cp""".stripMargin,

    "q_cusum" ->
      """WITH t AS (SELECT user_id, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |w AS (SELECT user_id, event_id, c,
        |    CAST(sum(c) OVER win AS BIGINT) AS p,
        |    CAST(row_number() OVER win2 AS BIGINT) AS t
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    win2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s
        |  FROM t GROUP BY 1 HAVING count(*) >= 2),
        |d AS (SELECT w.user_id, g.n, w.t, w.event_id,
        |    abs(g.n * w.p - w.t * g.s) AS d_abs
        |  FROM w JOIN g USING (user_id)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY d_abs DESC, t ASC) AS rk FROM d)
        |SELECT user_id, n, t AS change_t, event_id AS change_id,
        |  CAST(d_abs AS BIGINT) AS d_abs
        |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q_event_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(CAST(ts AS TIMESTAMP)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, s.t1, min(CAST(e.ts AS TIMESTAMP)) AS tk
        |  FROM events e JOIN s1 s ON e.user_id = s.u
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s.t1
        |    AND CAST(e.ts AS TIMESTAMP) <= s.t1 + INTERVAL 1 DAY
        |  GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id AS u, s.t1, min(CAST(e.ts AS TIMESTAMP)) AS tk
        |  FROM events e JOIN s2 s ON e.user_id = s.u
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s.tk
        |    AND CAST(e.ts AS TIMESTAMP) <= s.t1 + INTERVAL 1 DAY
        |  GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS level, 'view' AS step,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY level""".stripMargin,

    "q_retention_fit" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
        |      AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |g AS (SELECT cohort_week,
        |    CAST((wk - cohort_week) // 7 AS BIGINT) AS week_offset,
        |    count(*) AS n_users
        |  FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |c AS (SELECT week_offset, CAST(sum(n_users) AS BIGINT) AS n
        |  FROM g GROUP BY 1),
        |b AS (SELECT n AS n0 FROM c WHERE week_offset = 0),
        |p AS (SELECT
        |    CAST(round(ln(CAST(week_offset AS DOUBLE)) * 1000000, 0)
        |      AS BIGINT) AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      * 1000000, 0) AS BIGINT) AS y
        |  FROM c, b WHERE week_offset >= 1 AND n > 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM p)
        |SELECT n_points,
        |  round(CAST(n_points * sxy - sx * sy AS DOUBLE)
        |    / CAST(n_points * sxx - sx * sx AS DOUBLE), 6)
        |    AS decay_exponent,
        |  round((CAST(sy AS DOUBLE)
        |      - CAST(n_points * sxy - sx * sy AS DOUBLE)
        |        / CAST(n_points * sxx - sx * sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n_points AS DOUBLE) / 1000000, 6) AS ln_r1
        |FROM m WHERE n_points * sxx - sx * sx <> 0""".stripMargin,

    "q_cohort_weekly" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS DATE)
        |      AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |g AS (SELECT cohort_week,
        |    CAST((wk - cohort_week) // 7 AS BIGINT) AS week_offset,
        |    count(*) AS n_users
        |  FROM a JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        |  week_offset, n_users
        |FROM g ORDER BY 1, 2""".stripMargin,

    "q_aes_sample" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |    ln(((doc_id * 2654435761) % 2147483648 + 1) / 2147483649.0)
        |      / n_chars AS key
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY key DESC, doc_id) AS sample_rank FROM t)
        |SELECT source, sample_rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r WHERE sample_rank <= 3
        |ORDER BY source, sample_rank""".stripMargin)
}
