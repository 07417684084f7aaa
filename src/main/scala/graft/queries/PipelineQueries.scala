package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, KMeansOps, PipelineOps, RangeJoin, TextAnalysis}
import graft.plans.TopK

/** Round-2 pipeline operators through the driver contract: binned range
  * join, per-domain capping, repetition metrics, benchmark
  * contamination, sequence packing, salted aggregation, and k-means —
  * each oracle-checked against DuckDB where SQL-expressible (k-means is
  * iterative, rows-only + `KMeansSpec` cost-descent golden).
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Epoch days from a timestamp column (both engines agree: date
    * truncation then day diff from 1970-01-01).
    */
  private def days(c: Column): Column =
    datediff(to_date(c), to_date(lit("1970-01-01"))).cast("long")

  val queries: Map[String, Q] = Map(
    // Serpentine balanced sharding: docs ranked by token count desc are
    // dealt back-and-forth into 8 shards; per-shard totals must match
    // the oracle's identical rank arithmetic.
    "q_serpentine_shards" -> { (s, dir) =>
      PipelineOps.serpentineShards(Tables.load(s, dir, "documents"),
        "doc_id", "text", shards = 8)
    },

    // Deterministic per-epoch shuffling with batch assignment: two
    // epochs over the same corpus give different, reproducible orders
    // from pure hash arithmetic; ordinals come from the segmented
    // prefix scan (an epoch is the whole corpus — the worst possible
    // window key).
    "q_epoch_order" -> { (s, dir) =>
      PipelineOps.epochOrder(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
            .select(col("doc_id")),
          "doc_id", epochs = 2, batchSize = 32, seed = 11L)
        .orderBy(col("epoch"), col("ord"))
    },

    // Binned range join: lineitems shipped within 7 days of a sampled
    // order's date (no equi-key — a pure interval predicate that would
    // otherwise plan as a nested loop).
    "q_range_join" -> { (s, dir) =>
      val iv = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 40 === 0)
        .select(col("o_orderpriority"), days(col("o_orderdate")).as("d_start"))
        .withColumn("d_end", col("d_start") + lit(7L))
      val pts = Tables.load(s, dir, "lineitem")
        .select(col("l_quantity"), days(col("l_shipdate")).as("d_ship"))
      RangeJoin.binned(pts, iv, "d_ship", "d_start", "d_end", binWidth = 8L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty_sum"))
        .orderBy(col("o_orderpriority"))
    },

    // Per-domain cap: synthesize a URL per doc, extract its host, keep
    // the 5 largest docs per domain via the custom TopKPerKey operator
    // (bounded heaps — no per-domain sort).
    "q_domain_cap" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/"), col("doc_id")))
        .withColumn("domain", regexp_extract(col("url"), "^https?://([^/]+)/", 1))
      TopK.perKey(docs, Seq(col("domain")),
          Seq(col("n_chars").desc, col("doc_id").asc), k = 5)
        .select(col("domain"), col("doc_id"), col("n_chars"))
        .orderBy(col("domain"), desc("n_chars"), asc("doc_id"))
    },

    // Intra-doc repetition metrics, aggregated per language.
    "q_repetition" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.repetitionMetrics(docs, "text")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("dup_word_frac")), 4).as("mean_dup_word"),
          round(avg(col("dup_bigram_frac")), 4).as("mean_dup_bigram"),
          round(avg(col("dup_trigram_frac")), 4).as("mean_dup_trigram"))
        .orderBy(col("lang"))
    },

    // Benchmark contamination: training docs sharing >= 3 distinct
    // 5-grams with the benchmark subset (doc_id % 97 == 0), per source.
    "q_contamination" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.contamination(docs, n = 5, benchMod = 97L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_shared") >= 3, 1L).otherwise(0L)).as("n_contaminated"),
          sum(col("n_shared")).as("shared_total"))
        .orderBy(col("source"))
    },

    // Greedy sequence packing at a 2048-token budget, per source shard.
    "q_seq_packing" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.sequencePacking(docs, "source", "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("long"), budget = 2048L)
        .groupBy(col("source"), col("seq_bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
        .orderBy(col("source"), col("seq_bin"))
    },

    // Salted two-phase aggregation over the (low-cardinality, hence
    // skewed-at-scale) event_type key; result identical to direct agg.
    "q_skew_salted" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      PipelineOps.saltedCountSum(ev, "event_type",
          floor(col("value") * 100).cast("long"), saltSrc = col("event_id"))
        .orderBy(col("event_type"))
    },

    // Lloyd k-means ENVELOPE (oracle-checked): the assignment must
    // cover every input vector exactly once (n_vecs == table count —
    // SQL-exact), use at most k cells, and Lloyd's monotone-descent
    // guarantee must hold (cost after 2 iterations <= cost under the
    // initial centroids).  Cost-descent/determinism goldens: KMeansSpec.
    "q_kmeans" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val fit2 = KMeansOps.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
      val fit0 = KMeansOps.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
      fit2.agg(count(lit(1)).as("n_vecs"),
          (countDistinct(col("cell")) <= 8).as("cells_le_k"),
          avg(col("d2")).as("__c2"))
        .crossJoin(fit0.agg(avg(col("d2")).as("__c0")))
        .select(col("n_vecs"), col("cells_le_k"),
          (col("__c2") <= col("__c0") + lit(1e-9)).as("cost_decreased"))
    },

    // Overlapping 64-token context windows every 48 tokens; per-chunk
    // md5 makes the oracle byte-exact on chunk CONTENT, not just counts.
    "q_doc_chunks" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
      PipelineOps.chunkDocuments(docs, "doc_id", "text", chunkSize = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"),
          md5(col("chunk")).as("chunk_md5"), col("n_tok"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Temperature mixture sampling at alpha=0.5 / budget=5000: exact
    // per-source keep sets (counts + id sums) against the DuckDB mirror.
    "q_mixture_sample" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.temperatureSample(docs, "source", "doc_id",
          alpha = 0.5, budget = 5000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))
    },

    // C4/Gopher-style curation funnel: first-failing-reason status per
    // doc; per-(source, status) counts prove the exact classification.
    "q_curation_funnel" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.curationFunnel(docs, "text")
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"), col("status"))
    },

    // Deterministic 80/10/10 split; per (split, lang) counts + id sums
    // prove the exact assignment, not just the proportions.
    "q_train_split" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      PipelineOps.assignSplit(docs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"), col("lang"))
    },

    // Leakage-safe grouped split vs naive row split, audited from the
    // OUTPUT: hashing each event's own id scatters a user across
    // train/val/test (n_leaky_groups > 0); hashing the user id pins
    // every user to one split (n_leaky_groups = 0, proven not assumed).
    "q_group_split" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      def audit(method: String, keyCol: String) =
        PipelineOps.splitLeakage(
            PipelineOps.assignSplit(ev, keyCol, w), "user_id")
          .select(lit(method).as("method"), col("n_groups"),
            col("n_leaky_groups"), col("max_splits_per_group"))
      audit("row_hash", "event_id").union(audit("group_hash", "user_id"))
        .orderBy(col("method"))
    },

    // END-TO-END curation pipeline: funnel screen → exact keep-first
    // dedup → deterministic train/val/test split → greedy packing of
    // the train shard — four operators COMPOSED, each stage feeding
    // the next, and the whole chain oracle-checked as one DuckDB twin
    // (per-split doc counts + id sums, train bin count + token total).
    // This is the "a user runs their whole pipeline on graft" gate:
    // any drift in any stage, or in how stages compose, breaks it.
    "q_pipeline_e2e" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val kept = PipelineOps.curationFunnel(docs, "text")
        .filter(col("status") === "kept")
        .select(col("doc_id"), col("source"), col("text"))
      val deduped = Dedup.dropExactDuplicates(kept, "doc_id", "text")
      val split = PipelineOps.assignSplit(deduped, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val packed = PipelineOps.sequencePacking(
        split.filter(col("split") === "train"), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")).cast("long"), budget = 2048L)
      val splitCounts = split.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
      val packStats = packed.agg(
        countDistinct(struct(col("source"), col("seq_bin")))
          .as("n_train_bins"),
        sum(col("n_tok")).cast("long").as("train_tokens"))
      splitCounts.crossJoin(broadcast(packStats)).orderBy(col("split"))
    },

    // T5-style span corruption: deterministic sentinel masking
    // ((p + doc_id) % 7 starts a 3-token span) producing the
    // (corrupted input, span targets) denoising pair byte-exactly on
    // both engines — corrupted text, target string, and mask counts
    // all oracle-checked per document.
    "q_span_corrupt" -> { (s, dir) =>
      graft.ops.Augment.spanCorrupt(Tables.load(s, dir, "documents"),
          "doc_id", "text", every = 7, spanLen = 3)
        .orderBy(col("doc_id"))
    },

    // Fill-in-the-middle transform (Bavarian et al. 2022): half the
    // corpus hash-selected, deterministic char splits, PSM/SPM chosen
    // per doc — byte-exact on both engines, pure map-only projection.
    "q_fim" -> { (s, dir) =>
      graft.ops.Augment.fimTransform(Tables.load(s, dir, "documents"),
          "doc_id", "text", ratePpm = 500000L, seed = 0L)
        .orderBy(col("doc_id"))
    },

    // Dolma/RefinedWeb-style frequent-unit scrub: any unit occurring
    // in >= 390 of the 500 docs is boilerplate and is cut from EVERY
    // doc (space-delimited units here — the corpus has no newlines;
    // the op is delimiter-generic and the "\n" path is spec-tested).
    "q_line_scrub" -> { (s, dir) =>
      graft.ops.Dedup.frequentUnitRemoval(Tables.load(s, dir, "documents"),
          "doc_id", "text", delim = " ", minDocs = 390)
        .orderBy(col("doc_id"))
    },

    // Exact-proportion stratified split: every source gets EXACTLY
    // ⌊n_s/10⌋ val and ⌊n_s/4⌋−⌊n_s/10⌋ test docs (doc_id order) — the
    // guarantee the hash split (q_group_split) only hits in
    // expectation.  Rank via segmentedPrefixSum, never a per-source
    // window; the gate reports per-(source, split) counts and id
    // ranges so the cut points are pinned exactly.
    "q_stratified_split" -> { (s, dir) =>
      graft.ops.PipelineOps.stratifiedExactSplit(
          Tables.load(s, dir, "documents").select(col("doc_id"),
            col("source")),
          Seq("source"), Seq("doc_id"),
          valPpm = 100000L, testPpm = 150000L)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"), col("split"))
    },

    // Water-filling budget allocation across sources: 30k chars
    // distributed by doc-count weight but capped at a third of each
    // source's available chars — capped sources' surplus re-flows
    // exactly (one pass over the sorted domain frame, no iteration).
    "q_budget_waterfill" -> { (s, dir) =>
      val domains = Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("CAST(sum(n_chars) div 3 AS BIGINT)").as("cap_chars"))
      graft.ops.PipelineOps.waterFillBudget(domains, "source",
          "n_docs", "cap_chars", budget = 48000L)
        .orderBy(col("source"))
    },

    // Greedy max-coverage selection of 3 docs from the %17 candidate
    // pool: each round the doc adding the most uncovered distinct
    // tokens (ties to smaller id) — the submodular diverse-subset
    // kernel; the DuckDB twin unrolls the 3 greedy rounds exactly.
    "q_coverage_select" -> { (s, dir) =>
      graft.ops.PipelineOps.greedyCoverageSelect(
        Tables.load(s, dir, "documents")
          .filter(pmod(col("doc_id"), lit(17L)) === 0L),
        "doc_id", "text", k = 3)
    })

  /** DuckDB twin of TextAnalysis.tokens (same as OpsQueries). */
  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  /** DuckDB word n-grams over a token list column named `toks`:
    * i-th gram = join of toks[i .. i+n-1]; empty when len < n
    * (DuckDB `range(a, b)` is end-exclusive and empty for b <= a).
    */
  private def ngramSql(n: Int): String =
    s"list_transform(range(1, len(toks) - ${n - 2}), i -> array_to_string(toks[i:i+${n - 1}], ' '))"

  private def dupFracSql(g: String): String =
    s"CASE WHEN len($g) > 0 THEN round(1.0 - len(list_distinct($g))::DOUBLE / len($g), 6) ELSE 0.0 END"

  val oracle: Map[String, String] = Map(
    "q_serpentine_shards" ->
      s"""WITH t AS (
        |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS w
        |  FROM documents),
        |r AS (SELECT doc_id, w,
        |        row_number() OVER (ORDER BY -w, doc_id) - 1 AS i
        |      FROM t)
        |SELECT CAST(CASE WHEN (i // 8) % 2 = 0 THEN i % 8
        |                 ELSE 7 - i % 8 END AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS n_tokens
        |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,

    "q_epoch_order" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        |e AS (SELECT doc_id, unnest(range(0, 2)) AS epoch FROM d),
        |p AS (SELECT epoch, doc_id, (u * u + u) % 2147483648 AS prio
        |      FROM (SELECT epoch, doc_id,
        |              (doc_id * 2654435761 + epoch * 40503 + 11)
        |                % 2147483648 AS u
        |            FROM e)),
        |r AS (SELECT epoch, doc_id,
        |        row_number() OVER (PARTITION BY epoch
        |          ORDER BY prio, doc_id) AS ord
        |      FROM p)
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |  CAST(ord AS BIGINT) AS ord,
        |  CAST((ord - 1) // 32 AS BIGINT) AS batch_id
        |FROM r ORDER BY epoch, ord""".stripMargin,

    "q_pipeline_e2e" ->
      s"""WITH base AS (
        |  SELECT source, doc_id, text, $toksSql AS toks FROM documents),
        |m AS (
        |  SELECT source, doc_id, text, len(toks) AS ntok,
        |    ${dupFracSql("toks")} AS dup,
        |    round(greatest(0.0, least(1.0,
        |      0.5 + 0.5*sr - pr - (CASE WHEN awl < 2 OR awl > 12 THEN 0.25 ELSE 0.0 END))), 6) AS q
        |  FROM (
        |    SELECT source, doc_id, text, toks,
        |      CASE WHEN len(toks) > 0
        |        THEN list_reduce(list_transform(toks, t -> len(t)), (a,b) -> a+b)::DOUBLE / len(toks)
        |        ELSE 0.0 END AS awl,
        |      CASE WHEN len(text) > 0
        |        THEN (len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / len(text)
        |        ELSE 0.0 END AS pr,
        |      CASE WHEN len(toks) > 0
        |        THEN len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t)))::DOUBLE / len(toks)
        |        ELSE 0.0 END AS sr
        |    FROM base)),
        |kept AS (
        |  SELECT source, doc_id, text, ntok FROM m
        |  WHERE NOT (ntok < 10) AND NOT (dup > 0.3) AND NOT (q < 0.3)),
        |ded AS (
        |  SELECT source, doc_id, ntok FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
        |        '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |    FROM kept) WHERE rn = 1),
        |sp AS (
        |  SELECT source, doc_id, ntok,
        |    CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM ded),
        |packed AS (
        |  SELECT source,
        |    CAST(floor(COALESCE(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT)
        |      AS seq_bin,
        |    ntok
        |  FROM sp WHERE split = 'train'),
        |ps AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM
        |            (SELECT DISTINCT source, seq_bin FROM packed)) AS n_train_bins,
        |         (SELECT CAST(sum(ntok) AS BIGINT) FROM packed) AS train_tokens)
        |SELECT split, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       n_train_bins, train_tokens
        |FROM sp, ps GROUP BY split, n_train_bins, train_tokens
        |ORDER BY split""".stripMargin,

    "q_span_corrupt" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS arr FROM documents),
        |tok AS (
        |  SELECT doc_id, p, arr[p + 1] AS tok FROM (
        |    SELECT doc_id, arr, unnest(range(0, len(arr))) AS p FROM toks)),
        |starts AS (
        |  SELECT doc_id, p,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS k
        |  FROM tok WHERE (p + doc_id) % 7 = 0),
        |covered AS (
        |  SELECT doc_id, k, unnest(range(p, p + 3)) AS cp FROM starts),
        |spantoks AS (
        |  SELECT t.doc_id, c.k, t.p, t.tok
        |  FROM tok t JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.cp),
        |spantext AS (
        |  SELECT doc_id, k, string_agg(tok, ' ' ORDER BY p) AS stext,
        |         count(*) AS slen
        |  FROM spantoks GROUP BY 1, 2),
        |targ AS (
        |  SELECT doc_id,
        |    string_agg('<extra_id_' || k || '> ' || stext, ' ' ORDER BY k)
        |      AS targets,
        |    count(*) AS n_spans, CAST(sum(slen) AS BIGINT) AS n_masked
        |  FROM spantext GROUP BY 1),
        |keptuni AS (
        |  SELECT t.doc_id, t.p, t.tok FROM tok t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.cp
        |  WHERE c.cp IS NULL
        |  UNION ALL
        |  SELECT doc_id, p, '<extra_id_' || k || '>' FROM starts),
        |corr AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS corrupted
        |  FROM keptuni GROUP BY 1)
        |SELECT d.doc_id, coalesce(c.corrupted, '') AS corrupted,
        |  coalesce(t.targets, '') AS targets,
        |  CAST(coalesce(t.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(t.n_masked, 0) AS BIGINT) AS n_masked
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN corr c USING (doc_id) LEFT JOIN targ t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderpriority, count(*) AS n_pairs,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
        |FROM (SELECT o_orderpriority,
        |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d_start
        |      FROM orders WHERE o_orderkey % 40 = 0) o
        |JOIN (SELECT l_quantity,
        |        date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d_ship
        |      FROM lineitem) l
        |  ON l.d_ship BETWEEN o.d_start AND o.d_start + 7
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_domain_cap" ->
      """SELECT domain, doc_id, n_chars FROM (
        |  SELECT domain, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM (SELECT regexp_extract('https://' || source || '.example.com/' || lang || '/' || doc_id,
        |          '^https?://([^/]+)/', 1) AS domain, doc_id, n_chars
        |        FROM documents))
        |WHERE rn <= 5 ORDER BY domain, n_chars DESC, doc_id ASC""".stripMargin,

    "q_repetition" ->
      s"""SELECT lang, count(*) AS n_docs,
        |  round(avg(dw), 4) AS mean_dup_word,
        |  round(avg(d2), 4) AS mean_dup_bigram,
        |  round(avg(d3), 4) AS mean_dup_trigram
        |FROM (
        |  SELECT lang,
        |    ${dupFracSql("toks")} AS dw,
        |    ${dupFracSql(ngramSql(2))} AS d2,
        |    ${dupFracSql(ngramSql(3))} AS d3
        |  FROM (SELECT lang, $toksSql AS toks FROM documents))
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_contamination" ->
      s"""WITH g AS (
        |  SELECT doc_id, source, list_distinct(${ngramSql(5)}) AS gs
        |  FROM (SELECT doc_id, source, $toksSql AS toks FROM documents)),
        |bench AS (SELECT DISTINCT unnest(gs) AS bg FROM g WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id, unnest(gs) AS ng FROM g WHERE doc_id % 97 <> 0),
        |per AS (SELECT tr.doc_id, count(bench.bg) AS n_shared
        |        FROM tr LEFT JOIN bench ON tr.ng = bench.bg GROUP BY tr.doc_id)
        |SELECT g.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(per.n_shared, 0) >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(sum(coalesce(per.n_shared, 0)) AS BIGINT) AS shared_total
        |FROM g LEFT JOIN per ON g.doc_id = per.doc_id
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY g.source ORDER BY g.source""".stripMargin,

    "q_seq_packing" ->
      s"""SELECT source, seq_bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS tok_sum
        |FROM (
        |  SELECT source,
        |    CAST(floor(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS seq_bin,
        |    n_tok
        |  FROM (SELECT source, doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents))
        |GROUP BY source, seq_bin ORDER BY source, seq_bin""".stripMargin,

    "q_skew_salted" ->
      """SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS val_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_kmeans" ->
      """SELECT count(*) AS n_vecs, true AS cells_le_k, true AS cost_decreased
        |FROM embeddings""".stripMargin,

    // Window starts: Spark sequence(0, n-1, 48) == DuckDB range(0, n, 48)
    // (end-inclusive-by-step vs end-exclusive agree for n >= 1);
    // list slice [st+1 : st+64] == Spark slice(toks, st+1, 64).
    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS wtoks
        |           FROM documents WHERE doc_id < 200 AND len(trim(text)) > 0),
        |s AS (SELECT doc_id, wtoks, unnest(range(0, len(wtoks), 48)) AS st FROM t)
        |SELECT doc_id, CAST(st // 48 AS BIGINT) AS chunk_idx,
        |  md5(array_to_string(wtoks[st+1 : st+64], ' ')) AS chunk_md5,
        |  CAST(len(wtoks[st+1 : st+64]) AS BIGINT) AS n_tok
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_mixture_sample" ->
      """WITH c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source),
        |r AS (SELECT source,
        |        round(least(1.0, pow(n, 0.5) / sum(pow(n, 0.5)) OVER () * 5000 / n), 9) AS keep_rate
        |      FROM c)
        |SELECT d.source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE (doc_id * 2654435761) % 1000000 < keep_rate * 1000000
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "q_curation_funnel" ->
      s"""WITH base AS (SELECT source, doc_id, text, $toksSql AS toks FROM documents),
        |m AS (
        |  SELECT source, doc_id, len(toks) AS ntok,
        |    ${dupFracSql("toks")} AS dup,
        |    round(greatest(0.0, least(1.0,
        |      0.5 + 0.5*sr - pr - (CASE WHEN awl < 2 OR awl > 12 THEN 0.25 ELSE 0.0 END))), 6) AS q
        |  FROM (
        |    SELECT source, doc_id, toks,
        |      CASE WHEN len(toks) > 0
        |        THEN list_reduce(list_transform(toks, t -> len(t)), (a,b) -> a+b)::DOUBLE / len(toks)
        |        ELSE 0.0 END AS awl,
        |      CASE WHEN len(text) > 0
        |        THEN (len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / len(text)
        |        ELSE 0.0 END AS pr,
        |      CASE WHEN len(toks) > 0
        |        THEN len(list_filter(toks, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t)))::DOUBLE / len(toks)
        |        ELSE 0.0 END AS sr
        |    FROM base))
        |SELECT source, status, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT source, doc_id,
        |        CASE WHEN ntok < 10 THEN 'too_short'
        |             WHEN dup > 0.3 THEN 'repetitive'
        |             WHEN q < 0.3 THEN 'low_quality'
        |             ELSE 'kept' END AS status
        |      FROM m)
        |GROUP BY source, status ORDER BY source, status""".stripMargin,

    "q_fim" ->
      """WITH s1 AS (SELECT doc_id, text, length(text) AS l,
        |    (doc_id * 31 + 7) % (length(text) + 1) AS p1
        |  FROM documents),
        |s2 AS (SELECT doc_id, text, l, p1,
        |    p1 + (doc_id * 17 + 3) % (l - p1 + 1) AS p2 FROM s1),
        |s3 AS (SELECT doc_id, text,
        |    ((doc_id * 2654435761) % 1000000 < 500000 AND l >= 2) AS sel,
        |    (doc_id % 2 = 1) AS spm,
        |    substr(text, 1, p1) AS pre,
        |    substr(text, p1 + 1, p2 - p1) AS mid,
        |    substr(text, p2 + 1, l - p2) AS suf
        |  FROM s2)
        |SELECT doc_id,
        |  CASE WHEN NOT sel THEN 'plain' WHEN spm THEN 'spm'
        |    ELSE 'psm' END AS format,
        |  CASE WHEN NOT sel THEN text
        |    WHEN spm THEN '<SUF>' || suf || '<PRE>' || pre || '<MID>' || mid
        |    ELSE '<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid
        |  END AS fim_text
        |FROM s3 ORDER BY doc_id""".stripMargin,

    "q_line_scrub" ->
      """WITH l AS (SELECT doc_id, string_split(text, ' ') AS u
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(range(1, len(u) + 1)) AS pos, u
        |  FROM l),
        |e2 AS (SELECT doc_id, pos, u[pos] AS unit FROM e),
        |f AS (SELECT unit FROM (SELECT unit, count(DISTINCT doc_id) AS df
        |    FROM e2 GROUP BY 1) WHERE df >= 390),
        |k AS (SELECT e2.doc_id, e2.pos, e2.unit, f.unit IS NOT NULL AS rm
        |  FROM e2 LEFT JOIN f USING (unit))
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN NOT rm THEN unit END,
        |    ' ' ORDER BY pos), '') AS clean_text,
        |  count(*) AS n_units,
        |  CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_stratified_split" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
        |      AS b,
        |    count(*) OVER (PARTITION BY source) AS ns
        |  FROM documents),
        |a AS (SELECT doc_id, source,
        |    CASE WHEN b < (CAST(ns AS HUGEINT) * 100000) // 1000000
        |           THEN 'val'
        |         WHEN b < (CAST(ns AS HUGEINT) * 250000) // 1000000
        |           THEN 'test'
        |         ELSE 'train' END AS split
        |  FROM r)
        |SELECT source, split, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_budget_waterfill" ->
      """WITH d AS (SELECT source AS dom, CAST(count(*) AS BIGINT) AS w,
        |    CAST(sum(n_chars) // 3 AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |o AS (SELECT dom, w, c,
        |    coalesce(sum(c) OVER (ORDER BY CAST(c AS DOUBLE) / w, dom
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumc,
        |    coalesce(sum(w) OVER (ORDER BY CAST(c AS DOUBLE) / w, dom
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumw
        |  FROM d),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS totw FROM d),
        |h AS (SELECT o.*, CASE WHEN CAST(c AS HUGEINT) * (t.totw - cumw)
        |      <= CAST(48000 - cumc AS HUGEINT) * w THEN 1 ELSE 0 END
        |      AS hold
        |  FROM o, t),
        |cp AS (SELECT *, sum(1 - hold) OVER (
        |      ORDER BY CAST(c AS DOUBLE) / w, dom
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
        |      AS capped
        |  FROM h),
        |l AS (SELECT
        |    CAST(sum(CASE WHEN capped THEN c ELSE 0 END) AS BIGINT)
        |      AS cappedc,
        |    CAST(sum(CASE WHEN capped THEN 0 ELSE w END) AS BIGINT)
        |      AS wstar
        |  FROM cp),
        |b2 AS (SELECT cp.*,
        |    greatest(0, 48000 - l.cappedc) AS rstar, l.wstar,
        |    CASE WHEN capped THEN c ELSE
        |      CAST((CAST(greatest(0, 48000 - l.cappedc) AS HUGEINT) * w)
        |        // l.wstar AS BIGINT) END AS base,
        |    CASE WHEN capped THEN -1 ELSE
        |      CAST((CAST(greatest(0, 48000 - l.cappedc) AS HUGEINT) * w)
        |        % l.wstar AS BIGINT) END AS rem
        |  FROM cp, l),
        |e AS (SELECT max(rstar) AS r2,
        |    CAST(sum(CASE WHEN capped THEN 0 ELSE base END) AS BIGINT)
        |      AS basesum
        |  FROM b2)
        |SELECT dom AS source, w AS weight, c AS cap,
        |  CASE WHEN capped THEN c ELSE base +
        |    (CASE WHEN row_number() OVER (ORDER BY rem DESC, dom ASC)
        |       <= e.r2 - e.basesum THEN 1 ELSE 0 END) END AS alloc,
        |  capped
        |FROM b2, e ORDER BY source""".stripMargin,

    "q_coverage_select" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' '))
        |    AS g FROM documents WHERE doc_id % 17 = 0),
        |t AS (SELECT doc_id, unnest(g) AS tok FROM d),
        |w1 AS (SELECT doc_id, count(*) AS gain FROM t GROUP BY 1
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |c1 AS (SELECT DISTINCT tok FROM t JOIN w1 USING (doc_id)),
        |w2 AS (SELECT doc_id, count(*) AS gain FROM t
        |  WHERE doc_id NOT IN (SELECT doc_id FROM w1)
        |    AND tok NOT IN (SELECT tok FROM c1)
        |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
        |c2 AS (SELECT tok FROM c1 UNION
        |       SELECT tok FROM t JOIN w2 USING (doc_id)),
        |w3 AS (SELECT doc_id, count(*) AS gain FROM t
        |  WHERE doc_id NOT IN (SELECT doc_id FROM w1
        |      UNION ALL SELECT doc_id FROM w2)
        |    AND tok NOT IN (SELECT tok FROM c2)
        |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT 1 AS round, doc_id, CAST(gain AS BIGINT) AS new_grams,
        |    CAST((SELECT count(*) FROM c1) AS BIGINT) AS covered_total
        |  FROM w1
        |  UNION ALL
        |  SELECT 2, doc_id, CAST(gain AS BIGINT),
        |    CAST((SELECT count(*) FROM c2) AS BIGINT) FROM w2
        |  UNION ALL
        |  SELECT 3, doc_id, CAST(gain AS BIGINT),
        |    CAST((SELECT count(*) FROM c2) + gain AS BIGINT) FROM w3)
        |ORDER BY round""".stripMargin,

    "q_group_split" ->
      """WITH rs AS (SELECT user_id,
        |    CASE WHEN (event_id * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN (event_id * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split FROM events),
        |ra AS (SELECT user_id, count(DISTINCT split) AS k
        |  FROM rs GROUP BY 1),
        |gs AS (SELECT user_id,
        |    CASE WHEN (user_id * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN (user_id * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split FROM events),
        |ga AS (SELECT user_id, count(DISTINCT split) AS k
        |  FROM gs GROUP BY 1)
        |SELECT 'row_hash' AS method, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_leaky_groups,
        |  CAST(max(k) AS BIGINT) AS max_splits_per_group FROM ra
        |UNION ALL
        |SELECT 'group_hash' AS method, CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(k) AS BIGINT) FROM ga
        |ORDER BY method""".stripMargin,

    "q_train_split" ->
      """SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT lang, doc_id,
        |        CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |             WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
        |             ELSE 'test' END AS split
        |      FROM documents)
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin)
}
