package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Checks, Dedup, Drift, DupClusters, Multimodal, Pq, Profile, Quantize, SemDedup, Similarity, TableDiff, TextAnalysis}

/** Query entries for the LLM-pipeline operators (dedup, similarity,
  * text analysis, multimodal) — the north-star additions beyond the
  * reference's own surface.  Where the semantics are SQL-expressible the
  * oracle is exact DuckDB SQL; signature-based ops (MinHash/SimHash/LSH)
  * are deterministic but not SQL-expressible, so they ship as rows-only
  * checks here and get golden ScalaTest coverage instead.
  */
object OpsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact dedup: duplicate-group stats per language.  The distinct
    // key is a 128-bit struct of two independently-seeded xxhash64
    // values over the normalized text — a 16-byte shuffle row instead
    // of the document, collision-safe past 1e10 docs (same key as
    // graft.ops.Dedup; the DuckDB oracle counts distinct normalized
    // TEXTS, so any collision would break the hash match).
    "q_dedup_exact" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val nt = TextAnalysis.normalize(col("text"))
      docs.select(col("lang"), col("doc_id"),
          struct(xxhash64(nt), xxhash64(lit("graft-dedup-2"), nt)).as("nh"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("nh")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("nh"))).as("n_dupes"))
        .orderBy(col("lang"))
    },

    // Exact dedup keep-first: survivor count + sum of surviving ids.
    "q_dedup_keep_first" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.dropExactDuplicates(docs, "doc_id", "text")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
    },

    // Quality-weighted downsampling: keep each doc with probability
    // proportional to its quality score, decided by deterministic key
    // arithmetic (no RNG, reproducible across runs/partitionings) —
    // the curation step that biases a training mix toward clean text.
    // A pure filter over a narrow projection: no shuffle before the
    // final stats aggregation.
    "q_weighted_sample" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("doc_id"), col("lang"),
          TextAnalysis.qualityMetrics(col("text")).getField("quality_score").as("q"))
        .filter(pmod(col("doc_id") * lit(2654435761L), lit(1000)) < col("q") * 1000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    },

    // Text quality metrics, aggregated per language.
    "q_text_quality" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("lang"), TextAnalysis.qualityMetrics(col("text")).as("m"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("m.n_tokens")).as("total_tokens"),
          round(avg(col("m.avg_word_len")), 4).as("mean_word_len"),
          round(avg(col("m.stopword_ratio")), 4).as("mean_stop_ratio"),
          round(avg(col("m.quality_score")), 4).as("mean_quality"))
        .orderBy(col("lang"))
    },

    // Token counting (regex tokens + subword estimate).
    "q_token_count" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tok"),
          TextAnalysis.subwordEstimate(col("text")).as("n_sub"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("n_sub")).as("total_subwords"))
        .orderBy(col("source"))
    },

    // Language-ID heuristic vs the labeled lang column (confusion counts).
    "q_lang_id" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("lang"), TextAnalysis.languageId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))
    },

    // Document fingerprints (custom RollingHash64 expression), oracle-
    // checked via the distinct envelope: a 64-bit hash is injective on
    // gate-scale corpora, so distinct fingerprints per source must equal
    // distinct NORMALIZED texts — which DuckDB computes directly.  A
    // collision or a broken normalization breaks the match; the exact
    // hash values are additionally golden-tested in UdfSpec.
    "q_fingerprint" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      docs.select(col("source"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct_fp"))
        .orderBy(col("source"))
    },

    // MinHash+LSH precision ENVELOPE (oracle-checked): the exact-Jaccard
    // refine guarantees every emitted pair has true Jaccard >= threshold
    // with the exact similarity value, i.e. found ⊆ exact-pairs with
    // matching jaccard.  The anti-join against the brute-force twin
    // (same shingle definition) must therefore be EMPTY, and the
    // exact-pair count is DuckDB-computable on the capped subset.
    // (Twin-pair recall is the companion q_dedup_minhash_recall entry;
    // pair-level goldens live in DedupSpec.)
    "q_dedup_minhash" -> { (s, dir) =>
      val docs = jaccardProbeDocs(s, dir)
      // fanOutInput = false: the probe slice is capped at ~200 docs by
      // construction — the input-skew exchange is pure overhead here
      // (r16 isolated ×5: 0.90 s → 1.30 s with it, back without)
      val found = Dedup.minhashPairs(docs, "doc_id", "text",
        threshold = 0.5, fanOutInput = false)
      val exact = Dedup.jaccardPairsExact(docs, "doc_id", "text",
        threshold = 0.5, fanOutInput = false)
      exact.agg(count(lit(1)).as("n_exact_pairs"))
        .crossJoin(found.join(exact, Seq("id_a", "id_b", "jaccard"), "left_anti")
          .agg(count(lit(1)).as("n_false_pairs")))
    },

    // MinHash recall ENVELOPE (oracle-checked): every exact twin pair
    // (identical normalized text ⇒ identical shingle set ⇒ identical
    // signatures ⇒ same bucket in every band ⇒ exact-Jaccard 1.0) MUST
    // appear in the LSH output — n_found == n_twin_pairs by
    // construction, and the oracle computes the twin count in SQL.
    "q_dedup_minhash_recall" -> { (s, dir) =>
      // the synthetic corpus has no natural twins — inject clones
      // (1 in 50, offset ids) so the recall constraint has teeth
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = base.union(base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
      val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      // twin detection joins on xxhash64(normalized text), never the
      // doc-sized text itself: the shuffle key is 8 bytes, and a 64-bit
      // hash is injective at gate scale (same argument as q_fingerprint)
      val norm = corpus.select(col("doc_id"),
        xxhash64(TextAnalysis.normalize(col("text"))).as("nh"))
      val twins = norm.as("a").join(norm.as("b"),
          col("a.nh") === col("b.nh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      twins.agg(count(lit(1)).as("n_twin_pairs"))
        .crossJoin(twins.join(pairs, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("n_found")))
    },

    // SimHash twin ENVELOPE (oracle-checked): an injected clone has the
    // identical token multiset ⇒ identical 64-bit SimHash ⇒ shares all
    // four 16-bit band chunks ⇒ the banded join MUST surface the pair
    // at hamming distance 0.  n_twins_found == n_twin_pairs by
    // construction; the oracle counts the injected clones in SQL.
    // (Pair-level goldens live in DedupSpec.)
    "q_dedup_simhash" -> { (s, dir) =>
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = base.union(base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
      val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 3)
      val nTwins = base.filter(col("doc_id") % 50 === 0)
        .agg(count(lit(1)).as("n_twin_pairs"))
      val found = pairs
        .filter(col("id_b") === col("id_a") + lit(10000000L) &&
          col("id_a") % 50 === 0 && col("hamming") === 0)
        .agg(count(lit(1)).as("n_twins_found"))
      nTwins.crossJoin(found)
    },

    // N-gram Jaccard near-dup, brute-force exact — SQL-expressible via
    // DuckDB list functions, so this one IS oracle-checked (on a capped
    // subset to keep the quadratic oracle cheap).
    "q_dedup_jaccard" -> { (s, dir) =>
      val docs = jaccardProbeDocs(s, dir)
      // capped probe slice — input-skew fanOut is overhead here (r16)
      Dedup.jaccardPairsExact(docs, "doc_id", "text", threshold = 0.5,
          fanOutInput = false)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Same contract via PREFIX FILTERING (AllPairs): the sub-quadratic
    // exact plan must emit the IDENTICAL pair set the brute-force twin
    // and the DuckDB all-pairs oracle produce — completeness of the
    // prefix-filter theorem checked on real data.
    "q_prefix_jaccard" -> { (s, dir) =>
      val docs = jaccardProbeDocs(s, dir)
      // capped probe slice — input-skew fanOut is overhead here (r16)
      Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text",
          threshold = 0.5, fanOutInput = false)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Cross-source duplicate-flow matrix: which source PAIRS share
    // near-duplicate content (who copies from whom) — the curation
    // read behind per-source dedup budgets.  Built on the EXACT
    // prefix-filtered pair table (so the DuckDB all-pairs twin replays
    // it exactly), sources joined per side, unordered pair normalized
    // by least/greatest.
    "q_dup_flow" -> { (s, dir) =>
      val docs = jaccardProbeDocs(s, dir)
      val pairs = Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, fanOutInput = false)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
          "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
          "id_b")
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_a"), col("source_b"))
    },

    // Winnowing fingerprints (MOSS): per-doc sketch of window-min gram
    // hashes.  Selection depends on hash ORDER, so the gate uses an
    // engine-agnostic base-31 mod-2^31 gram hash and the DuckDB twin
    // recomputes the identical argmin selection — fingerprint COUNT
    // and hash SUM match exactly per document.
    "q_winnow" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      val fp = Dedup.winnowedFingerprints(docs, "doc_id", "text", k = 2, w = 4)
      docs.select(col("doc_id"))
        .join(fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"),
          sum(col("fp_hash")).cast("long").as("h_sum")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_fp"), lit(0L)).cast("long").as("n_fp"),
          coalesce(col("h_sum"), lit(0L)).cast("long").as("h_sum"))
        .orderBy(col("doc_id"))
    },

    // Containment (doc-in-doc) pairs: 8-token "quote" docs are carved
    // out of real documents and injected — each quote's shingles are a
    // SUBSET of its source's, so C(quote→doc) = 1.0 while Jaccard is
    // tiny (exactly the relation Jaccard dedup misses).  Candidates
    // come from the inverted shingle index; the DuckDB twin recomputes
    // both directed containments from raw shingle STRINGS, certifying
    // the hashed pipeline collision-free.
    "q_containment_pairs" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val quotes = docs.filter(col("doc_id") % 20 === 3)
        .select((col("doc_id") + 500000L).as("doc_id"),
          array_join(slice(split(TextAnalysis.normalize(col("text")), " "),
            1, 8), " ").as("text"))
      // shingle kernel is sub-0.5 s on this input — the input-skew
      // fanOut exchange measured as overhead here (r16), keep it off
      Dedup.containmentPairs(docs.union(quotes), "doc_id", "text",
          threshold = 0.9, fanOutInput = false)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Brute-force exact cosine top-k for a small query set (oracle via
    // DuckDB list_cosine_similarity).
    "q_knn_brute" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      Similarity.bruteForceTopK(emb, queries, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // LSH ANN rank-1 ENVELOPE (oracle-checked): a clone of each query
    // vector is injected into the corpus; an identical vector has the
    // identical hyperplane sketch ⇒ lands in the query's bucket ⇒
    // scores cosine 1.0 ⇒ MUST be rank 1 (the corpus's natural max
    // pairwise cosine is ~0.6, far below — verified over the test
    // tables).  Bucketing, the cosine expression and the ranking all
    // have to work for the row to match; recall-vs-brute goldens live
    // in OpsSpec.
    "q_knn_lsh" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .union(queries.select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")))
      Similarity.lshTopK(corpus, queries, k = 5, nBits = 8)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("corpus_id").as("p1_corpus_id"),
          col("cos").as("p1_cos"))
        .orderBy(col("query_id"))
    },

    // IVF ANN rank-1 + RECALL ENVELOPE (oracle-checked): the injected
    // clone is assigned to the cell nearest the query (same argmax +
    // tie-break as the query's probe ranking), so it is always inside
    // the probed cell set and must surface at rank 1 with cosine 1.0.
    // Round 12 adds a recall floor vs the exact brute twin: with the
    // deterministic k-means++ seeding (hash pool + farthest-point init
    // + pool Lloyd) recall@10 at nProbe 4/16 measures 3-9/10 across
    // SFs (the old id-modulus seeding measured a min of 2); the floor
    // is 2 — an envelope, not a point estimate, same style as
    // q_knn_pq.
    "q_knn_ivf" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .union(queries.select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")))
      val ivf = Similarity.ivfTopK(corpus, queries, k = 10,
        nCells = 16, nProbe = 4)
      val p1 = ivf.filter(col("rank") === 1)
        .select(col("query_id"), col("corpus_id").as("p1_corpus_id"),
          col("cos").as("p1_cos"))
      val brute = Similarity.bruteForceTopK(corpus, queries, k = 10)
        .select(col("query_id").as("bq"), col("corpus_id").as("bc"))
      val rec = brute.join(ivf.select(col("query_id"), col("corpus_id")),
          col("bq") === col("query_id") && col("bc") === col("corpus_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_common"))
      p1.join(rec, Seq("query_id"), "left")
        .select(col("query_id"), col("p1_corpus_id"), col("p1_cos"),
          (coalesce(col("n_common"), lit(0L)) >= 2).as("recall_ok"))
        .orderBy(col("query_id"))
    },

    // Binary-sketch ANN rank-1 ENVELOPE (oracle-checked): the injected
    // clone has the identical 64-bit sign sketch ⇒ agrees on all four
    // 16-bit bands ⇒ candidate at Hamming 0 ⇒ exact-cosine rerank puts
    // it at rank 1 with cos 1.0.  Sketching (codegen SignPack64),
    // pigeonhole banding, the popcount cut and the rerank all have to
    // work for the row to match.
    "q_knn_hamming" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .union(queries.select((col("vec_id") + lit(1000000L)).as("vec_id"),
          col("embedding")))
      Similarity.hammingTopK(corpus, queries, k = 5, radius = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("corpus_id").as("p1_corpus_id"),
          col("cos").as("p1_cos"))
        .orderBy(col("query_id"))
    },

    // Product-quantization recall ENVELOPE (oracle-checked): PQ codes
    // (m=32 subspaces × 32 centroids = 32 bytes/vector, 8× compression;
    // 4-bit packing would halve it) score by asymmetric reconstructed
    // cosine; recall@10 against the exact brute-force twin must clear
    // the floor for every query.  Lossy-compression search cannot be
    // pinned to exact ranks — the recall floor (measured min 5-6/10,
    // avg ~7/10 across SFs; enforced 4/10) is the contract, same
    // envelope style as q_dedup_minhash_recall.
    "q_knn_pq" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
        .select(col("query_id"), col("corpus_id"))
      // codebooks train on a deterministic 1/4 hash sample — the
      // corpus-scale practice (quality tracks the distribution, not the
      // count; measured recall equals full-corpus training) — then the
      // full corpus is encoded and searched through the split API
      val sample = emb.filter(pmod(xxhash64(col("vec_id")), lit(4)) === 0)
      val books = Pq.train(sample, "vec_id", "embedding",
        m = 32, k = 32, iters = 3)
      val pq = Pq.searchEncoded(Pq.encodeTable(emb, books), books,
          queries, k = 10)
        .select(col("query_id").as("pq_qid"), col("corpus_id").as("pq_cid"))
      val common = brute.join(pq,
          col("query_id") === col("pq_qid") &&
            col("corpus_id") === col("pq_cid"))
        .groupBy("query_id").agg(count(lit(1)).as("n_common"))
      queries.select(col("vec_id").as("query_id"))
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_common"), lit(0L)) >= 4).as("recall_ok"))
        .orderBy(col("query_id"))
    },

    // IVF-PQ recall ENVELOPE (oracle-checked): the billion-vector
    // layout — IVF coarse cells prune the candidate set (nProbe=8 of 16
    // cells), PQ codes + per-query ADC lookup tables score the probed
    // cells in O(m) per pair.  Recall@10 vs the exact brute-force twin
    // must clear the floor for every query; IVF pruning on top of PQ
    // loses a little recall vs q_knn_pq.  The round-12 k-means++
    // centroid seeding lifted the measured floor (min 5/10 at both
    // SFs, was 3); enforced 4/10 — envelope with one point of margin.
    "q_knn_ivfpq" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < 8).limit(8)
      val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
        .select(col("query_id"), col("corpus_id"))
      val sample = emb.filter(pmod(xxhash64(col("vec_id")), lit(4)) === 0)
      val books = Pq.train(sample, "vec_id", "embedding",
        m = 32, k = 32, iters = 3)
      val centroids = Similarity.ivfCentroids(emb, nCells = 16)
      val index = Pq.ivfPqIndex(emb, centroids, books)
      val ivfpq = Pq.ivfPqSearch(index, centroids, books, queries,
          k = 10, nProbe = 8)
        .select(col("query_id").as("pq_qid"), col("corpus_id").as("pq_cid"))
      val common = brute.join(ivfpq,
          col("query_id") === col("pq_qid") &&
            col("corpus_id") === col("pq_cid"))
        .groupBy("query_id").agg(count(lit(1)).as("n_common"))
      queries.select(col("vec_id").as("query_id"))
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_common"), lit(0L)) >= 4).as("recall_ok"))
        .orderBy(col("query_id"))
    },

    // Duplicate-cluster clique ENVELOPE (oracle-checked): every 50th
    // doc is injected twice more (three identical copies — a clique of
    // exact twins).  Twin pairs are always surfaced by the LSH pipeline
    // (identical signatures), so connected components MUST place all
    // three copies in one cluster — n_cliques_intact == n_cliques, the
    // clique count computable in SQL.  Natural near-dup pairs may merge
    // cliques into larger clusters, which preserves co-membership.
    // (Transitivity goldens live in ClusterSpec.)
    "q_dup_clusters" -> { (s, dir) =>
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val seeds = base.filter(col("doc_id") % 50 === 0)
      val corpus = base
        .union(seeds.select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
        .union(seeds.select((col("doc_id") + lit(20000000L)).as("doc_id"), col("text")))
      val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.9)
      val memb = DupClusters.connectedComponents(pairs)
      def labelOf(offset: Long, as: String) =
        memb.select((col("id") - lit(offset)).as("id0"), col("cluster").as(as))
      seeds.select(col("doc_id").as("id0"))
        .join(labelOf(0L, "c0"), Seq("id0"), "left")
        .join(labelOf(10000000L, "c1"), Seq("id0"), "left")
        .join(labelOf(20000000L, "c2"), Seq("id0"), "left")
        .agg(count(lit(1)).as("n_cliques"),
          sum(when(col("c0").isNotNull && col("c0") === col("c1") &&
            col("c0") === col("c2"), 1L).otherwise(0L)).as("n_cliques_intact"))
    },

    // Embedding near-dup — fully oracle-checked: clones of every 25th
    // vector are injected; an identical vector shares the sketch bucket
    // and scores cosine 1.0, and the corpus's natural max pairwise
    // cosine is ~0.6 (verified over the test tables), so the output is
    // EXACTLY the injected clone pairs.
    // SemDeDup ENVELOPE (oracle-checked, exact): clones of every 25th
    // vector are injected; an identical vector lands in the same
    // k-means cell (identical distances, deterministic tie-break) and
    // scores cosine 1.0, while the corpus's natural max pairwise cosine
    // is ~0.6 < tau — so the drop set is EXACTLY the injected clones:
    // counts and the dropped-id checksum are closed-form in SQL.
    "q_semdedup" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.union(emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      SemDedup.semanticDedup(corpus, "vec_id", "embedding",
          k = 8, tau = 0.95, iters = 1)
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(!col("keep"), col("vec_id")).otherwise(0L))
            .as("dropped_id_sum"))
    },

    "q_embed_neardup" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.union(emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      Similarity.cosineNearDupPairs(corpus, threshold = 0.95, nBits = 8)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Quantized-kernel ENVELOPE (oracle-checked): int8 codes + integer
    // dot.  A clone of each query quantizes to identical codes ⇒
    // quantized cosine exactly 1.0 ⇒ rank 1 (natural max ~0.6 plus a
    // <0.05 quantization error can't reach it); err_ok additionally
    // bounds |quantized − exact| cosine over EVERY scored pair, so a
    // broken kernel fails even when the ranking survives.
    "q_knn_quantized" -> { (s, dir) =>
      val base = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = base.union(base.filter(col("vec_id") < 8)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
      val emb = Quantize.withQuantized(corpus, "embedding")
      val q = emb.filter(col("vec_id") < 8).limit(8)
        .select(col("vec_id").as("query_id"),
          col("embedding_q8").as("qq"), col("embedding").as("qvec"))
      val c = emb.select(col("vec_id").as("corpus_id"),
        col("embedding_q8").as("cq"), col("embedding").as("cvec"))
      c.crossJoin(broadcast(q))
        .filter(col("corpus_id") =!= col("query_id"))
        .select(col("query_id"), col("corpus_id"),
          Quantize.cosineQuantized(col("qq"), col("cq")).as("cos"),
          graft.functions.cosine_sim(col("qvec"), col("cvec")).as("cos_exact"))
        .groupBy(col("query_id"))
        .agg(
          max_by(col("corpus_id"),
            struct(col("cos"), (-col("corpus_id")).as("nc"))).as("p1_corpus_id"),
          round(max(col("cos")), 6).as("p1_cos"),
          (max(abs(col("cos") - col("cos_exact"))) <= 0.05).as("err_ok"))
        .orderBy(col("query_id"))
    },

    // PII redaction: deterministic synthetic PII is appended to each
    // document (the corpus itself is PII-free), then scrubbed + counted.
    // The injection and both regex sets are SQL-expressible, so the
    // redacted text is oracle-checked byte-for-byte.
    "q_pii_redact" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 60)
      val injected = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com ph 555-"),
        (col("doc_id") % 900 + 100).cast("string"), lit("-"),
        (col("doc_id") % 9000 + 1000).cast("string"),
        lit(" ssn 987-65-"), (col("doc_id") % 9000 + 1000).cast("string"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
      docs.select(col("doc_id"),
          TextAnalysis.redactPii(injected).as("redacted"),
          TextAnalysis.piiCounts(injected).as("c"))
        .select(col("doc_id"), col("redacted"),
          col("c.n_email").as("n_email"), col("c.n_ssn").as("n_ssn"),
          col("c.n_phone").as("n_phone"), col("c.n_ip").as("n_ip"))
        .orderBy(col("doc_id"))
    },

    // Multimodal plumbing: binary payload + metadata → stub features.
    // Oracle-checked because the fake decode is SQL-expressible
    // (octet_length / md5 / byte mean via histogram-free arithmetic is
    // NOT — so the oracle checks the SQL-expressible projection).
    "q_multimodal" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs))
      feats.toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("digest")).as("n_distinct_digests"),
          sum(col("frames_sampled")).as("total_frames"))
        .orderBy(col("kind"))
    },

    // One-pass column profile: nulls, exact distincts, typed min/max
    // for four lineitem columns from a single aggregation tree — the
    // snapshot a pipeline takes around every transformation.
    "q_profile" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      Profile.profile(li,
        numCols = Seq("l_quantity", "l_discount"),
        strCols = Seq("l_returnflag", "l_linestatus"))
    },

    // Key-skew diagnosis: cardinality, heaviest key, exact p50/p99 of
    // per-key counts and the integer-micro Gini coefficient of the
    // count distribution — the numbers that decide between a plain
    // shuffle, broadcast, AQE skew-join, or salting.  Every figure is
    // exact (integer Gini identity; interpolating percentiles match
    // quantile_cont), so the whole row oracle-checks.
    "q_skew_report" -> { (s, dir) =>
      Profile.skewReport(Tables.load(s, dir, "events"), "user_id")
    },

    // Keyed snapshot diff: the corpus-promotion regression gate.  The
    // "new" snapshot drops 1-in-97 keys, rewrites balances for 1-in-13
    // and names for 1-in-17, and adds 1-in-101 under offset ids; the
    // diff must classify every key exactly (added/removed/changed with
    // the changed column list) — output size tracks the CHANGE volume.
    "q_table_diff" -> { (s, dir) =>
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val nu = base.filter(col("c_custkey") % 97 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 17 === 0, concat(col("c_name"), lit("_v2")))
            .otherwise(col("c_name")).as("c_name"),
          when(col("c_custkey") % 13 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .union(base.filter(col("c_custkey") % 101 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      TableDiff.diff(base, nu, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // Distribution drift (PSI) between two shipping periods: each side
    // reduces to exact bin counts before anything joins, so the
    // compare costs two scans and constant-size math.  Per-bin
    // contributions are deterministic scalar arithmetic over exact
    // ratios — DuckDB reproduces them to the rounded precision.
    "q_drift_psi" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val early = li.filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val late = li.filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      Drift.psi(early, late, "l_extendedprice",
        edges = Seq(1000.0, 2000.0, 4000.0, 8000.0, 16000.0, 32000.0, 64000.0))
    },

    // Data-quality constraint suite in ONE aggregation pass: five
    // checks over lineitem compile into a single agg tree — at 100 TB
    // the whole validation is one scan.  Metrics are exact-count
    // ratios, so DuckDB reproduces them bit-for-bit.
    "q_quality_checks" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      Checks.run(li, Seq(
        Checks.completeness("l_orderkey"),
        Checks.uniqueness(Seq("l_orderkey", "l_linenumber")),
        Checks.acceptedValues("l_returnflag", Seq("A", "N", "R")),
        Checks.inRange("l_discount", 0.0, 0.1, minFraction = 0.5),
        Checks.nonNegative("l_extendedprice")))
    },

    // Frame sampling over the binary payload: one media row fans out to
    // k fixed-window frames; only digests leave the operator.  DuckDB
    // mirrors the byte windows with char substrings (the corpus is
    // ASCII, so char == byte — the oracle itself would catch drift).
    "q_multimodal_frames" -> { (s, dir) =>
      // ASCII-project the synthetic payload: Spark slices the binary
      // content by BYTES while the DuckDB twin can only slice VARCHAR
      // by CHARACTERS (no blob substring) — projecting every non-ASCII
      // char to '?' makes byte==char a construction invariant on ANY
      // corpus instead of an accident of today's ASCII testdata.
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text",
          regexp_replace(col("text"), "[^\\x00-\\x7f]", "?"))
      val frames = Multimodal.sampleFrames(Multimodal.asMedia(docs))
      frames.toDF()
        .join(Multimodal.asMedia(docs).select(col("media_id"), col("kind")),
          Seq("media_id"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("n_frame_bytes")).cast("long").as("total_bytes"),
          countDistinct(col("frame_digest")).as("n_distinct_frames"))
        .orderBy(col("kind"))
    },

    // Video near-dup via frame-signature Jaccard: exact clones
    // (J = 1.0) and tail-extended partial clones are injected among the
    // natural videos; candidates come from the inverted frame-hash
    // index (complete for any J > 0), refined with the two-pointer
    // jaccard kernel.  The DuckDB twin recomputes the same char-window
    // frame sets and list-intersection Jaccard — equality also
    // certifies the hashed frame pipeline collision-free.
    "q_video_neardup" -> { (s, dir) =>
      // ASCII projection: same byte-vs-char construction invariant as
      // q_multimodal_frames (frame windows are byte slices on the
      // Spark side, character slices in the oracle).
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text",
          regexp_replace(col("text"), "[^\\x00-\\x7f]", "?"))
      val src = docs.select(col("doc_id"), col("text"))
        .union(docs.filter(col("doc_id") % 30 === 2)
          .select((col("doc_id") + 999999L).as("doc_id"), col("text")))
        .union(docs.filter(col("doc_id") % 30 === 5)
          .select((col("doc_id") + 1999998L).as("doc_id"),
            concat(col("text"), lit(" extracut extracut")).as("text")))
      Multimodal.videoNearDupPairs(Multimodal.asMedia(src),
          frameBytes = 64, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    })

  val oracle: Map[String, String] = Map(
    // distinct fingerprints == distinct normalized texts (64-bit hash,
    // injective at gate scale; see the query's comment)
    "q_fingerprint" ->
      s"""SELECT source, count(*) AS n_docs,
        |  count(DISTINCT $normSql) AS n_distinct_fp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_winnow" ->
      s"""WITH t AS (
        |  SELECT doc_id AS id, $toksSql AS toks
        |  FROM documents WHERE doc_id < 300),
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
        |m AS (SELECT id, count(*) AS n FROM grams GROUP BY 1),
        |sel AS (
        |  SELECT g.id, s.s, min(g.kk) AS mk
        |  FROM keyed g
        |  JOIN (SELECT id, unnest(range(0, n - 3)) AS s FROM m) s
        |    ON g.id = s.id AND g.pos BETWEEN s.s AND s.s + 3
        |  GROUP BY 1, 2),
        |fp AS (SELECT DISTINCT id, mk FROM sel),
        |agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n_fp,
        |          CAST(sum(mk // 2147483648) AS BIGINT) AS h_sum
        |        FROM fp GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_fp, 0) AS BIGINT) AS n_fp,
        |       CAST(coalesce(a.h_sum, 0) AS BIGINT) AS h_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
        |LEFT JOIN agg a ON a.id = d.doc_id ORDER BY d.doc_id""".stripMargin,

    "q_containment_pairs" ->
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 150
        |  UNION ALL
        |  SELECT doc_id + 500000,
        |    array_to_string((string_split($normSql, ' '))[1:8], ' ')
        |  FROM documents WHERE doc_id < 150 AND doc_id % 20 = 3),
        |t AS (SELECT doc_id AS id,
        |        string_split(trim(regexp_replace(regexp_replace(lower(text),
        |          '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
        |      FROM base),
        |sh AS (SELECT id, CASE WHEN len(toks) >= 3
        |         THEN list_distinct(list_transform(range(1, len(toks) - 1),
        |                i -> array_to_string(toks[i:i+2], ' ')))
        |         ELSE [array_to_string(toks, ' ')] END AS s
        |       FROM t),
        |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |         FROM (SELECT id, unnest(s) AS w FROM sh) a
        |         JOIN (SELECT id, unnest(s) AS w FROM sh) b
        |           ON a.w = b.w AND a.id < b.id),
        |j AS (SELECT c.id_a, c.id_b,
        |        round(len(list_intersect(sa.s, sb.s))::DOUBLE / len(sa.s), 6)
        |          AS c_ab,
        |        round(len(list_intersect(sa.s, sb.s))::DOUBLE / len(sb.s), 6)
        |          AS c_ba
        |      FROM cand c JOIN sh sa ON sa.id = c.id_a
        |      JOIN sh sb ON sb.id = c.id_b)
        |SELECT id_a, id_b, c_ab, c_ba FROM j
        |WHERE greatest(c_ab, c_ba) >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    "q_video_neardup" ->
      """WITH da AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '?', 'g')
        |    AS text FROM documents),
        |vids AS (
        |  SELECT doc_id AS vid, text FROM da WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT doc_id + 999999, text FROM da WHERE doc_id % 30 = 2
        |  UNION ALL
        |  SELECT doc_id + 1999998, text || ' extracut extracut'
        |  FROM da WHERE doc_id % 30 = 5),
        |wins AS (
        |  SELECT vid, list_distinct(list_transform(
        |    range(0, GREATEST(1, CAST(ceil(len(text) / 64.0) AS BIGINT))),
        |    i -> substring(text, CAST(i * 64 + 1 AS BIGINT), 64))) AS ws
        |  FROM vids),
        |cand AS (
        |  SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
        |  FROM (SELECT vid, unnest(ws) AS w FROM wins) a
        |  JOIN (SELECT vid, unnest(ws) AS w FROM wins) b
        |    ON a.w = b.w AND a.vid < b.vid),
        |j AS (
        |  SELECT c.id_a, c.id_b,
        |    round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
        |      (len(wa.ws) + len(wb.ws) - len(list_intersect(wa.ws, wb.ws))), 6)
        |      AS jaccard
        |  FROM cand c
        |  JOIN wins wa ON wa.vid = c.id_a
        |  JOIN wins wb ON wb.vid = c.id_b)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_minhash_recall" ->
      s"""WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 50 = 0),
        |t AS (SELECT doc_id, $normSql AS nt FROM c)
        |SELECT count(*) AS n_twin_pairs, count(*) AS n_found
        |FROM t a JOIN t b ON a.nt = b.nt AND a.doc_id < b.doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""SELECT lang, count(*) AS n_docs,
        |  count(DISTINCT $normSql) AS n_distinct,
        |  count(*) - count(DISTINCT $normSql) AS n_dupes
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_keep_first" ->
      s"""SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum FROM (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY $normSql)""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH m AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len($toksSql) > 0
        |      THEN list_reduce(list_transform($toksSql, t -> len(t)), (a,b) -> a+b)::DOUBLE / len($toksSql)
        |      ELSE 0.0 END AS awl,
        |    CASE WHEN len(text) > 0
        |      THEN (len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / len(text)
        |      ELSE 0.0 END AS pr,
        |    CASE WHEN len($toksSql) > 0
        |      THEN len(list_filter($toksSql, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t)))::DOUBLE / len($toksSql)
        |      ELSE 0.0 END AS sr
        |  FROM documents)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (SELECT doc_id, lang,
        |        round(greatest(0.0, least(1.0,
        |          0.5 + 0.5*sr - pr - (CASE WHEN awl < 2 OR awl > 12 THEN 0.25 ELSE 0.0 END))), 6) AS q
        |      FROM m)
        |WHERE (doc_id * 2654435761) % 1000 < q * 1000
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_quality" ->
      s"""WITH m AS (
        |  SELECT lang,
        |    len(text) AS n_chars,
        |    len($toksSql) AS n_tokens,
        |    CASE WHEN len($toksSql) > 0
        |      THEN list_reduce(list_transform($toksSql, t -> len(t)), (a,b) -> a+b)::DOUBLE / len($toksSql)
        |      ELSE 0.0 END AS awl,
        |    CASE WHEN len(text) > 0
        |      THEN (len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / len(text)
        |      ELSE 0.0 END AS pr,
        |    CASE WHEN len($toksSql) > 0
        |      THEN len(list_filter($toksSql, t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t)))::DOUBLE / len($toksSql)
        |      ELSE 0.0 END AS sr
        |  FROM documents)
        |SELECT lang, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(round(awl, 6)), 4) AS mean_word_len,
        |  round(avg(round(sr, 6)), 4) AS mean_stop_ratio,
        |  round(avg(round(greatest(0.0, least(1.0,
        |    0.5 + 0.5*sr - pr - (CASE WHEN awl < 2 OR awl > 12 THEN 0.25 ELSE 0.0 END))), 6)), 4) AS mean_quality
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "q_token_count" ->
      s"""SELECT source, count(*) AS n_docs,
        |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
        |  CAST(sum(list_reduce(list_transform(regexp_split_to_array(text, '\\s+'), w -> CAST(ceil(len(w)/4.0) AS BIGINT)), (a,b) -> a+b)) AS BIGINT) AS total_subwords
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_lang_id" -> langIdOracle,
    "q_dedup_jaccard" -> jaccardOracle,
    "q_prefix_jaccard" -> jaccardOracle,

    "q_dup_flow" -> {
      s"""WITH $jaccardProbeSql,
        |sh AS (
        |  SELECT doc_id, source, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(generate_series(0, len(toks) - 3),
        |         i -> hash(toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |           toks[i+3]))
        |    ELSE [hash(array_to_string(toks, ' '))] END) AS s
        |  FROM (SELECT doc_id, source, string_split($normSql, ' ')
        |          AS toks
        |        FROM probe_docs AS documents)),
        |p AS (SELECT least(a.source, b.source) AS source_a,
        |    greatest(a.source, b.source) AS source_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
        |    AND len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // precision envelope: exact-pair count on the capped subset; the
    // found-but-not-exact anti-join count is 0 by construction
    "q_dedup_minhash" ->
      s"""SELECT count(*) AS n_exact_pairs, CAST(0 AS BIGINT) AS n_false_pairs
        |FROM ($jaccardOracle)""".stripMargin,
    "q_dedup_simhash" ->
      """SELECT count(*) AS n_twin_pairs, count(*) AS n_twins_found
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,
    "q_knn_pq" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_knn_ivfpq" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_dup_clusters" ->
      """SELECT count(*) AS n_cliques, CAST(count(*) AS BIGINT) AS n_cliques_intact
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,
    "q_semdedup" ->
      """WITH clones AS (SELECT vec_id FROM embeddings WHERE vec_id % 25 = 0)
        |SELECT (SELECT count(*) FROM embeddings) + (SELECT count(*) FROM clones) AS n_total,
        |  (SELECT count(*) FROM embeddings) AS n_kept,
        |  (SELECT count(*) FROM clones) AS n_dropped,
        |  (SELECT CAST(coalesce(sum(vec_id + 1000000), 0) AS BIGINT)
        |   FROM clones) AS dropped_id_sum""".stripMargin,
    "q_embed_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, 1.0 AS cos
        |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY id_a, id_b""".stripMargin,
    "q_knn_lsh" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS p1_corpus_id, 1.0 AS p1_cos
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_knn_ivf" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS p1_corpus_id,
        |  1.0 AS p1_cos, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_knn_quantized" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS p1_corpus_id,
        |  1.0 AS p1_cos, true AS err_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_knn_hamming" ->
      """SELECT vec_id AS query_id, vec_id + 1000000 AS p1_corpus_id, 1.0 AS p1_cos
        |FROM embeddings WHERE vec_id < 8 ORDER BY query_id""".stripMargin,
    "q_knn_brute" ->
      """SELECT query_id, rank, corpus_id, cos FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_pii_redact" -> piiOracle,
    "q_multimodal" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  count(*) AS n,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  count(DISTINCT md5(text)) AS n_distinct_digests,
        |  CAST(sum(1 + strlen(text) // 1024) AS BIGINT) AS total_frames
        |FROM documents
        |GROUP BY 1 ORDER BY kind""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS cnt
        |           FROM events GROUP BY 1),
        |r AS (SELECT key, cnt,
        |        row_number() OVER (ORDER BY cnt, key) AS i FROM c),
        |s AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS tot,
        |        CAST(max(cnt) AS BIGINT) AS mx,
        |        CAST(sum(i * cnt) AS BIGINT) AS si,
        |        round(quantile_cont(cnt, 0.5), 4) AS p50,
        |        round(quantile_cont(cnt, 0.99), 4) AS p99
        |      FROM r),
        |t AS (SELECT CAST(key AS VARCHAR) AS top_key
        |      FROM r ORDER BY cnt DESC, key DESC LIMIT 1)
        |SELECT CAST(n AS BIGINT) AS n_keys, tot AS n_rows,
        |  mx AS max_key_rows, top_key, p50 AS p50_rows, p99 AS p99_rows,
        |  CAST(round((2.0 * si - (n + 1.0) * tot) * 1000000.0
        |    / (CAST(n AS DOUBLE) * tot)) AS BIGINT) AS gini_micro
        |FROM s, t""".stripMargin,
    "q_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS "column",
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT l_quantity) AS n_distinct,
        |    CAST(min(l_quantity) AS DOUBLE) AS min_num,
        |    CAST(max(l_quantity) AS DOUBLE) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount',
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_discount),
        |    CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag',
        |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_returnflag),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(l_returnflag), max(l_returnflag)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus',
        |    CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_linestatus),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |    min(l_linestatus), max(l_linestatus)
        |  FROM lineitem)
        |ORDER BY "column"""".stripMargin,
    "q_table_diff" ->
      """WITH oldt AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |newt AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 17 = 0 THEN c_name || '_v2' ELSE c_name END AS c_name,
        |    CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM customer WHERE c_custkey % 101 = 0)
        |SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'added'
        |       WHEN n.c_custkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status,
        |  CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
        |       ELSE array_to_string(list_sort(list_filter(
        |         [CASE WHEN o.c_name IS DISTINCT FROM n.c_name THEN 'c_name' END,
        |          CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'c_acctbal' END],
        |         x -> x IS NOT NULL)), ',') END AS changed_cols
        |FROM oldt o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.c_name IS DISTINCT FROM n.c_name
        |   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |ORDER BY c_custkey""".stripMargin,
    "q_drift_psi" ->
      """WITH bins AS (SELECT CAST(unnest(generate_series(0, 7)) AS INT) AS bin),
        |a AS (SELECT CASE WHEN l_extendedprice < 1000 THEN 0
        |                  WHEN l_extendedprice < 2000 THEN 1
        |                  WHEN l_extendedprice < 4000 THEN 2
        |                  WHEN l_extendedprice < 8000 THEN 3
        |                  WHEN l_extendedprice < 16000 THEN 4
        |                  WHEN l_extendedprice < 32000 THEN 5
        |                  WHEN l_extendedprice < 64000 THEN 6
        |                  ELSE 7 END AS bin
        |      FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
        |b AS (SELECT CASE WHEN l_extendedprice < 1000 THEN 0
        |                  WHEN l_extendedprice < 2000 THEN 1
        |                  WHEN l_extendedprice < 4000 THEN 2
        |                  WHEN l_extendedprice < 8000 THEN 3
        |                  WHEN l_extendedprice < 16000 THEN 4
        |                  WHEN l_extendedprice < 32000 THEN 5
        |                  WHEN l_extendedprice < 64000 THEN 6
        |                  ELSE 7 END AS bin
        |      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'),
        |ca AS (SELECT bin, count(*) AS n FROM a GROUP BY bin),
        |cb AS (SELECT bin, count(*) AS n FROM b GROUP BY bin),
        |ta AS (SELECT count(*) AS t FROM a),
        |tb AS (SELECT count(*) AS t FROM b)
        |SELECT bins.bin,
        |  COALESCE(ca.n, 0) AS n_a, COALESCE(cb.n, 0) AS n_b,
        |  round((greatest(COALESCE(ca.n, 0) * 1.0 / ta.t, 1e-6)
        |         - greatest(COALESCE(cb.n, 0) * 1.0 / tb.t, 1e-6))
        |    * ln(greatest(COALESCE(ca.n, 0) * 1.0 / ta.t, 1e-6)
        |         / greatest(COALESCE(cb.n, 0) * 1.0 / tb.t, 1e-6)), 6) AS psi_contrib
        |FROM bins
        |LEFT JOIN ca ON bins.bin = ca.bin
        |LEFT JOIN cb ON bins.bin = cb.bin, ta, tb
        |ORDER BY bins.bin""".stripMargin,
    "q_quality_checks" ->
      """SELECT "check", metric,
        |  CASE WHEN "check" = 'range(l_discount)' THEN metric >= 0.5
        |       ELSE metric = 1.0 END AS passed
        |FROM (
        |  SELECT 'completeness(l_orderkey)' AS "check",
        |    round(sum(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) * 1.0
        |      / count(*), 6) AS metric FROM lineitem
        |  UNION ALL
        |  SELECT 'uniqueness(l_orderkey,l_linenumber)',
        |    round(count(DISTINCT (l_orderkey, l_linenumber)) * 1.0
        |      / count(*), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'accepted(l_returnflag)',
        |    round(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) * 1.0
        |      / count(*), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'range(l_discount)',
        |    round(sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1 THEN 1 ELSE 0 END) * 1.0
        |      / count(*), 6) FROM lineitem
        |  UNION ALL
        |  SELECT 'range(l_extendedprice)',
        |    round(sum(CASE WHEN l_extendedprice >= 0.0 THEN 1 ELSE 0 END) * 1.0
        |      / count(*), 6) FROM lineitem)
        |ORDER BY "check"""".stripMargin,
    "q_multimodal_frames" ->
      """WITH da AS (
        |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '?', 'g')
        |    AS text FROM documents),
        |fr AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    unnest(generate_series(0,
        |      CAST(greatest(0, (strlen(text) - 1) // 64) AS BIGINT))) AS i,
        |    text
        |  FROM da),
        |fx AS (
        |  SELECT kind,
        |    md5(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS d,
        |    strlen(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS nb
        |  FROM fr)
        |SELECT kind, count(*) AS n_frames,
        |  CAST(sum(nb) AS BIGINT) AS total_bytes,
        |  count(DISTINCT d) AS n_distinct_frames
        |FROM fx GROUP BY kind ORDER BY kind""".stripMargin)

  /** DuckDB twin of TextAnalysis.normalize. */
  /** The capped Jaccard-pair slice (doc_id < 200, brute-oracle-sized)
    * plus two injected EXACT clones (ids 0 and 100 re-issued at
    * +500000): the natural slice carries near-dup families only at
    * some scale factors (none land under id 200 at sf0.1 — found by
    * the round-11 sf0.1 sweep), so the clones guarantee the pair
    * pipeline has teeth at ANY corpus scale while the natural pairs
    * still count wherever they exist.  Mirrored exactly by
    * [[jaccardProbeSql]].
    */
  private def jaccardProbeDocs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), col("text"))
    base.unionByName(base.filter(pmod(col("doc_id"), lit(100)) === 0)
      .withColumn("doc_id", col("doc_id") + 500000L))
  }

  // def, not val: interpolated into the oracle map, which initializes
  // BEFORE later-declared vals (a val here reads as null mid-init)
  private def jaccardProbeSql: String =
    """probe_docs AS (
      |  SELECT doc_id, source, text FROM documents WHERE doc_id < 200
      |  UNION ALL
      |  SELECT doc_id + 500000, source, text FROM documents
      |  WHERE doc_id < 200 AND doc_id % 100 = 0)""".stripMargin

  private def normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** DuckDB twin of TextAnalysis.tokens. */
  private def toksSql: String =
    "regexp_extract_all(lower(text), '[a-z0-9'']+')"

  /** DuckDB twin of TextAnalysis.redactPii/piiCounts, derived from the
    * same pattern list so the two can never drift.
    */
  private def piiOracle: String = {
    val inj = """text || ' contact user' || doc_id || '@mail.example.com ph 555-' ||
      | (doc_id % 900 + 100) || '-' || (doc_id % 9000 + 1000) ||
      | ' ssn 987-65-' || (doc_id % 9000 + 1000) ||
      | ' ip 10.0.' || (doc_id % 256) || '.7'""".stripMargin.replace("\n", "")
    val redacted = TextAnalysis.piiPatterns.foldLeft("t") {
      case (acc, (label, pat)) =>
        s"regexp_replace($acc, '$pat', '<${label.toUpperCase}>', 'g')"
    }
    val counts = TextAnalysis.piiPatterns.map { case (label, pat) =>
      s"CAST(len(regexp_extract_all(t, '$pat')) AS INT) AS n_$label"
    }.mkString(",\n  ")
    s"""WITH inj AS (
      |  SELECT doc_id, $inj AS t FROM documents WHERE doc_id < 60)
      |SELECT doc_id, $redacted AS redacted,
      |  $counts
      |FROM inj ORDER BY doc_id""".stripMargin
  }

  private def langIdOracle: String = {
    val profiles = Seq(
      "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "you", "that", "it"),
      "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
      "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
      "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
      "pt" -> Seq("o", "a", "de", "e", "do", "da", "em", "um", "para", "com"))
    val scoreExprs = profiles.zipWithIndex.map { case ((lang, words), i) =>
      val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"struct_pack(score := CASE WHEN len($toksSql) > 0 THEN len(list_filter($toksSql, t -> list_contains($arr, t)))::DOUBLE / len($toksSql) ELSE 0.0 END, prio := ${-i}, lang := '$lang')"
    }.mkString(", ")
    s"""SELECT lang, lang_pred, count(*) AS n FROM (
      |  SELECT lang,
      |    CASE WHEN list_max([$scoreExprs]).score > 0
      |      THEN list_max([$scoreExprs]).lang ELSE 'und' END AS lang_pred
      |  FROM documents)
      |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
  }

  private def jaccardOracle: String = {
    val norm = normSql
    s"""WITH $jaccardProbeSql,
      |sh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |    THEN list_transform(generate_series(0, len(toks) - 3),
      |         i -> hash(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
      |    ELSE [hash(array_to_string(toks, ' '))] END) AS s
      |  FROM (SELECT doc_id, string_split($norm, ' ') AS toks
      |        FROM probe_docs AS documents))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.s, b.s))::DOUBLE /
      |        len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
      |  AND len(list_intersect(a.s, b.s))::DOUBLE /
      |      len(list_distinct(list_concat(a.s, b.s))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin
  }
}
