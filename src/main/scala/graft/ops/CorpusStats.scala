package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistical operators for LLM training-data pipelines:
  * unigram language-model scoring (the CCNet-style "how typical is this
  * document of the corpus" quality signal), skip-gram co-occurrence
  * counting (word2vec / PPMI training-pair generation), and the
  * deterministic source-interleaved shuffle used to fix a training
  * order.
  *
  * Scale design: every operator is one fact shuffle plus equi-joined
  * side tables.  Frequency/marginal tables are VOCABULARY-sized —
  * unbounded on web text (billions of noise tokens) — so they are never
  * broadcast-hinted: the scoring joins are plain equi-joins on the token
  * key (already the shuffle key out of the counting aggregation), and
  * AQE broadcasts a side automatically when it actually is small.  Only
  * provably 1-row scalars (corpus totals) carry broadcast hints.
  * Co-occurrence pairs are built in-row, so output is
  * `window × corpus_tokens`, never quadratic.
  */
object CorpusStats {

  /** Per-document unigram log-probability score.
    *
    * Pass 1 builds corpus token frequencies (one shuffle, vocab-sized
    * result); pass 2 re-tokenizes and equi-joins each token to its
    * frequency (no broadcast hint — the vocabulary is unbounded at
    * corpus scale; AQE broadcasts when small), summing `ln(cnt/total)`
    * per document.  Each term is
    * rounded to integer MICRO-NATS before summing — integer addition is
    * associative, so the result is bit-identical under any partitioning
    * or aggregation order (a raw double sum would drift with partial-agg
    * order).  Returns (idCol, n_tokens, logprob_micro); mean log-prob is
    * `logprob_micro / 1e6 / n_tokens`, one deterministic division away.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").cast("long").as("total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(log(col("cnt").cast("double") / col("total").cast("double"))
          * lit(1000000d), 0).cast("long").as("micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum("micro").cast("long").as("logprob_micro"))
  }

  /** Per-document bigram log-probability score with add-one smoothing —
    * the next step up from [[unigramLogProb]] in the CCNet-style quality
    * ladder: `Σ ln((cnt(w1,w2)+1) / (cnt(w1·)+V))` over a document's
    * adjacent token pairs, where `cnt(w1·)` is w1's left-marginal over
    * the corpus bigram table and `V` the unigram vocabulary size.
    *
    * Bigrams are formed with an in-row `arrays_zip` of the token array
    * against its own tail — no positional self-join, one corpus scan.
    * Both side tables can exceed broadcast size at corpus scale — the
    * bigram counts are vocab²-bounded, the w1-marginal vocabulary-sized
    * — so both scoring joins are plain equi-joins (AQE broadcasts a
    * side only when it measures small); only the 1-row vocabulary count
    * is force-broadcast.  Micro-nat
    * rounding per term (see [[unigramLogProb]]) keeps the per-document
    * sum bit-exact under any partitioning.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withToks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
    val bigrams = withToks
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("bg_cnt"))
    val leftMarg = bgCounts.groupBy(col("w1").as("lm_w1"))
      .agg(sum("bg_cnt").cast("long").as("left_cnt"))
    val vocab = withToks.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    bigrams
      .join(bgCounts, Seq("w1", "w2"))
      .join(leftMarg, col("w1") === col("lm_w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(log((col("bg_cnt") + 1).cast("double") /
          (col("left_cnt") + col("vocab")).cast("double")) * lit(1000000d), 0)
          .cast("long").as("micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum("micro").cast("long").as("bigram_micro"))
  }

  /** Skip-gram co-occurrence pair counts: for every token, each token
    * following it within `window` positions (same document) forms an
    * ordered pair.  Pairs are built IN-ROW — the token array is zipped
    * against its own d-shifted tail for each offset d ≤ window (the
    * [[bigramLogProb]] technique, generalized) — so the whole operator
    * is one scan + one explode + one hash aggregation.  The previous
    * positional self-join sorted the corpus token stream twice for the
    * merge join; this shape shuffles only the vocabulary-sized pair
    * counts after map-side partial aggregation.  Per-document cost is
    * still `window × n_tokens`.  The token array materializes in its
    * own projection and is referenced multiple times, so CollapseProject
    * will not re-inline the tokenizer into the zips.
    */
  def skipGramPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    val withToks = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    val pairArrays = (1 to window).map { d =>
      when(size(col("toks")) > d,
        arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - d).as("w1"),
          slice(col("toks"), lit(d + 1), size(col("toks")) - d).as("w2")))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    }
    withToks.select(explode(concat(pairArrays: _*)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
  }

  /** DSIR-style importance score: per-document log-likelihood ratio of
    * a TARGET-domain unigram model vs the full-corpus model —
    * `Σ ln((t_cnt+1)/(t_total+V)) − Σ ln(c_cnt/c_total)` (add-one
    * smoothing on the target side, since target vocabulary is a
    * subset).  Documents that "read like" the target domain score
    * high; selecting the top fraction is importance resampling for
    * domain-targeted pretraining mixes.
    *
    * Same determinism discipline as [[unigramLogProb]]: each ln term
    * is rounded to integer micro-nats before the per-document sum, so
    * the score is exact under any partitioning.  Both frequency tables
    * are vocabulary-sized — unbounded, so no broadcast hints; the token
    * key is already the shuffle key and AQE broadcasts when small.  The
    * corpus is scanned twice (once per model build) and once for
    * scoring.
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col(idCol), isTarget.as("is_target"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val corpusFreq = toks.groupBy("tok").agg(count(lit(1)).as("c_cnt"))
    val targetFreq = toks.filter(col("is_target"))
      .groupBy(col("tok").as("t_tok")).agg(count(lit(1)).as("t_cnt"))
    val totals = corpusFreq.agg(
      sum("c_cnt").cast("long").as("c_total"),
      count(lit(1)).cast("long").as("vocab"))
    val tTotal = targetFreq.agg(sum("t_cnt").cast("long").as("t_total"))
    toks.join(corpusFreq, "tok")
      .join(targetFreq, col("tok") === col("t_tok"), "left")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(tTotal))
      .select(col(idCol),
        (round(log((coalesce(col("t_cnt"), lit(0L)) + 1).cast("double") /
            (col("t_total") + col("vocab")).cast("double")) * lit(1000000d), 0)
          - round(log(col("c_cnt").cast("double") / col("c_total").cast("double"))
            * lit(1000000d), 0)).cast("long").as("micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum("micro").cast("long").as("dsir_micro"))
  }

  /** Positive pointwise mutual information over the skip-gram pair
    * table — the classic word-association score used to build count-
    * based embeddings.  Marginals come from the pair table itself
    * (`p(a,b) = n_ab/N`, `p(a·) = n_a·/N`), so
    * `PMI = ln(n_ab · N / (n_a· · n_·b))`, clamped at 0 and expressed in
    * integer micro-nats (one ln per output row, no FP accumulation).
    * Marginals are vocabulary-sized — unbounded, so plain equi-joins on
    * the pair-table keys (AQE broadcasts when small); only the scalar N
    * is force-broadcast.
    */
  def ppmi(pairs: DataFrame): DataFrame = {
    val la = pairs.groupBy("w1").agg(sum("n_pairs").cast("long").as("n_left"))
    val rb = pairs.groupBy("w2").agg(sum("n_pairs").cast("long").as("n_right"))
    val n = pairs.agg(sum("n_pairs").cast("long").as("n_total"))
    pairs.join(la, "w1").join(rb, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pairs"),
        greatest(lit(0L),
          round(log((col("n_pairs") * col("n_total")).cast("double") /
            (col("n_left") * col("n_right")).cast("double")) * lit(1000000d), 0)
            .cast("long")).as("ppmi_micro"))
  }

  /** Deterministic source-interleaved training order: documents are
    * ranked within their source by a multiplicative hash of the id, so
    * reading in (rank, hash) order round-robins across sources — no
    * source-clumping — while staying reproducible run-to-run (no RNG).
    * The window partitions by source; at scale the final order is a
    * range-partitioned sort on (rank, hash), never a single-task window.
    */
  def interleavedOrder(docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val hkey = pmod(col(idCol) * lit(2654435761L), lit(4294967296L)).as("hkey")
    docs.select(col(idCol), col(sourceCol), hkey)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(sourceCol).orderBy(col("hkey"), col(idCol))))
  }

  /** Exact cross-source vocabulary overlap — the corpus-composition
    * matrix that tells a mixture designer which domains are lexically
    * redundant BEFORE any embedding exists: for every source pair, the
    * exact Jaccard of their distinct-token sets.
    *
    * Scale shape: one (source, token) distinct — map-side combined —
    * then the pair counts come from a self-equi-join on the TOKEN key
    * (a pair is counted once per shared token; the quadratic term is
    * per-token source-df², capped by the source count, with the usual
    * stop-token df-cap at web scale), and two source-size joins close
    * the Jaccard.  All counts exact integers; only the final ratio
    * divides.
    */
  def vocabOverlap(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val st = docs.select(col(srcCol).as("__s"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .distinct()
    val sizes = st.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    st.select(col("__s").as("src_a"), col("__t"))
      .join(st.select(col("__s").as("src_b"), col("__t")), Seq("__t"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("__s").as("src_a"), col("__n").as("__na")),
        Seq("src_a"))
      .join(sizes.select(col("__s").as("src_b"), col("__n").as("__nb")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        round(col("n_common").cast("double")
          / (col("__na") + col("__nb") - col("n_common")).cast("double"),
          6).as("jaccard"))
  }

  /** Vocabulary-growth (Heaps' law) curve: exact token and distinct-
    * vocabulary counts at each corpus prefix cut (documents ordered by
    * id; cuts are exclusive upper bounds on the id).  The curve is
    * what sizes a tokenizer vocabulary and predicts OOV decay as the
    * corpus grows.
    *
    * One-scan design: vocab at cut c = tokens whose FIRST-occurrence
    * doc id is < c, so a single (token → min doc, per-cut occurrence
    * counts) aggregation answers every cut — the token stream is read
    * once however many cuts are requested, and the second-stage
    * aggregate runs over the vocabulary-sized first-occurrence table
    * (conditional sums, |cuts| scalars out).
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[Long]): DataFrame = {
    require(cuts.nonEmpty && cuts.zip(cuts.tail).forall { case (a, b) => a < b },
      "cuts must be strictly ascending (duplicates would collide on column names)")
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
    val firsts = toks.groupBy(col("__tok"))
      .agg(min(col("__id")).as("__first"),
        cuts.map(c =>
          sum(when(col("__id") < c, 1L).otherwise(0L)).as(s"__n$c")): _*)
    val perCut = cuts.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("cut"),
        sum(col(s"__n$c")).cast("long").as("n_tokens"),
        sum(when(col("__first") < c, 1L).otherwise(0L))
          .cast("long").as("vocab")).as(s"__cut$i")
    }
    firsts.agg(perCut.head, perCut.tail: _*)
      .select(explode(array(cuts.indices.map(i => col(s"__cut$i")): _*)).as("r"))
      .select(col("r.cut"), col("r.n_tokens"), col("r.vocab"))
      .orderBy(col("cut"))
  }

  /** DoReMi-style domain reweighting round (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures"): domains whose per-token LM loss
    * exceeds the corpus average get upweighted by the exponentiated-
    * gradient rule `w_d ∝ exp(η · (loss_d − loss_corpus))`, normalized
    * over domains — one multiplicative-weights step of the mixture
    * optimization, with the repo's unigram LM standing in for the
    * proxy model's losses.
    *
    * Determinism: per-token micro-nat scores aggregate as exact
    * integers per domain; the excess loss is ONE IEEE division of
    * exact integers per domain (the blessed signed-ratio pattern), and
    * only the final softmax runs in doubles over the DOMAIN frame
    * (mixture-config-sized) before 6-dp-class rounding.
    *
    * Scale shape: rides [[unigramLogProb]]'s shuffles; everything
    * after the per-domain aggregation is domain-count-sized with 1-row
    * broadcast totals.
    *
    * @return (domainCol, n_toks, mean_logprob_micro, weight_micro)
    */
  def domainReweight(docs: DataFrame, domainCol: String, idCol: String,
      textCol: String, eta: Double): DataFrame = {
    require(eta > 0)
    val scored = unigramLogProb(docs, idCol, textCol)
    val per = scored
      .join(docs.select(col(idCol), col(domainCol)), Seq(idCol))
      .groupBy(col(domainCol))
      .agg(sum(col("n_tokens")).cast("long").as("n_toks"),
        sum(col("logprob_micro")).cast("long").as("__s"))
    val tot = per.agg(sum(col("n_toks")).cast("long").as("__tn"),
      sum(col("__s")).cast("long").as("__ts"))
    val ex = per.crossJoin(broadcast(tot))
      .withColumn("__excess_nats",
        (col("__ts").cast("double") / col("__tn").cast("double")
          - col("__s").cast("double") / col("n_toks").cast("double"))
          / 1000000d)
      .withColumn("__e", exp(lit(eta) * col("__excess_nats")))
    val z = ex.agg(sum(col("__e")).as("__z"))
    ex.crossJoin(broadcast(z))
      .select(col(domainCol), col("n_toks"),
        round(col("__s").cast("double") / col("n_toks").cast("double"), 2)
          .as("mean_logprob_micro"),
        round(col("__e") / col("__z") * 1000000d, 0).cast("long")
          .as("weight_micro"))
      .orderBy(col(domainCol))
  }

  /** Vocabulary coverage-at-V curve — the vocab-SIZE decision report
    * (what fraction of corpus tokens does a top-V vocabulary cover?),
    * the complement of [[vocabGrowth]]'s Heaps curve (which grows the
    * corpus, not the vocabulary).  For each requested V: the exact
    * token mass of the V most frequent types (ties by token string)
    * over the total mass, in ppm.
    *
    * Scale shape: one explode + map-side-combined count to the
    * distinct-type frame; the top-max(V) types come through
    * TakeOrderedAndProject (a BOUNDED global top-k — V is a config
    * constant, never data-sized), so no window or sort ever sees the
    * full vocabulary; ranks are assigned inside the limit-bounded
    * frame.  Total mass is one scalar aggregate.
    *
    * @param cuts strictly ascending vocabulary sizes
    * @return one row per cut: (vocab_size, covered, total,
    *         coverage_ppm), vocab_size ascending
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
      cuts: Seq[Int]): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(_ >= 1) &&
      cuts == cuts.sorted.distinct && cuts.last <= 1000000,
      s"cuts must be strictly ascending, within [1, 10^6]: $cuts")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
    val total = counts.agg(sum(col("__n")).cast("long").as("total"))
    val top = counts.orderBy(col("__n").desc, col("__tok").asc)
      .limit(cuts.last)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__n").desc, col("__tok").asc)))
    val cutAggs = cuts.map(v =>
      sum(when(col("__rank") <= v, col("__n")).otherwise(0L))
        .cast("long").as(s"__c$v"))
    val perCut = top.crossJoin(total)
      .select(col("__rank"), col("__n"), col("total"))
      .groupBy(col("total"))
      .agg(cutAggs.head, cutAggs.tail: _*)
    perCut.select(explode(array(cuts.map(v => struct(
        lit(v.toLong).as("vocab_size"), col(s"__c$v").as("covered"),
        col("total").as("total"))): _*)).as("__r"))
      .selectExpr("__r.vocab_size AS vocab_size", "__r.covered AS covered",
        "__r.total AS total",
        "CAST(CASE WHEN total > 0 THEN " +
          "(CAST(covered AS DECIMAL(38,0)) * 1000000) div total " +
          "ELSE -1 END AS BIGINT) AS coverage_ppm")
      .orderBy(col("vocab_size"))
  }

  /** Zipf power-law fit of the rank-frequency curve — the corpus
    * health check (natural text sits near slope −1; a much flatter or
    * steeper tail flags boilerplate flooding or truncated diversity).
    * Fits `ln(count) = ln_c + slope·ln(rank)` by least squares over
    * the top-`topV` types.
    *
    * Determinism: each point's ln(rank)/ln(count) is rounded to
    * integer micro-nats PER ROW (the [[unigramLogProb]] device), the
    * OLS moments accumulate in exact DECIMAL(38,0), and slope and
    * intercept are each ONE double division chain over exact integers
    * (IEEE-identical on any engine/partitioning), rounded to 6 dp.
    *
    * Scale shape: one tokenize + map-side-combined groupBy to the
    * vocabulary-sized count table; the top-V types come through the
    * bounded TakeOrdered ([[vocabCoverage]]'s contract), so the
    * row_number window and the moment aggregation run over ≤ topV
    * rows.  Output is a single row.
    *
    * @return (n_points, zipf_slope, ln_c) — ln_c in nats
    */
  def zipfFit(docs: DataFrame, textCol: String, topV: Int): DataFrame = {
    require(topV >= 3 && topV <= 1000000,
      s"topV must be in [3, 10^6], got $topV")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__n"))
    val top = counts.orderBy(col("__n").desc, col("__tok").asc)
      .limit(topV)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__n").desc, col("__tok").asc)))
    microNatOlsFit(top
      .select(
        round(log(col("__rank").cast("double")) * lit(1000000d), 0)
          .cast("long").as("__x"),
        round(log(col("__n").cast("double")) * lit(1000000d), 0)
          .cast("long").as("__y")),
      "zipf_slope", "ln_c")
  }

  /** Heaps-law exponent fit: `vocab ≈ K·T^β` over the exact
    * [[vocabGrowth]] curve — the companion read to [[zipfFit]] (β ~
    * 0.4–0.6 for natural text; β near 1 means near-random strings, β
    * near 0 a closed template vocabulary).  Same exactness device:
    * per-point integer micro-nat logs, DECIMAL(38,0) OLS moments, one
    * IEEE division chain, 6 dp.  Cuts with an empty prefix (or a
    * degenerate all-equal x spread) drop out of the fit; the output is
    * empty if fewer than two distinct points remain.
    *
    * @return (n_points, heaps_beta, ln_k) — ln_k in nats
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[Long]): DataFrame =
    microNatOlsFit(vocabGrowth(docs, idCol, textCol, cuts)
      .filter(col("n_tokens") > 0L && col("vocab") > 0L)
      .select(
        round(log(col("n_tokens").cast("double")) * lit(1000000d), 0)
          .cast("long").as("__x"),
        round(log(col("vocab").cast("double")) * lit(1000000d), 0)
          .cast("long").as("__y")),
      "heaps_beta", "ln_k")

  /** Pairwise Jensen–Shannon divergence between per-domain unigram
    * distributions — the source-redundancy read mixture design needs
    * (two sources with JS ≈ 0 are interchangeable; budgeting both at
    * full weight double-counts the same distribution).
    *
    * JS(p,q) = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, in nats.  Shared
    * tokens contribute `c_a·ln(2c_aT_b/(c_aT_b + c_bT_a))` with the
    * ln rounded to integer micro-nats PER TOKEN (the repo-wide
    * device) and summed exactly; tokens private to one side
    * contribute exactly `ln 2` each — folded in closed form as
    * `693147·(T − shared_mass)`, so the whole statistic reduces to
    * ONE sign-split integral ppm division of exact integers
    * (`(N_a·T_b + N_b·T_a) div (2·T_a·T_b)`), bit-identical on any
    * engine and partitioning.
    *
    * Scale shape: one tokenize to the (domain, token) count table
    * (map-side combined), a token-keyed self-join bounded by
    * S²·vocab (S = #domains, a config constant), then an S²-row
    * aggregation.  Nothing corpus-sized ever shuffles twice.
    *
    * @return per unordered pair WITH at least one shared token:
    *         (src_a, src_b, shared_types, t_a, t_b, js_ppm) —
    *         js_ppm = ⌊10⁶·JS⌋ nats.  A pair sharing NO tokens is
    *         absent (its JS is exactly ln 2 = 693147 ppm by
    *         definition — the documented maximal-divergence case)
    */
  def sourceJsd(docs: DataFrame, domainCol: String,
      textCol: String): DataFrame = {
    val counts = docs
      .select(col(domainCol).as("__d"),
        explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__d"), col("__tok")).agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("__d"))
      .agg(sum(col("__c")).cast("long").as("__t"))
    val ct = counts.join(totals, Seq("__d"))
    val a = ct.select(col("__d").as("src_a"), col("__tok"),
      col("__c").as("__ca"), col("__t").as("__ta"))
    val b = ct.select(col("__d").as("src_b"), col("__tok"),
      col("__c").as("__cb"), col("__t").as("__tb"))
    val d38 = (e: String) => s"CAST($e AS DECIMAL(38,0))"
    val shared = a.join(b, Seq("__tok"))
      .filter(col("src_a") < col("src_b"))
      .withColumn("__la", round(log(
          expr(d38("2") + " * __ca * __tb").cast("double")
            / expr(d38("__ca") + " * __tb + " + d38("__cb") + " * __ta")
                .cast("double"))
          * lit(1000000d), 0).cast("long"))
      .withColumn("__lb", round(log(
          expr(d38("2") + " * __cb * __ta").cast("double")
            / expr(d38("__ca") + " * __tb + " + d38("__cb") + " * __ta")
                .cast("double"))
          * lit(1000000d), 0).cast("long"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_types"),
        max(col("__ta")).as("t_a"), max(col("__tb")).as("t_b"),
        sum(expr(d38("__ca") + " * __la")).as("__sa"),
        sum(expr(d38("__cb") + " * __lb")).as("__sb"),
        sum(col("__ca")).cast("long").as("__sha"),
        sum(col("__cb")).cast("long").as("__shb"))
    shared
      .withColumn("__na",
        expr("__sa + CAST(693147 AS DECIMAL(38,0)) * (t_a - __sha)"))
      .withColumn("__nb",
        expr("__sb + CAST(693147 AS DECIMAL(38,0)) * (t_b - __shb)"))
      .withColumn("__num", expr("__na * t_b + __nb * t_a"))
      .withColumn("__den",
        expr("CAST(2 AS DECIMAL(38,0)) * t_a * t_b"))
      .select(col("src_a"), col("src_b"), col("shared_types"),
        col("t_a"), col("t_b"),
        expr("""CAST(CASE WHEN __num < 0
               |  THEN -((-__num) div __den)
               |  ELSE __num div __den END AS BIGINT)""".stripMargin)
          .as("js_ppm"))
  }

  /** Shared micro-nat log-log OLS: `pts` carries integer micro-nat
    * (__x, __y); moments accumulate in exact DECIMAL(38,0) and the
    * slope/intercept are each ONE IEEE double division chain over
    * exact integers (engine- and partitioning-identical), rounded to
    * 6 dp.  A zero x-spread (den = 0) yields an EMPTY frame rather
    * than a NaN row.
    */
  private[ops] def microNatOlsFit(pts: DataFrame, slopeAlias: String,
      interceptAlias: String): DataFrame = {
    val d = "CAST(%s AS DECIMAL(38,0))"
    pts
      .agg(count(lit(1)).as("n_points"),
        sum(expr(d.format("__x"))).as("__sx"),
        sum(expr(d.format("__y"))).as("__sy"),
        sum(expr(d.format("__x") + " * " + d.format("__y"))).as("__sxy"),
        sum(expr(d.format("__x") + " * " + d.format("__x"))).as("__sxx"))
      .withColumn("__num",
        expr("CAST(n_points AS DECIMAL(38,0)) * __sxy - __sx * __sy"))
      .withColumn("__den",
        expr("CAST(n_points AS DECIMAL(38,0)) * __sxx - __sx * __sx"))
      .filter(col("__den") =!= 0)
      .select(col("n_points"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as(slopeAlias),
        round((col("__sy").cast("double")
            - col("__num").cast("double") / col("__den").cast("double")
              * col("__sx").cast("double"))
          / col("n_points").cast("double") / lit(1000000d), 6)
          .as(interceptAlias))
  }
}
