package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Training-data curation operators a 100 TB pipeline needs beyond the
  * reference's relational surface: intra-document repetition metrics,
  * benchmark-contamination detection, greedy sequence packing, and
  * salted (skew-proof) aggregation.  Everything is built from codegen'd
  * built-ins — narrow projections where possible, and where a shuffle is
  * unavoidable its key and payload are chosen so the plan survives a
  * 1000-executor scale-up (documented per op).
  */
object PipelineOps {

  /** Word n-grams of a MATERIALIZED token-array column, computed inside
    * the row (no explode, no shuffle).  `toks` must be a bound column
    * reference (`withColumn` it first), not a raw `split(...)`
    * expression — higher-order lambdas re-evaluate captured expressions
    * per element (see CLAUDE.md).  Returns an empty array when the
    * document is shorter than `n`.
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    require(n >= 1)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of duplicated elements in an array:
    * `1 - |distinct| / |all|`, rounded to 6 dp; 0.0 for empty input.
    */
  def dupFraction(arr: Column): Column =
    when(size(arr) > 0,
      round(lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr), 6))
      .otherwise(lit(0.0))

  /** Gopher-style intra-document repetition metrics: duplicate word /
    * bigram / trigram fractions, appended as columns.  Pure per-row
    * column arithmetic — a single codegen'd projection over the scan,
    * linear in document bytes at any scale (the n-gram arrays live only
    * inside the projection, never in a shuffle).
    */
  def repetitionMetrics(df: DataFrame, textCol: String): DataFrame = {
    val withToks = df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
    withToks
      .withColumn("dup_word_frac", dupFraction(col("__toks")))
      .withColumn("__g2", wordNgrams(col("__toks"), 2))
      .withColumn("__g3", wordNgrams(col("__toks"), 3))
      .withColumn("dup_bigram_frac", dupFraction(col("__g2")))
      .withColumn("dup_trigram_frac", dupFraction(col("__g3")))
      .drop("__toks", "__g2", "__g3")
  }

  /** Benchmark-contamination check: for every training document, count
    * how many of its distinct word `n`-grams appear in ANY benchmark
    * document (docs with `doc_id % benchMod == 0` play the benchmark
    * set).  Returns one row per training doc:
    * (doc_id, source, n_grams, n_shared).
    *
    * Scale shape: the benchmark n-gram set is deduplicated and hashed to
    * 64-bit (xxhash64) before the join, so the small side carries 8
    * bytes per distinct benchmark n-gram.  The join carries NO broadcast
    * hint — the benchmark set's size is input-dependent, so AQE picks a
    * broadcast hash join when it measures small (the common case: the
    * training side then streams with no shuffle of document text) and
    * the plan degrades gracefully to a
    * shuffled join on the hash key.  Hashing is an implementation detail
    * (64-bit collisions are negligible); the DuckDB oracle joins on the
    * raw strings and must agree.
    */
  def contamination(docs: DataFrame, n: Int = 5, benchMod: Long = 97,
      materialize: Boolean = true): DataFrame = {
    val withG = docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        array_distinct(wordNgrams(col("__toks"), n)).as("__g"))
      // Three consumers (benchmark set, training explode, per-doc base);
      // persist so tokenization + n-gram construction runs once.
      .persist(StorageLevel.MEMORY_AND_DISK)
    val isBench = col("doc_id") % benchMod === 0
    val bench = withG.filter(isBench)
      .select(explode(col("__g")).as("g")).distinct()
      .select(xxhash64(col("g")).as("gh"))
    val shared = withG.filter(!isBench)
      .select(col("doc_id"), col("source"), explode(col("__g")).as("g"))
      .select(col("doc_id"), col("source"), xxhash64(col("g")).as("gh"))
      .join(bench, Seq("gh"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shared"))
    val scored = withG.filter(!isBench)
      .select(col("doc_id"), col("source"), size(col("__g")).as("n_grams"))
      .join(shared, Seq("doc_id", "source"), "left")
      .na.fill(0L, Seq("n_shared"))
    // per-doc scores (4 narrow cols) — the natural pipeline output —
    // are materialized; the corpus-sized n-gram cache is released.
    // materialize=false keeps the plan lazy (for inspection or fusion
    // into a larger query); the caller then owns the cache lifetime.
    if (materialize) CacheScope.releasing(scored, withG) else scored
  }

  /** Greedy sequence packing for training-batch assembly: documents are
    * laid out in `orderCol` order within each `shardCol` shard, and each
    * doc is assigned to the fixed-size token bin its start offset falls
    * in (`seq_bin = floor(cum_tokens_before / budget)`).
    *
    * Scale shape: ONE shuffle, partitioned by shard; the running sum is
    * a window inside each shard partition, so parallelism = number of
    * shards (at 100 TB, shard = file group / date bucket, thousands of
    * them).  No global sort and no driver state.
    */
  def sequencePacking(df: DataFrame, shardCol: String, orderCol: String,
      tokCol: Column, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__ntok", tokCol)
      .withColumn("__cum", coalesce(sum(col("__ntok")).over(w), lit(0L)))
      .withColumn("seq_bin", floor(col("__cum") / budget.toDouble).cast("long"))
      .drop("__cum")
      .withColumnRenamed("__ntok", "n_tok")
  }

  /** Two-phase salted aggregation (count + sum) for skewed or
    * low-cardinality group keys.  A plain `groupBy(key)` over a
    * low-cardinality key funnels each key's entire data through one
    * reducer — the classic straggler at 100 TB.  Salting splits each key
    * into `salts` sub-groups (salt derived from a stable row attribute,
    * so the result is deterministic), aggregates partially, then
    * combines the tiny (|keys| × salts) intermediate exactly.
    *
    * Spark's map-side partial aggregation already mitigates this for
    * algebraic aggregates; the salted form is the general pattern that
    * also covers high-cardinality-payload aggs (collect-like,
    * approx-sketch merges) where map-side combine doesn't collapse the
    * data.  Result is identical to the direct aggregation.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, value: Column,
      saltSrc: Column, salts: Int = 32): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts.toLong)))
      .withColumn("__v", value)
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("val_sum"))
  }

  /** C4/Gopher-style curation funnel: classify every document with the
    * FIRST failing filter, in documented priority order —
    * `too_short` (fewer than `minTokens` tokens), `repetitive`
    * (duplicate-word fraction above `maxDupFrac`), `low_quality`
    * (composite quality score below `minQuality`) — else `kept`.
    * Appends a `status` column; reject reasons are mutually exclusive
    * so funnel counts partition the corpus exactly.
    *
    * Scale shape: the tokens are materialized ONCE per row and every
    * metric derives from that bound column — one narrow codegen
    * projection over the scan, no shuffle, no UDF.  At 100 TB this is
    * the shape you want: classification cost is strictly linear in
    * input bytes and embarrassingly parallel.
    */
  def curationFunnel(docs: DataFrame, textCol: String, minTokens: Int = 10,
      maxDupFrac: Double = 0.3, minQuality: Double = 0.3): DataFrame = {
    docs.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__dup", dupFraction(col("__toks")))
      .withColumn("__q",
        TextAnalysis.qualityFromToks(col(textCol), col("__toks")))
      .withColumn("status",
        when(size(col("__toks")) < minTokens, "too_short")
          .when(col("__dup") > maxDupFrac, "repetitive")
          .when(col("__q").getField("quality_score") < minQuality, "low_quality")
          .otherwise("kept"))
      .drop("__toks", "__dup", "__q")
  }

  /** Temperature-based source-mixture sampling (multilingual-corpus
    * reweighting): per-key target mass ∝ count^alpha — `alpha = 1`
    * keeps natural proportions, `alpha < 1` flattens the mixture toward
    * small sources (the standard multilingual resampling curve) — then
    * each row is kept deterministically when its id hash falls under
    * the key's rate `min(1, mass_share * budget / count)`.
    *
    * Rates are rounded to 9 dp before the comparison so the float
    * reduction order (engine-dependent at the last ulp) can never flip
    * a row across the integer hash boundary — the keep set is exactly
    * reproducible anywhere.
    *
    * Scale shape: one aggregation (|keys| rows) → equi-join of the
    * rate table back onto the stream → narrow deterministic filter.
    * The rate table is KEY-cardinality-sized (unbounded for a
    * high-cardinality key), so it carries no broadcast hint — AQE
    * broadcasts it when it measures small, which is the usual
    * source-mixture case.  No sampling state, resumable on any subset.
    */
  def temperatureSample(df: DataFrame, keyCol: String, idCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && budget > 0)
    val counts = df.groupBy(col(keyCol)).count()
    val withW = counts.withColumn("__w", pow(col("count"), lit(alpha)))
    val rates = withW
      .crossJoin(broadcast(withW.agg(sum(col("__w")).as("__sw"))))
      .withColumn("keep_rate", round(
        least(lit(1.0), col("__w") / col("__sw") * budget / col("count")), 9))
      .select(col(keyCol), col("keep_rate"))
    df.join(rates, keyCol)
      .filter(pmod(col(idCol) * lit(2654435761L), lit(1000000L)) <
        col("keep_rate") * 1000000)
  }

  /** Overlapping fixed-token-window document chunking (context-window
    * preparation): each document's whitespace tokens are cut into
    * windows of `chunkSize` tokens starting every `stride` tokens
    * (`stride < chunkSize` ⇒ consecutive chunks overlap by
    * `chunkSize - stride`).  Empty/whitespace-only docs yield no chunks.
    *
    * Output columns: `idCol`, `chunk_idx` (0-based), `chunk` (the
    * space-joined window), `n_tok` (window length; only a document's
    * last chunk may be short).
    *
    * Scale shape: a single narrow projection + generator — tokens are
    * split once per row, window starts come from `sequence`, and
    * `slice`/`concat_ws` run inside the same codegen stage.  No shuffle,
    * no state; output size is `ceil(n/stride)` rows per doc, linear in
    * input bytes regardless of cluster size.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    df.filter(length(trim(col(textCol))) > 0)
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "__st")))
      .withColumn("__win", slice(col("__toks"), col("__st") + 1, lit(chunkSize)))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("__win")).as("chunk"),
        size(col("__win")).cast("long").as("n_tok"))
  }

  /** Deterministic hash-based train/validation/test split: each row is
    * assigned a named split by its id's multiplicative-hash bucket in
    * [0, 1000), with cumulative fraction thresholds.  Stateless and
    * stable — the same id lands in the same split on any cluster, any
    * run, any subset of the data (no sampling, no shuffle, no seed
    * coordination across executors), which is what makes held-out sets
    * reproducible at 100 TB.
    *
    * `fractions` e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`
    * (must sum to 1 within rounding; the last split absorbs the
    * remainder).  Appends a `split` column.
    */
  def assignSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 >= 0))
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-6,
      "split fractions must sum to 1")
    val bucket = pmod(col(idCol) * lit(2654435761L), lit(1000L))
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * 1000).toInt)
    val expr = fractions.init.zip(cuts).foldRight(
        lit(fractions.last._1): Column) { case (((name, _), cut), rest) =>
      when(bucket < cut, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Split-leakage audit — the check a leakage-safe split pipeline runs
    * before training.  Row-hash splits (hash each row's own id) scatter
    * a group's rows across train/val/test, so anything group-correlated
    * (an author's style, a user's behaviour, near-identical documents)
    * leaks from train into test; the fix is hashing the GROUP key in
    * [[assignSplit]] (same key → same bucket, leakage-free by
    * construction, zero extra shuffle — the split stays a pure row
    * expression).  This op PROVES the property from the assigned output
    * instead of trusting the construction: per group it counts distinct
    * splits, then reports (n_groups, n_leaky_groups, max_splits_per_
    * group).  One group-keyed aggregation plus one scalar fold — the
    * audit never re-shuffles row payloads, only (group, split) pairs.
    */
  def splitLeakage(assigned: DataFrame, groupCol: String): DataFrame = {
    val perGroup = assigned
      .groupBy(col(groupCol)).agg(count_distinct(col("split")).as("k"))
    perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("k") > 1L, 1L).otherwise(0L)).cast("long")
        .as("n_leaky_groups"),
      max(col("k")).cast("long").as("max_splits_per_group"))
  }

  /** Length-bucketed batching report — the padding-waste accounting
    * behind bucketed batch assembly (group sequences of similar length
    * so a batch pads to its bucket's edge, not the global max).  Each
    * document lands in the smallest bucket edge ≥ its token count
    * (documents longer than the last edge are truncated to it), and
    * per bucket the report gives document/token totals, padded-slot
    * waste at that edge, truncation loss, and the batch count at
    * `batchSize` sequences per batch.
    *
    * One narrow projection (token count + bucket pick) feeding one
    * groupBy over ≤ |edges| groups — a single map-side-combined
    * aggregation regardless of corpus size.
    */
  def lengthBuckets(df: DataFrame, idCol: String, textCol: String,
      edges: Seq[Int], batchSize: Int): DataFrame = {
    require(edges.nonEmpty && edges.zip(edges.tail).forall(p => p._1 < p._2),
      "bucket edges must be strictly ascending")
    require(batchSize >= 1)
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val edge = edges.init.foldRight(lit(edges.last.toLong): Column) {
      case (e, rest) => when(n <= e, e.toLong).otherwise(rest)
    }
    df.select(col(idCol), n.as("__n"), edge.as("bucket_edge"))
      .groupBy(col("bucket_edge"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("__n"), col("bucket_edge"))).cast("long").as("n_tokens"),
        sum(col("bucket_edge") - least(col("__n"), col("bucket_edge")))
          .cast("long").as("n_pad"),
        sum(greatest(col("__n") - col("bucket_edge"), lit(0L)))
          .cast("long").as("n_truncated"),
        ceil(count(lit(1)).cast("double") / batchSize)
          .cast("long").as("n_batches"))
      .orderBy(col("bucket_edge"))
  }

  /** Segmented prefix sum at scale: appends `__before` = the sum of
    * `valueCol` over all EARLIER rows of the same segment, where
    * "earlier" is `orderCols` order (must be unique within a segment).
    * The naive formulation — a window partitioned by segment — pins
    * every row of a segment to ONE task, which dies when a segment is
    * domain-sized.  Here the classic two-pass scan: range-repartition
    * on (segment, order) so each segment spans consecutive sorted
    * partitions, run the cumulative window per (partition, segment) —
    * bounded by PARTITION size, never segment size — and add the
    * per-(partition, segment) subtotal offsets broadcast back.
    *
    * The offsets table is filtered to segments that STRADDLE a
    * partition boundary before the broadcast: a range-partitioned
    * segment is contiguous, so at most numPartitions−1 segments can
    * straddle and the broadcast is ≤ parts² rows BY CONSTRUCTION even
    * when the segment key has data-scale cardinality (a per-key
    * offsets broadcast would be the vocabulary-broadcast class all
    * over again).  Non-straddling segments left-join to no offset and
    * take 0.
    *
    * The tagged frame persists for the same reason as
    * [[globalRowNumber]]: the offset and output branches must see the
    * same sampled range boundaries.
    */
  def segmentedPrefixSum(df: DataFrame, segCols: Seq[String],
      orderCols: Seq[String], valueCol: String,
      numPartitions: Int = 0): DataFrame =
    segmentedPrefixSums(df, segCols, orderCols, Seq(valueCol), numPartitions)
      .withColumnRenamed(s"__before_$valueCol", "__before")

  /** [[segmentedPrefixSum]] for SEVERAL value columns at once — one
    * range shuffle, one local window pass, one boundary-offset
    * broadcast, N running totals (a per-column call would pay the
    * shuffle N times).  Appends `__before_<col>` per value column.
    * This is the kernel the exact ECDF statistics ([[Drift.ksStatistic]]
    * needs BOTH sides' cumulative counts on the same merged frame)
    * ride instead of an unpartitioned ordered window.
    */
  def segmentedPrefixSums(df: DataFrame, segCols: Seq[String],
      orderCols: Seq[String], valueCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(segCols.nonEmpty && orderCols.nonEmpty && valueCols.nonEmpty)
    val ord = (segCols ++ orderCols).map(col)
    val ranged =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, ord: _*)
       else df.repartitionByRange(ord: _*))
        .sortWithinPartitions(ord: _*)
    val tagged = ranged.withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wLocal = Window
      .partitionBy((col("__pid") +: segCols.map(col)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSeg = Window.partitionBy(segCols.map(col): _*)
    val wSegByPid = wSeg.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subtotals = tagged
      .groupBy((col("__pid") +: segCols.map(col)): _*)
      .agg(sum(col(valueCols.head)).as(s"__pt_${valueCols.head}"),
        valueCols.tail.map(v => sum(col(v)).as(s"__pt_$v")): _*)
      .withColumn("__npid", count(lit(1)).over(wSeg))
      .filter(col("__npid") > 1)
    val offsets = valueCols.foldLeft(subtotals) { (d, v) =>
        d.withColumn(s"__off_$v",
          coalesce(sum(col(s"__pt_$v")).over(wSegByPid), lit(0L)))
      }
      .select((col("__pid") +: segCols.map(col)) ++
        valueCols.map(v => col(s"__off_$v")): _*)
    val withLocals = valueCols.foldLeft(tagged) { (d, v) =>
      d.withColumn(s"__local_$v",
        coalesce(sum(col(v)).over(wLocal), lit(0L)))
    }
    val joined = withLocals.join(broadcast(offsets), "__pid" +: segCols, "left")
    valueCols.foldLeft(joined) { (d, v) =>
        d.withColumn(s"__before_$v",
          coalesce(col(s"__off_$v"), lit(0L)) + col(s"__local_$v"))
      }
      .drop("__pid" +:
        valueCols.flatMap(v => Seq(s"__local_$v", s"__off_$v")): _*)
  }

  /** Token-budget mixture builder — the "take N tokens from each
    * domain" step that assembles a training mix from a curated pool.
    * Within each domain, documents are ordered by a deterministic
    * multiplicative-hash priority (an id-seeded shuffle that needs no
    * RNG state and is identical on any cluster), and the greedy prefix
    * is kept while the tokens consumed BEFORE a document stay under
    * the domain's budget — so the straddling document is kept and
    * every domain reaches ≥ its budget when it has the supply.
    *
    * Scale shape: one narrow projection (token count + priority), then
    * the running total comes from [[segmentedPrefixSum]] — cumulative
    * work bounded by PARTITION size even when one domain holds most of
    * the corpus (a domain-partitioned window would pin that domain to
    * a single task), then a filter.
    */
  def tokenBudgetMixture(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0))
    val budget = budgets.foldLeft(lit(null).cast("long"): Column) {
      case (rest, (dom, b)) => when(col(domainCol) === dom, b).otherwise(rest)
    }
    val base = df.select(col(idCol), col(domainCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"),
        pmod(col(idCol) * lit(2654435761L), lit(1048576L)).as("__prio"),
        budget.as("__budget"))
      .filter(col("__budget").isNotNull)
    segmentedPrefixSum(base, Seq(domainCol), Seq("__prio", idCol), "n_tok")
      .filter(col("__before") < col("__budget"))
      .select(col(idCol), col(domainCol), col("n_tok"),
        (col("__before") + col("n_tok")).as("cum_tokens"))
  }

  /** Consecutive global row numbers (1-based) in `orderCols` order —
    * the shard/example-id assignment step — WITHOUT the partitionless
    * window that funnels the whole dataset through one task.
    *
    * Three-stage zipWithIndex, all relational: range-repartition on the
    * order key and sort within partitions (one shuffle, the same one
    * any global sort pays); tag rows with `monotonically_increasing_id`
    * (partition id in the high bits, a per-partition counter that
    * follows the sorted order in the low bits — a narrow projection);
    * then offset each partition's local index by the total row count of
    * the partitions before it, computed from a partition-count frame of
    * ≤ `numPartitions` rows and broadcast back.  No stage sees more
    * than one partition's rows in one task.
    *
    * `orderCols` must be a UNIQUE total order (enforce upstream) —
    * otherwise numbering among ties follows partition boundaries.
    *
    * The tagged frame is persisted (MEMORY_AND_DISK) because the
    * offset branch and the output branch must observe the SAME range
    * boundaries — range repartitioning samples, and two independent
    * executions could split differently.  The cache is scoped to the
    * returned frame's lifetime (ContextCleaner reclaims it when the
    * result becomes unreachable).
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty)
    val ord = orderCols.map(col)
    val ranged =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, ord: _*)
       else df.repartitionByRange(ord: _*))
        .sortWithinPartitions(ord: _*)
    val tagged = ranged.withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val offsets = tagged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n"))
        .over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    tagged.join(broadcast(offsets), Seq("__pid"))
      .withColumn("rn", col("__off") + col("__local") + 1L)
      .drop("__mid", "__pid", "__local")
  }

  /** Serpentine (boustrophedon) balanced sharding: documents ranked by
    * token count DESCENDING are dealt into `shards` shards
    * back-and-forth — pass 0 deals shards 0..S−1, pass 1 deals
    * S−1..0, … — so every shard receives one document from each size
    * class and heavy/light documents cancel.  The classic one-pass
    * approximation of longest-processing-time assignment that stays
    * expressible as pure rank arithmetic (true LPT needs a priority
    * queue), used to keep training shards byte-balanced.
    *
    * Scale shape: the global size rank comes from [[globalRowNumber]]
    * (range shuffle + broadcast partition counts, no global window);
    * the shard id is arithmetic on the rank; the report is one
    * map-side-combined aggregation to `shards` rows.
    *
    * @return (shard, n_docs, n_tokens) one row per shard
    */
  def serpentineShards(df: DataFrame, idCol: String, textCol: String,
      shards: Int): DataFrame = {
    require(shards >= 2 && shards <= 65536)
    val sized = df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__w"))
      .withColumn("__negw", -col("__w"))
    globalRowNumber(sized, Seq("__negw", idCol))
      .withColumn("__i", col("rn") - 1)
      .withColumn("__pass", expr(s"__i div ${shards}"))
      .withColumn("shard", when(pmod(col("__pass"), lit(2)) === 0,
          pmod(col("__i"), lit(shards.toLong)))
        .otherwise(lit(shards - 1L) - pmod(col("__i"), lit(shards.toLong))))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).cast("long").as("n_tokens"))
      .orderBy(col("shard"))
  }

  /** Deterministic per-epoch data ordering — the reproducible "shuffle
    * each epoch" every training run needs: within an epoch, documents
    * order by a multiplicative-hash priority of (id, epoch, seed), and
    * consecutive `batchSize` documents form a batch.  Identical on any
    * cluster, any partitioning, any retry, with no RNG state — and two
    * epochs give genuinely different orders from the same corpus.
    *
    * Scale shape: per-epoch ordinals come from
    * [[segmentedPrefixSum]] over the (epoch)-segmented frame —
    * cumulative work bounded by partition size, no epoch-partitioned
    * window (an epoch IS the whole corpus, the worst possible window
    * key).
    *
    * @return (epoch, idCol, ord, batch_id) — ord 1-based within epoch
    */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int,
      batchSize: Int, seed: Long): DataFrame = {
    require(epochs >= 1 && epochs <= 64 && batchSize >= 1)
    // the epoch term must enter NON-affinely: a purely additive shift
    // (id·a + e·b mod 2³¹) only ROTATES the priority order between
    // epochs, it doesn't reshuffle it — squaring the mixed value makes
    // each epoch's order genuinely independent while staying
    // overflow-safe (u < 2³¹ ⇒ u² < 2⁶²) and exactly replayable in SQL
    val base = df.select(col(idCol),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("__u", pmod(
        col(idCol) * 2654435761L + col("epoch") * 40503L + seed,
        lit(2147483648L)))
      .withColumn("__prio", pmod(col("__u") * col("__u") + col("__u"),
        lit(2147483648L)))
      .withColumn("__one", lit(1L))
    segmentedPrefixSum(base, Seq("epoch"), Seq("__prio", idCol), "__one")
      .withColumn("ord", col("__before") + 1)
      .withColumn("batch_id", expr(s"__before div ${batchSize}"))
      .select(col("epoch").cast("long").as("epoch"), col(idCol),
        col("ord"), col("batch_id"))
  }

  /** Smoothed target encoding (the ML-feature-prep classic): each
    * category's code is the shrunk mean
    * `(Σy_cat + m·global_mean) / (n_cat + m)` — high-count categories
    * keep their own mean, rare ones shrink to the prior.  Computed
    * ENTIRELY in integers: values become exact cents, the shrinkage
    * becomes `(sum·N + m·T)·10⁶ div ((n+m)·N)` over DECIMAL(38,0)
    * intermediates (sum = category cents, N/T = global count/cents),
    * so the encoding is bit-identical on any engine and partitioning —
    * float means would drift in the last ulp with summation order.
    *
    * Scale shape: one map-side-combined aggregation per category plus
    * a 1-row global total cross-joined in (broadcast scalar) — the
    * category table is the output.
    *
    * @return (catCol, n_rows, enc_micro) with enc_micro the encoding
    *         in micro-value units
    */
  def targetEncode(df: DataFrame, catCol: String, valueCol: String,
      m: Long): DataFrame = {
    require(m >= 0)
    val cents = df.select(col(catCol),
      round(col(valueCol) * 100).cast("long").as("__c"))
    val stats = cents.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"))
    val tot = cents.agg(count(lit(1)).as("__tn"), sum(col("__c")).as("__ts"))
    stats.crossJoin(broadcast(tot))
      .select(col(catCol), col("__n").as("n_rows"),
        expr(s"CAST((CAST(__s AS DECIMAL(38,0)) * __tn + ${m}L * __ts) " +
          s"* 1000000 div ((__n + ${m}L) * CAST(__tn AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("enc_micro"))
  }

  /** Deterministic weighted categorical sampling WITH replacement —
    * the negative-sampling kernel (word2vec's unigram^0.75 draw) at
    * cluster scale: instead of a driver-resident alias table, the
    * categorical distribution becomes an integer inverse-CDF laid out
    * as [lo, hi) intervals over the cumulative weight line, and the
    * `n` hash-deterministic draws resolve by a BINNED range join
    * ([[RangeJoin.binned]]) — an equi-join on the bin key, never a
    * nested loop, with the category side expanding to ≤ 2 bins each.
    *
    * All arithmetic is integer (weights arrive as micro-units), so the
    * draw→category mapping is bit-identical on any engine and
    * partitioning.  The cumulative weight line comes from
    * [[segmentedPrefixSum]] over the category frame — vocabulary
    * cardinality grows with the corpus (Heaps' law), so the scan must
    * be partition-bounded, not an unpartitioned ordered window; the
    * two scalars (total and max weight) are one 1-row driver action —
    * distribution state, not data.
    *
    * @param weights (keyCol, weightCol) one row per category; integer
    *                weights > 0 (micro-scale fractional weights first)
    * @param n       number of draws (draw_id 0..n-1)
    * @return (draw_id, keyCol) — the sampled category per draw
    */
  def sampleCategorical(weights: DataFrame, keyCol: String,
      weightCol: String, n: Long, seed: Long): DataFrame = {
    require(n > 0)
    val spark = weights.sparkSession
    val base = weights
      .select(col(keyCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
    val scalars = base.agg(sum(col("__w")), max(col("__w"))).head()
    val (total, maxW) = (scalars.getLong(0), scalars.getLong(1))
    val cum = segmentedPrefixSum(
        base.withColumn("__seg", lit(1)), Seq("__seg"), Seq(keyCol), "__w")
      .withColumn("__lo", col("__before"))
      .withColumn("__hi", col("__lo") + col("__w") - 1)
      .drop("__seg", "__before")
    val draws = spark.range(n).select(col("id").as("draw_id"),
      pmod(col("id") * 2654435761L + seed, lit(total)).as("__u"))
    RangeJoin.binned(draws, cum, "__u", "__lo", "__hi", binWidth = maxW)
      .select(col("draw_id"), col(keyCol))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis A-ES, IPL 2006): per stratum keep the k rows with the
    * largest `u^(1/w)` where u is a uniform draw — here a
    * multiplicative-hash uniform from the row id, so the sample is
    * reproducible on any cluster with no RNG state.  Ranking uses the
    * monotone-equivalent key `ln(u)/w` (one `ln`, no pow) with the id
    * as tiebreak.
    *
    * One narrow projection, then the per-stratum selection runs
    * through the bounded-heap [[graft.plans.TopK]] operator — O(n log
    * k) single pass, memory O(strata·k), no per-stratum sort or window
    * over the raw frame (which would pin a whole stratum to one
    * task).  Ranks are assigned afterwards on the k-bounded survivors
    * only.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val u = (pmod(col(idCol) * lit(2654435761L), lit(2147483648L)) + 1D) /
      2147483649D
    val key = log(u) / col(weightCol)
    val keyed = df.filter(col(weightCol) > 0).withColumn("__key", key)
    graft.plans.TopK.perKey(keyed, Seq(col(strataCol)),
        Seq(col("__key").desc, col(idCol).asc), k)
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(strataCol))
          .orderBy(desc("__key"), col(idCol))))
      .drop("__key")
  }

  /** Exact-proportion stratified split — the complement of
    * [[assignSplit]]'s hash buckets.  Hash splits are leakage-safe and
    * stateless but only hit the target fractions in EXPECTATION; a
    * small or skewed stratum can land val/test counts far off target
    * (a 50-doc language getting 2 val docs instead of 5).  Here every
    * stratum gets EXACTLY ⌊n_s·val_ppm/10⁶⌋ val rows and
    * ⌊n_s·(val+test)_ppm/10⁶⌋−⌊n_s·val_ppm/10⁶⌋ test rows — the first
    * ranks of the caller's deterministic order (pass a hash-derived
    * order for randomization; pass time for a chronological holdout).
    *
    * Scale shape: the within-stratum rank comes from
    * [[segmentedPrefixSum]] — cumulative work bounded by PARTITION
    * size even when one stratum is most of the corpus (a
    * stratum-partitioned window would pin it to one task) — and the
    * stratum sizes join back on the stratum key.  Cut points are pure
    * integer arithmetic, so the assignment is bit-identical under any
    * partitioning.
    *
    * @param orderCols deterministic total order within a stratum (must
    *        be unique per row — include a unique id as tiebreak)
    * @return the input rows plus a `split` column ∈ {val, test, train}
    */
  def stratifiedExactSplit(df: DataFrame, strataCols: Seq[String],
      orderCols: Seq[String], valPpm: Long, testPpm: Long): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000L,
      s"val + test ppm must be within [0, 1000000], got $valPpm + $testPpm")
    val sizes = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__ns"))
    segmentedPrefixSum(df.withColumn("__one", lit(1L)), strataCols,
        orderCols, "__one")
      .join(sizes, strataCols)
      .withColumn("split",
        when(col("__before") <
            expr(s"CAST(__ns AS DECIMAL(38,0)) * $valPpm div 1000000"), "val")
          .when(col("__before") <
            expr(s"CAST(__ns AS DECIMAL(38,0)) * ${valPpm + testPpm} " +
              "div 1000000"), "test")
          .otherwise("train"))
      .drop("__one", "__before", "__ns")
  }

  /** Water-filling token-budget allocation across domains — the
    * mixture-assembly step that [[tokenBudgetMixture]] consumes:
    * distribute `budget` proportionally to `weightCol` but never give
    * a domain more than `capCol` (its available tokens after dedup /
    * filtering).  Domains whose fair share exceeds their cap are
    * capped and their surplus re-flows to the rest — the classic
    * water-filling fixed point, computed in ONE pass over the sorted
    * domain frame instead of iterating.
    *
    * Exactness: domains sort by cap/weight (the one IEEE-double key —
    * identical in any engine; ties by domain); the capped set is the
    * running-AND prefix where `c_k·W_k ≤ R_k·w_k` holds with EXACT
    * DECIMAL(38,0) cross-multiplication (R_k, W_k = budget and weight
    * remaining after the earlier prefix).  Uncapped domains get
    * `⌊R*·w_d/W*⌋` plus largest-remainder +1s (remainder DESC, domain
    * ASC), so Σ alloc = min(budget, Σ caps) EXACTLY and the result is
    * bit-identical under any partitioning.
    *
    * Scale contract: the input is the DOMAIN frame (one row per
    * source — mixture-config-sized, the [[tokenBudgetMixture]]
    * contract), so its windows are bounded by construction.  Weights
    * must be positive, caps non-negative — enforced loudly.
    *
    * @return one row per domain: (domainCol, weight, cap, alloc,
    *         capped)
    */
  def waterFillBudget(domains: DataFrame, domainCol: String,
      weightCol: String, capCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val d = domains.select(col(domainCol).as("__dom"),
        col(weightCol).cast("long").as("__w"),
        col(capCol).cast("long").as("__c"))
      .withColumn("__w", when(col("__w") > 0L, col("__w"))
        .otherwise(raise_error(concat(
          lit("waterFillBudget: non-positive weight for domain "),
          col("__dom").cast("string")))))
      .withColumn("__c", when(col("__c") >= 0L, col("__c"))
        .otherwise(raise_error(concat(
          lit("waterFillBudget: negative cap for domain "),
          col("__dom").cast("string")))))
    val ord = Window.orderBy(
      (col("__c").cast("double") / col("__w").cast("double")).asc,
      col("__dom").asc)
    val pre = d
      .withColumn("__cumC", coalesce(sum(col("__c")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__cumW", coalesce(sum(col("__w")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = d.agg(sum(col("__w")).as("__totW"))
    val cond = pre.crossJoin(tot)
      .withColumn("__hold", when(
        expr(s"CAST(__c AS DECIMAL(38,0)) * (__totW - __cumW) <= " +
          s"CAST($budget - __cumC AS DECIMAL(38,0)) * __w"), 1L)
        .otherwise(0L))
      // capped set = the maximal PREFIX where the condition holds.
      .withColumn("capped", sum(lit(1L) - col("__hold")).over(
        ord.rowsBetween(Window.unboundedPreceding, 0)) === 0L)
    val line = cond.agg(
      sum(when(col("capped"), col("__c")).otherwise(0L)).as("__cappedC"),
      sum(when(col("capped"), lit(0L)).otherwise(col("__w"))).as("__wStar"))
    val based = cond.crossJoin(line)
      .withColumn("__rStar",
        greatest(lit(0L), lit(budget) - col("__cappedC")))
      .withColumn("__base", when(col("capped"), col("__c")).otherwise(
        expr("CAST(CAST(__rStar AS DECIMAL(38,0)) * __w div __wStar " +
          "AS BIGINT)")))
      .withColumn("__rem", when(col("capped"), lit(-1L)).otherwise(
        expr("CAST(CAST(__rStar AS DECIMAL(38,0)) * __w % __wStar " +
          "AS BIGINT)")))
    val extra = based.agg(
      max(col("__rStar")).as("__r2"),
      sum(when(col("capped"), 0L).otherwise(col("__base"))).as("__baseSum"))
    based.crossJoin(extra)
      .withColumn("__rnk", row_number().over(
        Window.orderBy(col("__rem").desc, col("__dom").asc)))
      .withColumn("__alloc", when(col("capped"), col("__c"))
        .otherwise(col("__base") +
          when(col("__rnk") <= col("__r2") - col("__baseSum"), 1L)
            .otherwise(0L)))
      // waterline invariant: an uncapped domain's proportional share
      // is strictly below its cap (+1 can only reach it) — violated
      // only if the ratio order were wrong; fail LOUDLY, never
      // over-allocate silently.
      .withColumn("__alloc", when(col("__alloc") <= col("__c"),
        col("__alloc")).otherwise(raise_error(concat(
          lit("waterFillBudget: allocation above cap for domain "),
          col("__dom").cast("string")))))
      .select(col("__dom").as(domainCol),
        col("__w").as("weight"), col("__c").as("cap"),
        col("__alloc").as("alloc"), col("capped"))
  }

  /** Greedy maximum-coverage selection — the submodular data-selection
    * kernel (facility location's set-cover cousin; the greedy is the
    * classic (1−1/e)-approximation): pick `k` documents one at a time,
    * each round the document adding the most NOT-YET-COVERED distinct
    * tokens, ties to the smaller id.  This is how a diverse seed /
    * eval / annotation subset is cut from a candidate pool — pure
    * frequency ranking picks k near-duplicates; coverage greedy
    * penalizes overlap by construction.
    *
    * Determinism: token sets are exact distinct unigrams; every argmax
    * is (gain DESC, id ASC)-total.  A round where no remaining
    * document adds ANY new token stops early (the standard greedy
    * termination — selecting a zero-gain doc is noise).
    *
    * Scale contract: selection is inherently k-SEQUENTIAL, so `docs`
    * is the bounded candidate pool an upstream ranking/sampling step
    * produced (the [[graft.ops.Bpe]] round contract).  Each round is
    * one token-keyed anti-join + one per-doc aggregation + a 1-row
    * TakeOrdered argmax — the only driver traffic is that single row
    * per round; the covered-token frame is checkpointed through the
    * lineage-captured helper and never collected.
    *
    * @param docs candidate pool with a BIGINT id column
    * @return one row per selected doc: (round, doc_id, new_grams,
    *         covered_total), round ascending
    */
  def greedyCoverageSelect(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in 1..64, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = CacheScope.traced(docs
      .select(col(idCol).cast("long").as("__id"),
        explode(array_distinct(split(col(textCol), " "))).as("__tok")))
    var covered = grams.select(col("__tok")).limit(0)
    var chosen = List.empty[(Int, Long, Long, Long)]
    var selected = List.empty[Long]
    var total = 0L
    var done = false
    for (r <- 1 to k if !done) {
      val remaining =
        if (selected.isEmpty) grams
        else grams.filter(!col("__id").isin(selected: _*))
      val win = remaining.join(covered, Seq("__tok"), "left_anti")
        .groupBy(col("__id")).agg(count(lit(1)).as("__gain"))
        .orderBy(col("__gain").desc, col("__id").asc)
        .limit(1).collect()
      if (win.isEmpty) done = true
      else {
        val id = win(0).getLong(0)
        val gain = win(0).getLong(1)
        total += gain
        selected ::= id
        chosen ::= ((r, id, gain, total))
        if (r < k) covered = CacheScope.traced(covered.union(
          grams.filter(col("__id") === id).select(col("__tok"))))
      }
    }
    chosen.reverse
      .toDF("round", "doc_id", "new_grams", "covered_total")
  }
}
