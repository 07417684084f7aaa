package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed suffix ranking by prefix doubling (Manber–Myers) — the
  * substrate of exact-substring corpus dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022, builds suffix
  * arrays over the whole training corpus) and of longest-repeated-
  * substring mining.
  *
  * Every suffix (doc, pos) is assigned its DENSE RANK in the global
  * lexicographic order of all suffixes across all documents.  Round r
  * ranks suffixes by their first 2^r characters: the classic doubling
  * step re-ranks pairs `(rank_k(i), rank_k(i+k))` — a self equi-join on
  * (doc, pos+k), never any string re-comparison after round 0, so the
  * per-round cost is rank-pair sorting regardless of how long the
  * matched prefixes grow (naive suffix SORTING degrades to O(L) per
  * comparison on repetitive corpora — exactly the corpora dedup cares
  * about).
  *
  * Scale shape: each round is one range-repartition sort on the
  * fixed-width rank pair plus a per-partition dense rank — the global
  * dense rank comes from partition-local ranks plus broadcast
  * per-partition distinct counts (≤ numPartitions rows), the same
  * zipWithIndex device as [[PipelineOps.globalRowNumber]]; no window
  * ever spans partitions.  Rounds are `ceil(log2(maxLen))`, data-
  * independent.  Each round materializes via `localCheckpoint` (the
  * [[DupClusters]] iterative-plan contract) so lineage depth stays
  * constant.
  *
  * Shorter-is-prefix suffixes rank SMALLER (the missing half-rank joins
  * to the −1 sentinel), matching plain string comparison semantics.
  */
object SuffixArray {

  /** Global dense rank of (c1, c2) pairs without a global window:
    * range-repartition on the pair (equal pairs land in one partition),
    * rank locally per partition, and add broadcast cumulative distinct
    * counts of the preceding partitions.
    */
  private def globalDenseRank(df: DataFrame, c1: String,
      c2: String): DataFrame = {
    val ranged = df.repartitionByRange(col(c1), col(c2))
      .sortWithinPartitions(col(c1), col(c2))
    val tagged = ranged.withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val offsets = tagged.groupBy(col("__pid"))
      .agg(count_distinct(col(c1), col(c2)).as("__nd"))
      .withColumn("__off", coalesce(sum(col("__nd")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val local = dense_rank().over(
      Window.partitionBy(col("__pid")).orderBy(col(c1), col(c2)))
    val out = tagged
      .withColumn("__lr", local.cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("__r", col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off", c1, c2)
    CacheScope.releasing(out, tagged)
  }

  /** Dense global suffix ranks for every position of every document,
    * comparing up to `maxLen` characters (documents are truncated to
    * `maxLen` first, so ranks are EXACT for the truncated corpus).
    *
    * @return (idCol, pos, suffix_rank) with pos 1-based
    */
  def suffixRanks(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int): DataFrame = {
    require(maxLen >= 2 && maxLen <= 4096,
      s"maxLen out of range: $maxLen")
    // seed with 32-character substring ranks — string comparison already
    // encodes shorter-is-prefix, so starting the doubling at k=32 drops
    // five rounds (each a range shuffle + dense rank + checkpoint) with
    // identical semantics to seeding at single characters.  Trade
    // (r16, guide §1.2 "remove passes"): round 0's comparator is O(32)
    // chars instead of O(8) — a bounded constant even on adversarially
    // repetitive corpora — and every round it saves was a full
    // globalDenseRank round trip (measured ~0.5 s each at gate scale,
    // and a corpus-wide shuffle at 100 TB).
    val init = 32
    val base = df
      .select(col(idCol).as("__d"),
        substring(col(textCol), 1, maxLen).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col("__d"), col("__t"),
        explode(sequence(lit(1), length(col("__t")))).as("__p"))
      .select(col("__d"), col("__p"),
        expr(s"substring(__t, __p, $init)").as("__c1"))
    var cur = globalDenseRank(
      base.withColumn("__z", lit(0L)), "__c1", "__z")
    var k = init
    while (k < maxLen) {
      // rank_k(p + k) via lead(k) over the per-document position order:
      // positions are dense (every 1..len row present every round), so
      // the row k ahead IS position p+k, and a missing row (p+k beyond
      // the end) is the -1 shorter-is-prefix sentinel.  One hash
      // exchange on the doc key replaces the former two-sided
      // self-equi-join on (doc, pos+k) (guide §2.4: two operations
      // keyed the same way share one exchange).  The window partition
      // is bounded by the maxLen <= 4096 truncation contract
      // (PlanLintSpec keyedWindowOk).
      val wnd = Window.partitionBy(col("__d")).orderBy(col("__p"))
      val paired = cur.select(col("__d"), col("__p"), col("__r").as("__r1"),
        coalesce(lead(col("__r"), k).over(wnd), lit(-1L)).as("__r2"))
      cur = globalDenseRank(paired, "__r1", "__r2")
      k *= 2
    }
    cur.select(col("__d").as(idCol), col("__p").cast("long").as("pos"),
      col("__r").as("suffix_rank"))
  }

  /** Longest repeated substrings — the suffix-array payoff: the `topK`
    * longest strings occurring at least twice in the (truncated)
    * corpus, with a witness pair of occurrences each.  In suffix
    * order, every repeat is the common prefix of some pair of
    * ADJACENT suffixes, so the scan is: total-order suffixes by
    * (rank, doc, pos) — consecutive numbering via the
    * [[PipelineOps.globalRowNumber]] zipWithIndex device, which also
    * pairs identical suffixes (dense ranks collapse them) — then one
    * self equi-join on `rn+1` plus a per-pair common-prefix length.
    * O(corpus) pairs, never all-pairs; per-pair cost is the matched
    * length, bounded by `maxLen`.
    *
    * Ties (equal length) break on (substring, doc, pos) so the report
    * is deterministic; cross-document repeats surface naturally since
    * adjacency ignores document boundaries.
    *
    * @return (repeat_len, repeat, doc_a, pos_a, doc_b, pos_b) topK
    *         rows, longest first
    */
  def longestRepeats(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 1000)
    val ranks = suffixRanks(df, idCol, textCol, maxLen)
      .join(df.select(col(idCol), substring(col(textCol), 1, maxLen)
        .as("__t")), Seq(idCol))
      .select(col(idCol).as("__da"), col("pos").as("__pa"),
        expr(s"substring(__t, CAST(pos AS INT), $maxLen)").as("__sa"),
        col("suffix_rank"))
    val numbered = PipelineOps.globalRowNumber(ranks,
        Seq("suffix_rank", "__da", "__pa"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nxt = numbered.select((col("rn") - 1).as("rn"),
      col("__da").as("__db"), col("__pa").as("__pb"),
      col("__sa").as("__sb"))
    val pairs = numbered.join(nxt, Seq("rn"))
      .select(graft.functions.common_prefix_len(col("__sa"), col("__sb"))
          .as("repeat_len"),
        col("__sa"), col("__da"), col("__pa"), col("__db"), col("__pb"))
      .filter(col("repeat_len") >= 1)
      .select(col("repeat_len"),
        expr("substring(__sa, 1, CAST(repeat_len AS INT))").as("repeat"),
        col("__da").as("doc_a"), col("__pa").as("pos_a"),
        col("__db").as("doc_b"), col("__pb").as("pos_b"))
    val out = pairs
      .orderBy(col("repeat_len").desc, col("repeat"), col("doc_a"),
        col("pos_a"))
      .limit(topK)
    CacheScope.releasing(out, numbered)
  }
}
