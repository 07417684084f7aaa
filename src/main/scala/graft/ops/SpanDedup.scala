package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring (repeated-span) duplication analysis — the Lee et
  * al. 2022 "Deduplicating Training Data Makes Language Models Better"
  * signal (arXiv:2107.06499), re-expressed relationally: an n-token
  * span that occurs more than once ANYWHERE in the corpus (across docs
  * or repeated inside one) is a duplicated span, and a document's
  * duplicated-span count measures how much of it is boilerplate.
  *
  * Scale design: spans are built with a per-document window
  * (partitionBy doc, orderBy position, n-1 FOLLOWING) — one shuffle
  * partitioned by document, linear in corpus tokens; no higher-order
  * lambda re-tokenizes per element.  Each span immediately collapses
  * to a 64-bit xxhash, so the corpus-wide duplicate count and the
  * join back to documents shuffle fixed 8-byte keys, never span text
  * (at ~10¹² spans the 64-bit collision expectation is the usual
  * birthday bound — counts are exact up to that, same contract as
  * [[PipelineOps]] contamination).
  */
object SpanDedup {

  /** Per-document repeated-span statistics.
    *
    * @param n span length in tokens
    * @return one row per input document: (idCol, n_spans,
    *         n_dup_spans) — spans the doc contributes, and how many of
    *         them occur ≥2 times corpus-wide (both counts include
    *         every occurrence, so within-doc repetition is counted)
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val w = Window.partitionBy(idCol).orderBy("__pos").rowsBetween(0, n - 1)
    val spans = toks
      .withColumn("__window", collect_list("__tok").over(w))
      .filter(size(col("__window")) === n)
      .select(col(idCol),
        xxhash64(concat_ws(" ", col("__window"))).as("__h"))
    val dup = spans.groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2)
      .select(col("__h"), lit(1L).as("__isdup"))
    val stats = spans.join(dup, Seq("__h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("__isdup"), lit(0L))).cast("long").as("n_dup_spans"))
    docs.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
  }

  /** Keep-first exact-substring REMOVAL — the active half of Lee et
    * al. 2022 (the profile above only measures): every occurrence of a
    * corpus-duplicated n-token span EXCEPT the globally first one
    * (minimum (id, position), lexicographic) has its token positions
    * cut from the document, and the surviving tokens are re-joined in
    * order.
    *
    * Contract corners, all deterministic:
    *  - overlapping duplicated spans union their covered positions
    *    before removal (no double-counting, no partial cuts);
    *  - the first occurrence itself can still lose tokens when a
    *    DIFFERENT duplicated span's non-first occurrence overlaps it;
    *  - docs shorter than n tokens contribute no spans and pass
    *    through; a fully-covered doc comes back as the empty string.
    *
    * Scale design: same skeleton as [[spanStats]] — spans collapse to
    * 64-bit hashes at the scan, so the global first-occurrence
    * aggregation and the occurrence join shuffle (hash, id, pos)
    * triples, never span text.  Covered positions are exploded only
    * for DUPLICATED occurrences (bounded by n × dup rate, not corpus
    * tokens), then the cut is one anti-join on (id, pos) and the
    * rebuild one partial-aggregated groupBy(id).  Nothing touches the
    * driver.
    *
    * @return one row per input doc: (idCol, clean_text, n_tokens,
    *         n_kept, n_removed)
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val w = Window.partitionBy(idCol).orderBy("__pos").rowsBetween(0, n - 1)
    val spans = toks
      .withColumn("__window", collect_list("__tok").over(w))
      .filter(size(col("__window")) === n)
      .select(col(idCol), col("__pos"),
        xxhash64(concat_ws(" ", col("__window"))).as("__h"))
    val firsts = spans.groupBy("__h")
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col(idCol).as("fid"), col("__pos").as("fpos"))).as("__first"))
      .filter(col("__cnt") >= 2)
      .select(col("__h"), col("__first.fid").as("__fid"),
        col("__first.fpos").as("__fpos"))
    val covered = spans.join(firsts, Seq("__h"))
      .filter(!(col(idCol) === col("__fid") && col("__pos") === col("__fpos")))
      .select(col(idCol).as("__cid"),
        explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__cov"))
      .distinct()
    val kept = toks.join(covered,
      toks(idCol) === covered("__cid") && toks("__pos") === covered("__cov"),
      "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          s => s.getField("__tok"))).as("clean_text"))
    docs.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).cast("long").as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("long").as("n_removed"))
  }
}
