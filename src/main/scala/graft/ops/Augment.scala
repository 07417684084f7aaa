package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data augmentation: T5/UL2-style span corruption (Raffel et
  * al. 2020 §3.1.4) — mask token spans with numbered sentinels and emit
  * the (corrupted input, span targets) pair the denoising objective
  * trains on.
  *
  * Masking is DETERMINISTIC: a span starts at every token position p
  * with `(p + doc_id) % every == 0` and covers `spanLen` tokens
  * (clipped at the document tail).  `every > spanLen` keeps spans
  * disjoint by construction.  Determinism is the point for a data
  * pipeline: re-running the job reproduces byte-identical examples (no
  * RNG state to ship), and the rule is plain integer arithmetic so the
  * corruption rate is exactly spanLen/every in expectation over doc
  * ids.  Swap the arithmetic for a seeded hash to decorrelate across
  * epochs — the pipeline shape is unchanged.
  *
  * Scale design: one posexplode per doc (linear in corpus tokens), the
  * only window is per-document span numbering (partitioned by id, never
  * global), covered positions explode only spanLen rows per span, and
  * both rebuilds are partial-aggregated groupBy(id) — same cost class
  * as [[SpanDedup.removeSpans]].
  */
object Augment {

  /** @return one row per doc: (idCol, corrupted, targets, n_spans,
    *         n_masked) — `corrupted` is the text with each span
    *         replaced by its `<extra_id_k>` sentinel, `targets` the
    *         T5 target string `<extra_id_0> span tokens <extra_id_1>
    *         ...` in span order.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      every: Int = 7, spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    require(every > spanLen,
      s"spans must stay disjoint: need every > spanLen, got $every <= $spanLen")
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val starts = toks
      .filter((col("__pos") + col(idCol)) % every === 0)
      .withColumn("__k",
        row_number().over(Window.partitionBy(idCol).orderBy("__pos")) - 1)
    val covered = starts.select(col(idCol).as("__cid"), col("__k"),
      explode(sequence(col("__pos"), col("__pos") + lit(spanLen - 1)))
        .as("__cov"))
    // tokens inside spans (clipping happens here: positions past the
    // tail simply match nothing)
    val spanToks = toks.join(covered,
        toks(idCol) === covered("__cid") && toks("__pos") === covered("__cov"))
      .select(toks(idCol), col("__k"), col("__pos"), col("__tok"))
    val spanText = spanToks.groupBy(col(idCol), col("__k"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__pos"), col("__tok")))),
        s => s.getField("__tok"))).as("__stext"),
        count(lit(1)).as("__slen"))
    val targets = spanText.groupBy(idCol)
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__k"),
            concat(lit("<extra_id_"), col("__k").cast("string"), lit("> "),
              col("__stext")).as("__part")))),
          s => s.getField("__part"))).as("targets"),
        count(lit(1)).as("n_spans"),
        sum(col("__slen")).cast("long").as("n_masked"))
    val kept = toks.join(covered,
      toks(idCol) === covered("__cid") && toks("__pos") === covered("__cov"),
      "left_anti")
    val sentinels = starts.select(col(idCol), col("__pos"),
      concat(lit("<extra_id_"), col("__k").cast("string"), lit(">"))
        .as("__tok"))
    val corrupted = kept.select(col(idCol), col("__pos"), col("__tok"))
      .union(sentinels)
      .groupBy(idCol)
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__pos"), col("__tok")))),
        s => s.getField("__tok"))).as("corrupted"))
    docs.select(col(idCol), col(textCol))
      .join(corrupted, Seq(idCol), "left")
      .join(targets, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("corrupted"), lit("")).as("corrupted"),
        coalesce(col("targets"), lit("")).as("targets"),
        coalesce(col("n_spans"), lit(0L)).cast("long").as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).cast("long").as("n_masked"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle") —
    * the code-model data prep: a deterministic fraction of documents
    * is split character-wise into prefix|middle|suffix and re-emitted
    * with the middle moved to the end, so a left-to-right model learns
    * infilling.  Both canonical orderings are produced (PSM
    * `<PRE>p<SUF>s<MID>m`, SPM `<SUF>s<PRE>p<MID>m`), chosen per doc.
    *
    * Everything is hash-arithmetic on the doc id — selection, both
    * split points, the format bit — so re-running the job reproduces
    * byte-identical examples (the [[spanCorrupt]] determinism
    * contract) and an oracle can replay the exact rule.
    *
    * Scale shape: a PURE per-row projection — three substrings and a
    * concat, no explode, no shuffle, whole-stage codegen end to end.
    *
    * @return (idCol, format 'plain'|'psm'|'spm', fim_text); documents
    *         shorter than 2 chars, with a NULL text, or not selected
    *         pass through as 'plain'.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      ratePpm: Long = 500000L, seed: Long = 0L): DataFrame = {
    require(ratePpm >= 0L && ratePpm <= 1000000L,
      s"ratePpm out of range: $ratePpm")
    docs
      .select(col(idCol), col(textCol).as("__t"))
      .withColumn("__len", length(col("__t")))
      // coalesce: a NULL text makes __len (and so the conjunction)
      // NULL, which must read as not-selected — otherwise the row
      // falls past the !__sel branch below and is mislabelled
      // psm/spm with a null fim_text instead of passing through.
      .withColumn("__sel",
        coalesce(pmod(col(idCol) * lit(2654435761L) + lit(seed),
          lit(1000000L)) < ratePpm && col("__len") >= 2, lit(false)))
      // split points: p1 uniform in [0, len], p2 uniform in [p1, len]
      .withColumn("__p1", pmod(col(idCol) * 31L + 7L, col("__len") + 1L))
      .withColumn("__p2",
        col("__p1") + pmod(col(idCol) * 17L + 3L,
          col("__len") - col("__p1") + 1L))
      .withColumn("__pre", expr("substring(__t, 1, __p1)"))
      .withColumn("__mid", expr("substring(__t, __p1 + 1, __p2 - __p1)"))
      .withColumn("__suf", expr("substring(__t, __p2 + 1, __len - __p2)"))
      .select(col(idCol),
        when(!col("__sel"), lit("plain"))
          .when(pmod(col(idCol), lit(2L)) === 1L, lit("spm"))
          .otherwise(lit("psm")).as("format"),
        when(!col("__sel"), col("__t"))
          .when(pmod(col(idCol), lit(2L)) === 1L,
            concat(lit("<SUF>"), col("__suf"), lit("<PRE>"), col("__pre"),
              lit("<MID>"), col("__mid")))
          .otherwise(
            concat(lit("<PRE>"), col("__pre"), lit("<SUF>"), col("__suf"),
              lit("<MID>"), col("__mid"))).as("fim_text"))
  }
}
