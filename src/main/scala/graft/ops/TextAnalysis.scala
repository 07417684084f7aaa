package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.rolling_hash64

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language identification, token counting, and document
  * fingerprinting.  All are narrow (per-row, no shuffle) column pipelines
  * built from codegen'd built-ins — at 100 TB each is a single pass over
  * the scan with full predicate/column pushdown intact.
  */
object TextAnalysis {

  /** Lowercased word tokens (runs of letters/digits/apostrophe). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9']+"), lit(0))

  /** Token count without materializing the token array downstream. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: whitespace tokens weighted by
    * ceil(len/4) — a deterministic proxy for tokenizer cost used to
    * budget training data (real BPE runs out-of-band).
    */
  def subwordEstimate(text: Column): Column =
    aggregate(
      transform(split(text, "\\s+"), w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Quality metrics struct: length, token stats, punctuation and
    * stopword ratios, plus a composite [0,1] score.  Everything is a
    * deterministic arithmetic pipeline — no UDFs, stays in codegen.
    */
  def qualityMetrics(text: Column): Column =
    // Bind the token array ONCE as a lambda variable: higher-order
    // functions are interpreted (no codegen, no subexpression
    // elimination), so every direct use of `tokens(text)` below would
    // re-run the tokenizer regex per use per row.  The 1-element
    // transform wrapper materializes it a single time.
    element_at(transform(array(tokens(text)),
      toks => qualityFromToks(text, toks)), 1)

  private[ops] def qualityFromToks(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val nPunct = nChar - length(regexp_replace(text, "[\\p{Punct}]", ""))
    val stop = array(Seq("the", "a", "of", "and", "to", "in", "is", "that",
      "it", "for").map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stop, t))).cast("double")
    val avgWordLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
      .otherwise(lit(0.0))
    val punctRatio = when(nChar > 0, nPunct / nChar).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(lit(0.0))
    // Composite: reward stopword presence (naturalness), penalize
    // punctuation soup and degenerate word lengths.
    val score = greatest(lit(0.0), least(lit(1.0),
      lit(0.5) + lit(0.5) * stopRatio - punctRatio -
        when(avgWordLen < 2 || avgWordLen > 12, 0.25).otherwise(0.0)))
    struct(
      nChar.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(avgWordLen, 6).as("avg_word_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(score, 6).as("quality_score"))
  }

  /** Stopword profiles for the n-gram-free language-ID heuristic.  Tiny
    * on purpose: broadcast as literals into codegen, no lookup table.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "you", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "pt" -> Seq("o", "a", "de", "e", "do", "da", "em", "um", "para", "com"))

  /** Heuristic language ID: argmax over per-language stopword hit ratios
    * with a deterministic tie-break (profile order), "und" when nothing
    * matches.  Pure column arithmetic → scales linearly.
    */
  def languageId(text: Column): Column =
    // Same bind-once trick as qualityMetrics: five per-language filters
    // over the SAME token array must not tokenize five times.
    element_at(transform(array(tokens(text)), toks => langIdFromToks(toks)), 1)

  private def langIdFromToks(toks: Column): Column = {
    val n = size(toks).cast("double")
    val scored = langProfiles.zipWithIndex.map { case ((lang, words), i) =>
      val hits = size(filter(toks,
        t => array_contains(array(words.map(lit): _*), t))).cast("double")
      val score = when(n > 0, hits / n).otherwise(lit(0.0))
      // encode (score, -index) so array_max picks highest score, then
      // earliest profile on ties
      struct(score.as("score"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: 64-bit rolling hash over whitespace-normalized
    * lowercase text (graft's codegen'd RollingHash64 expression).
    */
  def fingerprint(text: Column): Column =
    rolling_hash64(normalize(text))

  /** Canonical text normalization used by fingerprint + exact dedup:
    * lowercase, strip punctuation, collapse whitespace.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** PII categories as (label, regex), in application order.  Patterns
    * stay inside the Java-regex ∩ RE2 common subset so the DuckDB oracle
    * can mirror them verbatim.  SSN (3-2-4) is scrubbed before phone
    * (3-3-4) — the groupings are disjoint but the order is part of the
    * published contract; replacement tokens contain no digits, so later
    * patterns can never re-match inside an earlier redaction.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "ip"    -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b")

  /** Scrub PII in place: each category becomes an `<UPPERCASE>` token.
    * A fold of codegen'd regexp_replace calls — one projection, no
    * shuffle, linear in document bytes at any scale.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (label, pat)) =>
      regexp_replace(t, pat, s"<${label.toUpperCase}>")
    }

  /** Per-category PII hit counts over the ORIGINAL text (counts are
    * independent per pattern, not post-redaction residues).
    */
  def piiCounts(text: Column): Column =
    struct(piiPatterns.map { case (label, pat) =>
      regexp_count(text, lit(pat)).as(s"n_$label")
    }: _*)

  /** Writing-system ranges for script profiling — plain codepoint
    * classes (not \p{Script=} properties) so the same pattern text
    * means the same thing to Java regex AND RE2-family engines.
    */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "cjk" -> "[一-鿿]",
    "arabic" -> "[؀-ۿ]",
    "hangul" -> "[가-힯]",
    "devanagari" -> "[ऀ-ॿ]")

  /** Per-script character counts (struct of n_<script> ints) — the
    * mixed-script / wrong-script screen that runs BEFORE language ID
    * in a multilingual curation pipeline (lang-ID n-gram profiles are
    * meaningless on text whose dominant script contradicts them).
    * Pure counting expressions; one codegen projection, no shuffle.
    */
  def scriptMix(text: Column): Column =
    struct(scriptRanges.map { case (label, pat) =>
      regexp_count(text, lit(pat)).as(s"n_$label")
    }: _*)

  /** Per-document character Shannon entropy (nats) — the classic
    * gibberish/boilerplate screen: natural text sits in a narrow
    * entropy band, while base64 blobs / key dumps score high and
    * repeated-character padding scores near zero.
    *
    * Computed from the identity `H = ln(n) − (Σ cᵢ·ln cᵢ)/n` over the
    * per-(doc, char) counts, so the whole op is two partial-aggregated
    * groupBys — linear in corpus characters, no window, no driver
    * state.  The character explode is bounded by document bytes (the
    * same cost as any tokenize), and the second aggregate runs over
    * ≤ |alphabet| rows per doc.  Entropy is rounded to 4 decimals so
    * the value is engine-portable (libm ulp differences vanish).
    *
    * @return (idCol, n_chars, n_distinct_chars, entropy); docs with no
    *         characters are absent (no 0·ln 0 convention needed)
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df.select(col(idCol),
        explode(split(col(textCol), "")).as("__c"))
      .filter(length(col("__c")) === 1)
    val perChar = chars.groupBy(col(idCol), col("__c"))
      .agg(count(lit(1)).as("__cnt"))
    perChar.groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        round(log(sum(col("__cnt")).cast("double"))
          - sum(col("__cnt") * log(col("__cnt").cast("double")))
            / sum(col("__cnt")).cast("double"), 4).as("entropy"))
  }

  /** Flesch reading-ease report per group — the readability screen a
    * curation funnel runs next to [[qualityMetrics]] (very low scores
    * flag OCR noise / codey text, implausibly high ones flag
    * template spam).  `206.835 − 1.015·(W/S) − 84.6·(Y/W)` over the
    * group's EXACT integer totals: W = word tokens, S = sentence
    * marks (runs of `.!?`, clamped to ≥ 1 per doc), Y = syllable
    * proxy (runs of `aeiouy` — the standard vowel-group heuristic).
    *
    * Determinism: the three counts are exact integers from per-row
    * regex extraction (codegen, one pass, no shuffle before the
    * group agg); the score is one fixed IEEE expression over the
    * integer sums, rounded to 6 dp — engine- and
    * partitioning-identical.  Zero-token docs are excluded (a
    * documented contract: no words → no readability).
    *
    * @return (groupCol, n_docs, words, sentences, syllables, flesch)
    */
  def readability(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val w = size(tokens(col(textCol))).cast("long")
    val marks = size(regexp_extract_all(col(textCol),
      lit("[.!?]+"), lit(0))).cast("long")
    val y = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    df.select(col(groupCol), w.as("__w"),
        greatest(marks, lit(1L)).as("__s"), y.as("__y"))
      .filter(col("__w") > 0L)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).cast("long").as("words"),
        sum(col("__s")).cast("long").as("sentences"),
        sum(col("__y")).cast("long").as("syllables"))
      .select(col(groupCol), col("n_docs"), col("words"),
        col("sentences"), col("syllables"),
        round(lit(206.835d)
          - lit(1.015d) * col("words").cast("double")
            / col("sentences").cast("double")
          - lit(84.6d) * col("syllables").cast("double")
            / col("words").cast("double"), 6).as("flesch"))
  }

  /** Attach all text-analysis columns at once (single projection). */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("metrics", qualityMetrics(t))
      .withColumn("lang_pred", languageId(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordEstimate(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
