package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level wrappers for graft's native Catalyst expressions. */
package object functions {
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  /** Register the Point2D extension type (idempotent; UDTRegistration
    * keeps a process-global map, double-registering the same pair is a
    * no-op but a WARN, so guard on exists).
    */
  def registerPointUdt(): Unit = {
    val cls = classOf[Point2D].getName
    if (!org.apache.spark.sql.types.UDTRegistration.exists(cls))
      org.apache.spark.sql.types.UDTRegistration.register(
        cls, classOf[Point2DUDT].getName)
  }

  /** popcount(a ^ b) over two int64 columns. */
  def hamming64(a: Column, b: Column): Column =
    toCol(HammingDistance64(toExpr(a), toExpr(b)))

  /** 64-bit polynomial rolling hash of a string column. */
  def rolling_hash64(c: Column): Column =
    toCol(RollingHash64(toExpr(c)))

  /** Exact Jaccard of two sorted-distinct array<bigint> columns. */
  def jaccard_sorted(a: Column, b: Column): Column =
    toCol(JaccardSorted(toExpr(a), toExpr(b)))

  /** Cosine similarity of two array<float> columns (double result). */
  def cosine_sim(a: Column, b: Column): Column =
    toCol(CosineSimilarityF(toExpr(a), toExpr(b)))

  /** 2-D Morton (Z-order) code of two int columns' low 16 bits. */
  def morton2(x: Column, y: Column): Column =
    toCol(InterleaveBits16(toExpr(x), toExpr(y)))

  /** 2-D Hilbert index of two int columns at `bits` bits/dim. */
  def hilbert2(x: Column, y: Column, bits: Int = 16): Column =
    toCol(HilbertIndex2D(toExpr(x), toExpr(y), bits))

  /** Generator: word n-grams of a text column as (pos, ngram) rows. */
  def ngrams(text: Column, n: Int): Column =
    toCol(NGramsGenerator(toExpr(text),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column. */
  def unicode_normalize(c: Column, form: String): Column =
    toCol(UnicodeNormalize(toExpr(c), form))

  /** Fused MinHash-LSH band buckets of a shingle array<bigint>. */
  def minhash_buckets(sh: Column, k: Int, bands: Int, rows: Int): Column =
    toCol(MinHashBuckets(toExpr(sh), k, bands, rows))

  /** Fused 64-bit SimHash of a token array<string>. */
  def simhash64(toks: Column): Column =
    toCol(SimHash64(toExpr(toks)))

  /** 64-bit sign sketch of an array<float>/array<double> column. */
  def sign_pack64(vec: Column): Column =
    toCol(SignPack64(toExpr(vec)))

  /** Distinct blocklist terms present in a string column (one
    * Aho-Corasick pass however many patterns).
    */
  def multi_match_count(text: Column, patterns: Seq[String]): Column =
    toCol(MultiMatchCount(toExpr(text),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        patterns, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false))))

  /** Greedy longest-match WordPiece pieces of a token-array column. */
  def wordpiece_encode(toks: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    toCol(WordPieceEncode(toExpr(toks), vocab, unk))

  /** Common-prefix length of two string columns (the LCP kernel). */
  def common_prefix_len(a: Column, b: Column): Column =
    toCol(CommonPrefixLen(toExpr(a), toExpr(b)))

  /** Exact LCS length of two token-array columns (the ROUGE-L
    * kernel); both sides must be capped upstream (quadratic DP).
    */
  def lcs_len(a: Column, b: Column): Column =
    toCol(LcsLen(toExpr(a), toExpr(b)))

  /** Clipped multiset-intersection size of two token-array columns
    * (the per-pair BLEU/ROUGE-n clipping kernel).
    */
  def clipped_match_count(a: Column, b: Column): Column =
    toCol(ClippedMatchCount(toExpr(a), toExpr(b)))

  /** Min-cost unigram-LM (Viterbi) segmentation of a word column
    * against integer micro-nat piece costs; NULL when unsegmentable.
    */
  def unigram_viterbi(word: Column, vocab: Seq[String],
      costs: Seq[Long]): Column =
    toCol(UnigramViterbi(toExpr(word), vocab, costs))
}
