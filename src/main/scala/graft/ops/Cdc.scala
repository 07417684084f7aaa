package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (the Rabin/FastCDC storage-dedup
  * substrate): a chunk boundary falls wherever the rolling hash of the
  * trailing `w` characters hits 0 modulo 2^maskBits, so chunk edges
  * follow CONTENT, not offsets — an insertion early in a document
  * shifts every byte but re-synchronizes the chunking within one
  * chunk, which is what makes chunk-level dedup survive edits (the
  * property fixed-size blocks lack, and the reason incremental crawl
  * stores and training-data caches chunk this way).
  *
  * Everything is engine-exact integer arithmetic: the rolling hash is
  * the repo's base-31 polynomial mod 2³¹ over codepoints (the
  * winnowing convention), boundaries are `h % 2^maskBits == 0`
  * (expected chunk length 2^maskBits), and chunk identity is the same
  * polynomial over the chunk's characters.
  *
  * Scale shape: ONE explode to character rows; the rolling hash folds
  * a `w`-bounded collected window per row (never the document string
  * per row — carrying the text through the position explode would
  * materialize O(len²) bytes); chunk ids are a cumulative boundary
  * count per document (document-length-bounded window, the span-ops
  * contract); chunk hashes fold sorted per-chunk character lists
  * bounded by the chunk size.  No stage shuffles more than the
  * character stream once.
  */
object Cdc {

  /** Per-chunk rows: (idCol, chunk_id, chunk_start, chunk_len,
    * chunk_hash), chunk_id 0-based in document order, chunk_start
    * 1-based.  Documents are truncated to `maxDocLen` first.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, maskBits: Int = 6, maxDocLen: Int = 2048): DataFrame = {
    require(w >= 2 && maskBits >= 2 && maskBits <= 20 && maxDocLen >= w)
    val mask = 1L << maskBits
    val chars = docs
      .select(col(idCol).as("__d"),
        substring(col(textCol), 1, maxDocLen).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col("__d"),
        posexplode(split(col("__t"), "(?!^)")).as(Seq("__p0", "__c")))
      // the (?!^) lookahead also splits at end-of-string, appending one
      // empty element per document — drop it or every doc gains a
      // phantom character
      .filter(col("__c") =!= "")
      .select(col("__d"), (col("__p0") + 1).as("__p"), col("__c"))
    val wWin = Window.partitionBy(col("__d")).orderBy(col("__p"))
      .rowsBetween(-(w - 1), 0)
    val rolled = chars
      .withColumn("__win", collect_list(col("__c")).over(wWin))
      .withColumn("__h", aggregate(col("__win"), lit(0L),
        (acc, c) => (acc * 31 + ascii(c)) % lit(2147483648L)))
      .withColumn("__b",
        when(col("__p") >= w && pmod(col("__h"), lit(mask)) === 0, 1L)
          .otherwise(0L))
    val cumWin = Window.partitionBy(col("__d")).orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rolled
      .withColumn("__chunk", coalesce(sum(col("__b")).over(cumWin), lit(0L)))
      .groupBy(col("__d"), col("__chunk"))
      .agg(min(col("__p")).cast("long").as("chunk_start"),
        count(lit(1)).as("chunk_len"),
        aggregate(
          transform(array_sort(collect_list(struct(col("__p"), col("__c")))),
            s => s.getField("__c")),
          lit(0L),
          (acc, c) => (acc * 31 + ascii(c)) % lit(2147483648L))
          .as("chunk_hash"))
      .select(col("__d").as(idCol), col("__chunk").as("chunk_id"),
        col("chunk_start"), col("chunk_len"), col("chunk_hash"))
  }

  /** Corpus-level dedup summary over the content-defined chunks: how
    * much storage chunk-level dedup saves.  One row:
    * (n_chunks, n_distinct, chars_total, chars_unique,
    * dup_ratio_micro).
    */
  def dedupSummary(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, maskBits: Int = 6, maxDocLen: Int = 2048): DataFrame = {
    val ch = chunks(docs, idCol, textCol, w, maskBits, maxDocLen)
    val distinct = ch.groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(count(lit(1)).as("__n"))
    val a = ch.agg(count(lit(1)).as("n_chunks"),
      sum(col("chunk_len")).as("chars_total"))
    val b = distinct.agg(count(lit(1)).as("n_distinct"),
      sum(col("chunk_len")).as("chars_unique"))
    a.crossJoin(b).select(col("n_chunks"), col("n_distinct"),
      col("chars_total").cast("long").as("chars_total"),
      col("chars_unique").cast("long").as("chars_unique"),
      expr("(chars_total - chars_unique) * 1000000 div chars_total")
        .as("dup_ratio_micro"))
  }
}
