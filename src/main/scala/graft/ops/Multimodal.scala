package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed by batched per-partition
  * pipelines.
  *
  * The Spark-side machinery (schema, partition-sized batching, codec
  * dispatch, feature schema) is real and tested; the actual media codec
  * is STUBBED with a deterministic fake (this container has no
  * image/audio libraries).  Swap `decodeStub` for a real decoder —
  * nothing else changes.
  *
  * Scale notes: decode work is per-row and CPU-heavy, so the operator
  * repartitions by a hash of the id to spread skew (one giant video per
  * partition otherwise serializes a whole executor), and mapPartitions
  * amortizes codec init per partition, the same shape mapInPandas gives
  * Python pipelines.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Deterministic fake features standing in for a real decode:
    * byte histogram moments + payload digest. Replace with a codec call.
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      digest: String, mean_byte: Double, frames_sampled: Int)

  /** Wrap a text table as fake media rows (payload = UTF-8 bytes) so the
    * pipeline has real binary data to move; in production this column
    * comes straight from parquet `binary`.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment: id mod 3
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** STUB decode: a real implementation would parse the codec here.
    * This fake is deterministic in the payload bytes only.
    */
  private def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.content
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    // "frame sampling": every 1024th byte counts as a frame
    val frames = 1 + bytes.length / 1024
    MediaFeatures(rec.media_id, rec.kind, bytes.length.toLong, digest,
      math.rint(mean * 1e6) / 1e6, frames)
  }

  /** Batched feature extraction: repartition for skew, decode per
    * partition (codec init amortized), return a typed Dataset.
    */
  def extractFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds = media.as[MediaRecord]
    val repart = if (partitions > 0) ds.repartition(partitions, col("media_id")) else ds
    repart.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.map(decodeStub)
    }
  }

  /** One sampled frame: fixed-size byte window of the payload.  Only
    * the digest and length leave the executor — frames never ship as
    * raw bytes past the operator that consumes them.
    */
  case class Frame(media_id: Long, frame_idx: Int, n_frame_bytes: Int,
      frame_digest: String)

  /** Frame sampling STUB: a real video codec would seek keyframes; the
    * fake emits consecutive `frameBytes`-sized windows (every payload
    * gets >= 1 frame, a zero-length one when empty).  Structurally this
    * is the generator shape — one media row fans out to k frame rows
    * with no intermediate array materialized per record.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].flatMap { rec =>
      val n = rec.content.length
      val k = math.max(1, (n + frameBytes - 1) / frameBytes)
      (0 until k).iterator.map { i =>
        val from = i * frameBytes
        val until = math.min(n, from + frameBytes)
        val slice = java.util.Arrays.copyOfRange(rec.content, from, until)
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(slice).map("%02x".format(_)).mkString
        Frame(rec.media_id, i, until - from, digest)
      }
    }
  }

  /** Video near-duplicate pairs via frame-signature Jaccard: sample
    * frames ([[sampleFrames]] — swap in keyframe extraction + a real
    * perceptual hash for production), collapse each video to its
    * DISTINCT frame-hash set, and score candidate pairs with the
    * two-pointer [[graft.functions.jaccard_sorted]] kernel.
    *
    * Candidate generation is an inverted-index equi-join on the frame
    * hash — two videos pair iff they share at least one frame, which is
    * COMPLETE for any Jaccard > 0 (no quadratic video×video join).
    * The usual inverted-index caveat applies: a frame shared by many
    * videos (intros, black frames) makes its posting quadratic —
    * production drops hashes with document frequency above a cap the
    * way BM25 drops stopwords; the refine joins carry only (id, id)
    * pairs plus the per-video hash arrays.
    */
  def videoNearDupPairs(media: DataFrame, frameBytes: Int = 64,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.jaccard_sorted
    val fr = sampleFrames(media.filter(col("kind") === "video"), frameBytes)
      .toDF()
      .select(col("media_id"), xxhash64(col("frame_digest")).as("__h"))
      .distinct()
    val sets = fr.groupBy(col("media_id"))
      .agg(sort_array(collect_set(col("__h"))).as("__fh"))
    val cand = fr.select(col("media_id").as("id_a"), col("__h"))
      .join(fr.select(col("media_id").as("id_b"), col("__h")), Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sets.select(col("media_id").as("id_a"), col("__fh").as("__fa")),
        Seq("id_a"))
      .join(sets.select(col("media_id").as("id_b"), col("__fh").as("__fb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard_sorted(col("__fa"), col("__fb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit perceptual average-hash over the stubbed decode: payload
    * bytes deal round-robin into a 60-cell "pixel" grid (a real decoder
    * would downsample an 8×8 thumbnail — the banding math, not the
    * grid size, is the point; 60 bits split into four clean 15-bit
    * bands and never touch the sign bit), a grid cell's bit is 1 when
    * its sum exceeds the grid average
    * (integer cross-multiplied: `cell·n_cells > total`, no division),
    * and the bits pack into one long via `bit_or`.  Fully RELATIONAL —
    * per-character explode, one (id, cell) aggregation, one
    * ≤60-row-per-image pack —
    * so unlike the mapPartitions codec path it is oracle-checkable
    * end-to-end, and the aHash robustness property holds: small
    * payload edits flip few bits.
    *
    * @return (idCol, ahash)
    */
  def imageAHash64(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val chars = docs
      .select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col(idCol),
        posexplode(split(col("__t"), "(?!^)")).as(Seq("__p", "__c")))
      .filter(col("__c") =!= "")
    val cells = chars
      .groupBy(col(idCol), pmod(col("__p"), lit(60)).as("__cell"))
      .agg(sum(ascii(col("__c"))).as("__v"))
    val tot = cells.groupBy(col(idCol))
      .agg(sum(col("__v")).as("__tot"), count(lit(1)).as("__nc"))
    cells.join(tot, Seq(idCol))
      .select(col(idCol),
        when(col("__v") * col("__nc") > col("__tot"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(__cell AS INT))"))
          .otherwise(0L).as("__bit"))
      .groupBy(col(idCol))
      .agg(expr("bit_or(__bit)").cast("long").as("ahash"))
  }

  /** Perceptual near-duplicate image pairs: aHash within `maxHamming`
    * bits, candidates from 10×6-bit band buckets.  Pigeonhole makes
    * the candidate set COMPLETE for maxHamming ≤ 9: at most 9
    * differing bits cannot touch all 10 bands, so every qualifying
    * pair shares at least one identical band bucket — a bucket
    * equi-join, never all-pairs.  (Narrower bands = more bands =
    * higher completeness budget but weaker per-band pruning; the
    * standard multi-index Hamming trade.)
    *
    * @return (id_a, id_b, hamming) with id_a < id_b
    */
  def imageNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 9,
      s"10 pigeonhole bands cover maxHamming <= 9, got $maxHamming")
    val hashed = imageAHash64(docs, idCol, textCol)
      .select(col(idCol).as("__id"), col("ahash"))
    val banded = hashed.select(col("__id"), col("ahash"),
        explode(array((0 until 10).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("ahash"), b * 6).bitwiseAND(lit(0x3FL))
              .as("bucket"))): _*)).as("bb"))
      .select(col("__id"), col("ahash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"),
      col("__id").as("id_a"), col("ahash").as("__ha"))
    val r = banded.select(col("band"), col("bucket"),
      col("__id").as("id_b"), col("ahash").as("__hb"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.hamming64(col("__ha"), col("__hb"))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Resize STUB: a real implementation re-encodes pixels; the fake
    * keeps every stride-th byte so the payload shrinks proportionally
    * and deterministically.  Metadata (width/height) updates to the
    * target box; all other columns pass through.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].map { rec =>
      val stride = math.max(1,
        math.ceil(rec.width.toDouble / math.max(1, targetW)).toInt)
      val resized = rec.content.indices.collect {
        case i if i % stride == 0 => rec.content(i)
      }.toArray
      rec.copy(content = resized,
        width = math.min(rec.width, targetW), height = math.min(rec.height, targetH))
    }.toDF()
  }
}
