package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric int8 per-vector scaling.
  *
  * At 100 TB an Array[Float] embedding column is often the largest
  * column in the table; int8 quantization cuts it 4× (plus a double
  * scale per vector) at a small recall cost, and the quantized dot
  * product stays a cheap integer kernel.  Pure column expressions —
  * quantize/dequantize/score all stay in codegen.
  */
object Quantize {

  /** Codes for one vector given its precomputed scale COLUMN (pass an
    * attribute, not an expression — lambda capture re-evaluates
    * expressions per element; see Dedup.shinglesFromTokens).
    */
  private def codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0, lit(0).cast("byte"))
        .otherwise(round(x.cast("double") / scale).cast("byte")))

  /** max|x| / 127 (0 for all-zero vectors). */
  def scaleOf(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x.cast("double"))))
    when(maxAbs > 0, maxAbs / 127.0).otherwise(lit(0.0))
  }

  /** Attach a quantized (scale, codes) struct column.  Two-step
    * projection so the scale is materialized once per row, not once
    * per element inside the codes lambda.
    */
  def withQuantized(df: DataFrame, vecCol: String,
      outCol: String = "embedding_q8"): DataFrame =
    df.withColumn("__q_scale", scaleOf(col(vecCol)))
      .withColumn(outCol, struct(
        col("__q_scale").as("scale"),
        codes(col(vecCol), col("__q_scale")).as("codes")))
      .drop("__q_scale")

  /** Reconstruct approximate floats from a quantized struct. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => (c.cast("double") * q.getField("scale")).cast("float"))

  /** Approximate cosine from two quantized structs: integer dot over
    * code arrays; the per-vector scales cancel in cosine.
    */
  def cosineQuantized(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a.getField("codes"), b.getField("codes"),
        (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double")
    val na = aggregate(transform(a.getField("codes"),
      x => x.cast("long") * x.cast("long")), lit(0L), (acc, v) => acc + v)
      .cast("double")
    val nb = aggregate(transform(b.getField("codes"),
      x => x.cast("long") * x.cast("long")), lit(0L), (acc, v) => acc + v)
      .cast("double")
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (sqrt(na) * sqrt(nb)))
  }
}
