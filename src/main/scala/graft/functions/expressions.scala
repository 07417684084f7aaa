package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths of the LLM-pipeline
  * operators (SURVEY.md §7 layer 3).  Each implements `doGenCode` so it
  * stays inside whole-stage codegen — the preference order the reference
  * itself demonstrates with its expression library
  * (`sql/catalyst/src/main/scala/.../expressions/hash.scala`,
  * `stringExpressions.scala`): a codegen'd Expression beats a Scala UDF.
  */

/** popcount(a ^ b) — Hamming distance between two 64-bit SimHash values.
  * Used by near-duplicate detection to compare signatures without
  * leaving codegen (a UDF here would box two Longs per comparison; at
  * 100 TB the candidate-pair stream is billions of rows).
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  // signatures are 64-bit longs by contract; an int or string sneaking
  // in must be an ANALYSIS error, not a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash of a UTF-8 string (base 31, 64-bit wrap).
  * Deterministic document fingerprint over normalized text; the 64-bit
  * wraparound is intentional (same recurrence as `java.lang.String
  * .hashCode` widened to 64 bits), cheap, and codegen-friendly.
  */
case class RollingHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = ctx.freshName("bytes")
    val h = ctx.freshName("h"); val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Custom table-generating function (UDTF path, §2.12): explodes a text
  * column into word n-grams with their 0-based position.  The same
  * `Generator` contract the reference's built-in explode/json_tuple use
  * (`sql/catalyst/src/main/scala/.../expressions/generators.scala:45`);
  * the analyzer's ExtractGenerator turns a Project over this expression
  * into a `Generate` node, so it composes with LATERAL VIEW in SQL and
  * plain `select` in the DataFrame API.  Generation is one row in, k
  * rows out with no intermediate array materialized per document —
  * at 100 TB the alternative (split → array column → posexplode) writes
  * every token list into the row buffer first.
  */
case class NGramsGenerator(text: Expression, n: Expression)
    extends Expression with Generator with CodegenFallback {
  // a non-string text column or a bad width is an ANALYSIS error, not a
  // runtime ClassCastException mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngrams text must be STRING, got ${text.dataType.sql}")
    else if (!n.foldable || !Seq[DataType](ByteType, ShortType,
        IntegerType, LongType).contains(n.dataType))
      TypeCheckResult.TypeCheckFailure("ngrams width must be an integral literal")
    else n.eval(null) match {
      case i: Int if i >= 1  => TypeCheckResult.TypeCheckSuccess
      case l: Long if l >= 1 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("ngrams width must be >= 1")
    }
  private lazy val width: Int = n.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"ngrams width: $other")
  }
  override def children: Seq[Expression] = Seq(text, n)
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val tokens = t.asInstanceOf[UTF8String].toString
        .split("\\s+").filter(_.nonEmpty)
      if (tokens.length < width) Nil
      else (0 to tokens.length - width).map { i =>
        InternalRow(i, UTF8String.fromString(
          tokens.slice(i, i + width).mkString(" ")))
      }
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}

/** Exact Jaccard similarity of two SORTED-DISTINCT int64 arrays via a
  * single two-pointer merge — |∩| counted in one pass, |∪| derived as
  * na + nb − |∩|.  The built-in composition
  * (`array_intersect` + `array_union` + two `size`s) allocates two
  * intermediate arrays and hashes both inputs per row; the refine step
  * of MinHash dedup evaluates this once per candidate pair, which at
  * 100 TB is the hot loop of the whole pipeline.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // both operands must be array<bigint> — anything else fails at
  // analysis, not as a mid-job ClassCastException.  Null SLOTS are
  // tolerated (a nullable source column makes Spark mark derived
  // arrays containsNull even when no null can occur) and are ignored
  // by the merge: a sorted-distinct SET has no null member.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted needs two array<bigint>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  private def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0; var ca = 0; var cb = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; ca += 1; cb += 1; i += 1; j += 1 }
        else if (x < y) { ca += 1; i += 1 }
        else { cb += 1; j += 1 }
      }
    }
    while (i < na) { if (!a.isNullAt(i)) ca += 1; i += 1 }
    while (j < nb) { if (!b.isNullAt(j)) cb += 1; j += 1 }
    val union = ca + cb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  // locals come from ctx.freshName: with non-nullable inputs
  // nullSafeCodeGen inlines the fragment unbraced, so fixed names would
  // collide when the expression appears twice in one codegen scope and
  // janino would reject the whole stage
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
    val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0, $ca = 0, $cb = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; continue; }
         |  if ($b.isNullAt($j)) { $j++; continue; }
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $ca++; $cb++; $i++; $j++; }
         |  else if ($x < $y) { $ca++; $i++; } else { $cb++; $j++; }
         |}
         |while ($i < $na) { if (!$a.isNullAt($i)) $ca++; $i++; }
         |while ($j < $nb) { if (!$b.isNullAt($j)) $cb++; $j++; }
         |int $union = $ca + $cb - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 2-D Morton (Z-order) code: interleaves the low 16 bits of two int
  * columns — x in the even result bits, y in the odd — via the classic
  * parallel bit-spread (4 shift-mask rounds per operand, no loop).
  * Sorting or range-partitioning a table by this code co-locates rows
  * that are close in BOTH dimensions, so multi-dimensional range
  * predicates touch few contiguous file ranges — the data-layout trick
  * behind Z-ordered lakehouse tables, expressed as an ordinary codegen
  * expression over stock Spark writes.  Key property (asserted in
  * LayoutSpec): any power-of-2-aligned tile is one CONTIGUOUS run of
  * the sorted order.
  */
case class InterleaveBits16(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton2 needs (int, int), got (${left.dataType.sql}, ${right.dataType.sql})")
  private def spread(v: Long): Long = {
    var s = v & 0xffffL
    s = (s | (s << 8)) & 0x00ff00ffL
    s = (s | (s << 4)) & 0x0f0f0f0fL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Int].toLong) |
      (spread(b.asInstanceOf[Int].toLong) << 1)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sx = ctx.freshName("sx"); val sy = ctx.freshName("sy")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""long $sx = ((long) $a) & 0xffffL;
         |$sx = ($sx | ($sx << 8)) & 0x00ff00ffL;
         |$sx = ($sx | ($sx << 4)) & 0x0f0f0f0fL;
         |$sx = ($sx | ($sx << 2)) & 0x33333333L;
         |$sx = ($sx | ($sx << 1)) & 0x55555555L;
         |long $sy = ((long) $b) & 0xffffL;
         |$sy = ($sy | ($sy << 8)) & 0x00ff00ffL;
         |$sy = ($sy | ($sy << 4)) & 0x0f0f0f0fL;
         |$sy = ($sy | ($sy << 2)) & 0x33333333L;
         |$sy = ($sy | ($sy << 1)) & 0x55555555L;
         |${ev.value} = $sx | ($sy << 1);
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 2-D Hilbert-curve index of two int columns at `bits` bits per
  * dimension (the canonical xy2d recursion: per level, quadrant digit
  * `(3·rx) XOR ry` plus a reflect-and-swap rotation).  Like the Morton
  * code ([[InterleaveBits16]]) this linearizes two dimensions for
  * range-partitioned write clustering, but the Hilbert curve has
  * strictly better locality — every consecutive pair of indexes is an
  * ADJACENT cell (unit Manhattan step, no Morton "jumps" across the
  * square), so file min/max boxes from a range partition are tighter
  * and 2-D predicates prune more files.  Inputs are masked to `bits`;
  * the index ranges over [0, 4^bits).
  *
  * Reference behavior: the reference has no space-filling-curve
  * expression at all (`sql/catalyst/.../expressions/mathExpressions
  * .scala` stops at scalar math); both curves here are the write-side
  * layout story its users would need an external tool for.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert2 needs (int, int), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = 1 << bits
    var x = a.asInstanceOf[Int] & (n - 1)
    var y = b.asInstanceOf[Int] & (n - 1)
    var d = 0L
    var s = n >>> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val x = ctx.freshName("x")
    val y = ctx.freshName("y"); val d = ctx.freshName("d")
    val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
    val ry = ctx.freshName("ry"); val t = ctx.freshName("t")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""int $n = 1 << $bits;
         |int $x = $a & ($n - 1);
         |int $y = $b & ($n - 1);
         |long $d = 0L;
         |for (int $s = $n >>> 1; $s > 0; $s >>>= 1) {
         |  int $rx = (($x & $s) > 0) ? 1 : 0;
         |  int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += (long) $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $n - 1 - $x; $y = $n - 1 - $y; }
         |    int $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float vectors, computed in double precision
  * with a single fused pass (dot, |a|², |b|² in one loop).  The
  * higher-order-function composition (`aggregate(zip_with(...))`)
  * allocates an intermediate array per row; this runs allocation-free
  * inside codegen — the difference between feasible and not on an
  * O(candidates × dim) ANN refine step.
  */
case class CosineSimilarityF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // the kernel reads raw float slots; feeding it array<double> (an easy
  // slip — Quantize and k-means cast to double arrays) would silently
  // reinterpret doubles as garbage floats, so reject it at analysis
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  private def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (NFC / NFD / NFKC / NFKD) of a string column —
  * the first step of any text-cleaning pipeline (the reference's fork
  * surfaces only Hive's lower/upper family; combining-mark and
  * compatibility folding have no Spark builtin at all).  Delegates to
  * `java.text.Normalizer` inside codegen; the form is a constructor
  * constant so the enum lookup is resolved once at plan time, not per
  * row.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unsupported normalization form: $form")
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires STRING, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash-LSH band buckets: from a document's 64-bit shingle
  * array, compute `bands` bucket keys directly — the k seeded minimum
  * hashes and the per-band bucket hash in ONE allocation-light pass,
  * bit-identical to the relational formulation
  * `min(xxhash64(lit(i), shingle))` + `xxhash64(lit(b), h_br ... )`
  * (same XXH64 seed chain, seed 42).
  *
  * Why an Expression: the explode + k-way min-aggregate formulation
  * shuffles and hash-aggregates tokens×k intermediate rows per
  * partition; this computes the same k mins in registers and emits
  * only the `bands` bucket longs per document — the LSH self-join's
  * input shrinks from k to `bands` values per doc and the
  * aggregation stage disappears entirely.  Per-seed initial states are
  * precomputed at plan time (they depend only on the seed index).
  * Empty shingle arrays yield NULL (the doc has no signature — same
  * contract as the aggregate formulation, where the group never
  * forms).  Shingle arrays must not contain null elements (they are
  * hashes by construction).
  */
case class MinHashBuckets(child: Expression, k: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  require(k >= 1 && bands >= 1 && rows >= 1 && bands * rows <= k,
    s"need bands*rows <= k, got k=$k bands=$bands rows=$rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_buckets requires ARRAY<BIGINT>, got ${other.sql}")
  }
  // xxhash64(lit(i), x) = XXH64.hashLong(x, XXH64.hashInt(i, 42)) —
  // the int-literal prefix collapses to a per-index initial state
  private lazy val seedInit: Array[Long] =
    Array.tabulate(k)(i => XXH64.hashInt(i, 42L))
  private lazy val bandInit: Array[Long] =
    Array.tabulate(bands)(b => XXH64.hashInt(b, 42L))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val x = arr.getLong(t)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(x, seedInit(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = bandInit(b)
      var r = 0
      while (r < rows) { h = XXH64.hashLong(mins(b * rows + r), h); r += 1 }
      buckets(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val seeds = ctx.addReferenceObj("minhashSeeds", seedInit, "long[]")
    val bseeds = ctx.addReferenceObj("minhashBandSeeds", bandInit, "long[]")
    val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
    val t = ctx.freshName("t"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val h = ctx.freshName("h")
    val bks = ctx.freshName("buckets"); val b = ctx.freshName("b")
    val r = ctx.freshName("r"); val hb = ctx.freshName("hb")
    nullSafeCodeGen(ctx, ev, a =>
      s"""int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $t = 0; $t < $n; $t++) {
         |    long $x = $a.getLong($t);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = $xxh.hashLong($x, $seeds[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  long[] $bks = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $hb = $bseeds[$b];
         |    for (int $r = 0; $r < $rows; $r++)
         |      $hb = $xxh.hashLong($mins[$b * $rows + $r], $hb);
         |    $bks[$b] = $hb;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($bks);
         |}
         |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 64-bit SimHash of a token array: xxhash64 each token (seed 42,
  * byte-identical to the built-in `xxhash64`), vote +1/−1 per bit, set
  * bit b in the result when its vote sum is positive — all in one pass
  * per row.  Replaces an explode → 64-column groupBy-sum pipeline: the
  * shuffle drops from 64 longs per document to the 8-byte signature,
  * and the token stream never leaves the scan stage.  NULL for a NULL
  * or empty token array (an empty document has no signature — same
  * contract as the aggregation formulation, where such docs vanish at
  * the explode); NULL array ELEMENTS are skipped.
  *
  * Reference behavior: near-dup signatures as one scan-side pass; cf.
  * the reference's hash expression library
  * (`sql/catalyst/.../expressions/hash.scala` XxHash64).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
    val t = ctx.freshName("t"); val b = ctx.freshName("b")
    val s = ctx.freshName("s"); val h = ctx.freshName("h")
    val sig = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, a =>
      s"""int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $votes = new int[64];
         |  for (int $t = 0; $t < $n; $t++) {
         |    if (!$a.isNullAt($t)) {
         |      UTF8String $s = $a.getUTF8String($t);
         |      long $h = $xxh.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |      for (int $b = 0; $b < 64; $b++) {
         |        if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |      }
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
         |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 1-bit (sign) sketch of an embedding: bit i of the result is set
  * exactly when element i of the array is >= 0 (first 64 dims; shorter
  * arrays leave high bits clear, NULL elements count as negative).
  * 64× compression per 64 dims, and Hamming distance between sketches
  * (popcount-xor, [[HammingDistance64]]) approximates angular distance
  * — the standard two-stage binary-ANN layout: band the sketch for
  * candidate generation, rerank survivors with exact cosine.
  *
  * Reference behavior: no binary-sketch kernel exists in the
  * reference's expression library (`sql/catalyst/.../expressions/`);
  * this is the scale path its users would hand-roll as 64 CASE WHENs.
  */
case class SignPack64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_pack64 requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }
  // lazy: child.dataType is only legal after resolution
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    var sig = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (x >= 0.0) sig |= (1L << i)
      }
      i += 1
    }
    sig
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
    val i = ctx.freshName("i"); val x = ctx.freshName("x")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a =>
      s"""int $n = java.lang.Math.min($a.numElements(), 64);
         |long $sig = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = (double) $a.$getter($i);
         |    if ($x >= 0.0) $sig |= (1L << $i);
         |  }
         |}
         |${ev.value} = $sig;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aho-Corasick automaton over a fixed pattern set — built once (per
  * plan on the driver, shipped to executors inside the codegen
  * reference array), then every row is matched in a single O(|text|)
  * pass regardless of pattern count.
  *
  * ASCII transitions (the overwhelming majority of blocklist text) use
  * a fully-resolved goto DFA (`delta[state][c]`, fail links folded in
  * at build time, BFS over the trie) — one array load per character,
  * no fail-chain walking at match time.  Characters >= 0x80 fall back
  * to the fail-chain walk over the trie's child maps, so non-ASCII
  * patterns and text remain correct, just not table-accelerated.
  * Output links are merged transitively at build (out(s) includes
  * out(fail(s))), so a match at state s reports every pattern ending
  * there without chain walking.
  */
final class AhoAutomaton(patternsIn: Array[String],
    denseLimit: Int = 16384) extends Serializable {
  private val patterns: Array[String] = patternsIn.distinct
  /** number of distinct patterns the automaton recognizes */
  val size: Int = patterns.length
  require(size > 0, "AhoAutomaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "AhoAutomaton: empty pattern")

  private val kids = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.HashMap.empty[Char, Int])
  private val ownOut = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Int])
  for ((p, id) <- patterns.zipWithIndex) {
    var s = 0
    for (c <- p) {
      s = kids(s).getOrElseUpdate(c, {
        kids += scala.collection.mutable.HashMap.empty[Char, Int]
        ownOut += scala.collection.mutable.ArrayBuffer.empty[Int]
        kids.length - 1
      })
    }
    ownOut(s) += id
  }
  private val nNodes = kids.length
  /** The dense ASCII DFA costs nodes × 128 ints (512 B/node), built on
    * the driver and shipped to every executor in the codegen reference
    * array — at the default cap of 16384 nodes that is ≤ 8 MB, right
    * for blocklists (tens of KB of patterns).  Past the cap every
    * transition takes the fail-chain path instead: bounded memory,
    * amortized O(1) per char, same answers — an unexpectedly large
    * foldable pattern list degrades gracefully rather than silently
    * allocating hundreds of MB per plan.
    */
  private val useDense = nNodes <= denseLimit
  private val fail = new Array[Int](nNodes)
  /** merged output pattern-ids per state (own ++ out(fail)) */
  private val out = new Array[Array[Int]](nNodes)
  /** resolved goto DFA for ASCII chars (only when [[useDense]]) */
  private val delta: Array[Array[Int]] =
    if (useDense) Array.ofDim[Int](nNodes, 128) else null
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    out(0) = ownOut(0).toArray
    if (useDense) {
      var c = 0
      while (c < 128) {
        delta(0)(c) = kids(0).getOrElse(c.toChar, 0)
        c += 1
      }
    }
    for ((_, ch) <- kids(0)) { fail(ch) = 0; queue += ch }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = (ownOut(s) ++ out(fail(s))).distinct.toArray
      if (useDense) {
        var cc = 0
        while (cc < 128) {
          delta(s)(cc) = kids(s).getOrElse(cc.toChar, delta(fail(s))(cc))
          cc += 1
        }
      }
      for ((ch, child) <- kids(s)) {
        // fail(child) = state reached from fail(s) on ch — the longest
        // proper suffix of path(s)+ch present in the trie (BFS order
        // guarantees fail(s)'s row is already resolved)
        fail(child) =
          if (useDense && ch < 128) delta(fail(s))(ch)
          else slowStep(fail(s), ch)
        queue += child
      }
    }
  }

  /** fail-chain transition for non-ASCII chars (and fail-link setup) */
  private def slowStep(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !kids(s).contains(c)) s = fail(s)
    kids(s).getOrElse(c, 0)
  }

  /** Number of DISTINCT patterns occurring as substrings of `text`.
    * Early-exits once every pattern has been seen.
    */
  def countDistinct(text: String): Int = {
    val seen = new java.util.BitSet(size)
    var found = 0
    var s = 0
    var i = 0
    val n = text.length
    while (i < n && found < size) {
      val c = text.charAt(i)
      s = if (useDense && c < 128) delta(s)(c) else slowStep(s, c)
      val o = out(s)
      var j = 0
      while (j < o.length) {
        if (!seen.get(o(j))) { seen.set(o(j)); found += 1 }
        j += 1
      }
      i += 1
    }
    found
  }
}

/** Multi-pattern blocklist matcher: how many DISTINCT terms of a fixed
  * pattern list occur as substrings of the text column.  The pattern
  * list must be a foldable ARRAY<STRING> — it compiles into a shared
  * Aho-Corasick automaton, so the text is scanned ONCE per row however
  * long the blocklist is.  The built-in alternative (`exists`/`filter`
  * over `contains`) rescans the text once per pattern: a C4-style
  * 400-term bad-words screen costs 400 passes per document there and
  * one pass here.  NULL text gives NULL; matching is case-sensitive
  * (normalize upstream with `lower`).
  *
  * Reference behavior: the reference's string-match expressions
  * (`sql/catalyst/.../expressions/regexpExpressions.scala:102` LIKE,
  * `stringExpressions.scala` Contains) are all single-pattern; it has
  * no shared multi-pattern automaton — this is the scale path for
  * blocklist screens the reference would run as P separate LIKEs.
  */
case class MultiMatchCount(text: Expression, patterns: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = patterns
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"multi_match_count text must be STRING, got ${text.dataType.sql}")
    patterns.dataType match {
      case ArrayType(StringType, _) if patterns.foldable =>
        val v = patterns.eval(null)
        if (v == null)
          return TypeCheckResult.TypeCheckFailure(
            "multi_match_count pattern list must not be NULL")
        val arr = v.asInstanceOf[ArrayData]
        if (arr.numElements() == 0)
          return TypeCheckResult.TypeCheckFailure(
            "multi_match_count pattern list must be non-empty")
        var i = 0
        while (i < arr.numElements()) {
          if (arr.isNullAt(i) || arr.getUTF8String(i).numBytes() == 0)
            return TypeCheckResult.TypeCheckFailure(
              "multi_match_count patterns must be non-null and non-empty")
          i += 1
        }
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "multi_match_count pattern list must be a literal (foldable)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_match_count patterns must be ARRAY<STRING>, got ${other.sql}")
    }
  }

  @transient private lazy val automaton: AhoAutomaton = {
    val arr = patterns.eval(null).asInstanceOf[ArrayData]
    new AhoAutomaton(Array.tabulate(arr.numElements())(
      i => arr.getUTF8String(i).toString))
  }

  override def nullSafeEval(t: Any, ps: Any): Any =
    automaton.countDistinct(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("ahoAutomaton", automaton,
      classOf[AhoAutomaton].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = $ac.countDistinct($t.toString());")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, patterns = newRight)
}

/** Greedy longest-match WordPiece segmentation — the APPLY half of
  * subword tokenization (the [[graft.ops.Bpe]] learner builds merges;
  * this encodes text against a finished vocabulary).  Input is a token
  * array (one word per element); output is the concatenated piece
  * array: each word is consumed left-to-right by the longest vocabulary
  * piece matching at the cursor — word-initial pieces match verbatim,
  * continuations match their `##`-stripped form — and a word with any
  * dead-end becomes the single `unk` piece (classic WordPiece
  * semantics, Devlin et al. 2019; the reference algorithm in the BERT
  * repo's tokenization.py).
  *
  * One expression call per ROW (the whole token array is segmented in
  * a single invocation), and codegen calls straight into [[encode]]
  * via a reference object — the expression stays inside whole-stage
  * codegen, with the vocabulary hashed ONCE per executor instead of a
  * per-row broadcast-join against a vocab table.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String) extends UnaryExpression {
  require(vocab.nonEmpty && vocab.size <= (1 << 20),
    s"vocab size out of range: ${vocab.size}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode needs array<string>, got ${t.sql}")
  }

  @transient private lazy val heads: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.iterator.filterNot(_.startsWith("##")).foreach(s.add)
    s
  }
  @transient private lazy val conts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.iterator.filter(_.startsWith("##")).map(_.substring(2))
      .filter(_.nonEmpty).foreach(s.add)
    s
  }
  @transient private lazy val maxHead: Int =
    vocab.iterator.filterNot(_.startsWith("##")).map(_.length)
      .foldLeft(1)(math.max)
  @transient private lazy val maxCont: Int =
    vocab.iterator.filter(_.startsWith("##")).map(_.length - 2)
      .foldLeft(1)(math.max)

  def encode(arr: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val word = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val w = arr.getUTF8String(t).toString
        word.clear()
        var i = 0
        var dead = w.isEmpty
        while (i < w.length && !dead) {
          val limit = math.min(w.length - i, if (i == 0) maxHead else maxCont)
          var j = limit
          var hit = -1
          while (j >= 1 && hit < 0) {
            val sub = w.substring(i, i + j)
            if (if (i == 0) heads.contains(sub) else conts.contains(sub)) hit = j
            j -= 1
          }
          if (hit < 0) dead = true
          else {
            word += UTF8String.fromString(
              if (i == 0) w.substring(i, i + hit)
              else "##" + w.substring(i, i + hit))
            i += hit
          }
        }
        if (dead) out += UTF8String.fromString(unk)
        else out ++= word
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpiece", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "wordpiece_encode"
}

/** Min-cost Viterbi segmentation of a word against a unigram piece
  * vocabulary — the inference kernel of SentencePiece's unigram LM
  * (Kudo 2018): each piece carries an integer micro-nat cost
  * (−log p · 10⁶) and the word splits into the piece sequence of
  * minimal total cost.  All DP arithmetic is integer, so the optimum
  * is engine- and partitioning-exact; cost ties break to the
  * lexicographically smallest piece sequence (space separates pieces
  * and sorts below every piece character, so prefix order survives
  * concatenation and the tie rule is DP-decomposable).
  *
  * Returns the pieces joined by single spaces; NULL when no
  * segmentation exists (a character outside the vocabulary).  One
  * expression call per word against an executor-resident cost map —
  * meant to run over the DISTINCT-word table (vocabulary-sized), not
  * the corpus.
  */
case class UnigramViterbi(child: Expression, vocab: Seq[String],
    costs: Seq[Long]) extends UnaryExpression {
  require(vocab.nonEmpty && vocab.size == costs.size,
    s"vocab/cost length mismatch: ${vocab.size} vs ${costs.size}")
  require(costs.forall(c => c >= 0 && c < (1L << 40)),
    "piece costs must be non-negative micro-nats")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_viterbi needs STRING, got ${child.dataType.sql}")

  @transient private lazy val cmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.iterator.zip(costs.iterator).foreach { case (p, c) =>
      val prev = m.get(p)
      if (prev == null || c < prev) m.put(p, c)
    }
    m
  }
  @transient private lazy val maxPiece: Int =
    vocab.iterator.map(_.length).foldLeft(1)(math.max)

  def segment(w: UTF8String): UTF8String = {
    val s = w.toString
    val n = s.length
    if (n == 0) return UTF8String.fromString("")
    val INF = Long.MaxValue
    val cost = Array.fill(n + 1)(INF)
    val path = new Array[String](n + 1)
    cost(0) = 0
    path(0) = ""
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        if (cost(i) != INF) {
          val c = cmap.get(s.substring(i, j))
          if (c != null) {
            val nc = cost(i) + c
            if (nc <= cost(j)) {
              val np = if (i == 0) s.substring(i, j)
                else path(i) + " " + s.substring(i, j)
              if (nc < cost(j) || np < path(j)) {
                cost(j) = nc
                path(j) = np
              }
            }
          }
        }
        i += 1
      }
      j += 1
    }
    if (cost(n) == INF) null else UTF8String.fromString(path(n))
  }

  override def nullSafeEval(v: Any): Any = segment(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.segment($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unigram_viterbi"
}

/** Length (in UTF-16 code units, ASCII = characters) of the common
  * prefix of two strings — the LCP kernel of suffix-array repeat
  * mining.  A pure per-pair scan bounded by the shorter operand; stays
  * in whole-stage codegen.
  */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"common_prefix_len needs two STRINGs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  def lcp(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString
    val sb = b.toString
    val n = math.min(sa.length, sb.length)
    var i = 0
    while (i < n && sa.charAt(i) == sb.charAt(i)) i += 1
    i.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("commonPrefixLen", this,
      classOf[CommonPrefixLen].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.lcp($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "common_prefix_len"
}

/** Exact longest-common-subsequence LENGTH of two token arrays — the
  * ROUGE-L kernel (Lin 2004: LCS-based recall/precision, order-aware
  * where the clipped n-gram overlap is not).  Classic two-row dynamic
  * program, O(|a|·|b|) time and O(|b|) space per row, entirely inside
  * whole-stage codegen via a reference-object call (the
  * [[CommonPrefixLen]] device).
  *
  * Scale contract: per-row cost is quadratic in token count, so both
  * sides must be bounded upstream (`slice` to a token cap — the gate
  * uses 16); a side longer than 4096 tokens fails LOUDLY rather than
  * silently burning 16M+ comparisons per row.  Null SLOTS match
  * nothing (a nullable source column marks derived arrays containsNull
  * even when no null occurs).
  */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lcs_len needs two array<string>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  def lcs(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n > 4096 || m > 4096)
      throw new IllegalArgumentException(
        s"lcs_len: token array longer than 4096 ($n x $m) — slice both " +
          "sides to a cap upstream (quadratic per-row DP)")
    if (n == 0 || m == 0) return 0L
    // no mutable state on the expression instance: plans are shared
    // across local-mode tasks, so the DP rows are per-call locals.
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ta = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      j = 1
      while (j <= m) {
        val tb = bs(j - 1)
        cur(j) =
          if (ta != null && tb != null && ta.equals(tb)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      cur(0) = 0
      i += 1
    }
    prev(m).toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lcsLen", this, classOf[LcsLen].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.lcs($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lcs_len"
}

/** Clipped multiset-intersection size of two token arrays:
  * `Σ_gram min(count_left(gram), count_right(gram))` — the per-pair
  * clipping kernel of BLEU / ROUGE-n ([[graft.ops.Eval.ngramOverlap]]).
  * Doing the clip INSIDE the row (candidate and reference grams live on
  * the same pair row) turns the metric's former O(corpus-grams)
  * (pair, n, gram) shuffle into a zero-shuffle scan + a maxN-row
  * aggregate.  One hash map of the right side per call — O(|a|+|b|)
  * time, O(|b|) transient memory, bounded by the pair's own length.
  * Null SLOTS match nothing.
  */
case class ClippedMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"clipped_match_count needs two array<string>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  def clipped(a: ArrayData, b: ArrayData): Long = {
    val nb = b.numElements()
    // per-call map, never expression state: plans are shared across
    // local-mode tasks.
    val counts =
      new java.util.HashMap[UTF8String, java.lang.Integer](nb * 2)
    var j = 0
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val t = b.getUTF8String(j)
        val c = counts.get(t)
        counts.put(t, if (c == null) 1 else c.intValue() + 1)
      }
      j += 1
    }
    val na = a.numElements()
    var m = 0L
    var i = 0
    while (i < na) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        val c = counts.get(t)
        if (c != null && c.intValue() > 0) {
          m += 1L
          counts.put(t, c.intValue() - 1)
        }
      }
      i += 1
    }
    m
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    clipped(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clippedMatchCount", this,
      classOf[ClippedMatchCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.clipped($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "clipped_match_count"
}

/** `bloom_probe(bucket BIGINT, bf BINARY, v BIGINT) -> BOOLEAN` —
  * probe a PER-ROW bloom filter binary (Spark's own
  * `BloomFilterMightContain` requires the filter side to be a foldable
  * or scalar-subquery expression, so a bucketed bloom INDEX joined
  * onto the probe stream cannot use it).  The bucket id keys a
  * one-entry deserialization cache: rows clustered by bucket (the
  * two-level incremental-dedup op sorts within partitions) deserialize
  * each bucket's filter once per task instead of once per row.  The
  * cache is an identity-keyed perf layer only — a cold probe is just a
  * deserialize-then-probe, so interpreted/invariance sweeps stay
  * byte-identical.
  */
case class BloomProbe(bucket: Expression, bf: Expression, value: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = bucket
  override def second: Expression = bf
  override def third: Expression = value
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (bucket.dataType == LongType && bf.dataType == BinaryType &&
        value.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires (BIGINT, BINARY, BIGINT), got " +
        s"(${bucket.dataType.sql}, ${bf.dataType.sql}, ${value.dataType.sql})")

  // per-instance single-entry cache (task-local after codegen/copy;
  // interpreted instances may re-deserialize — correctness-neutral)
  @transient private lazy val cache: Array[AnyRef] =
    Array[AnyRef](java.lang.Long.valueOf(java.lang.Long.MIN_VALUE), null)

  override def nullSafeEval(bk: Any, filterBytes: Any, v: Any): Any =
    BloomProbe.probe(cache, bk.asInstanceOf[Long],
      filterBytes.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheVar = ctx.addMutableState("java.lang.Object[]", "bloomProbeCache",
      v => s"""$v = new java.lang.Object[]{
              |  java.lang.Long.valueOf(java.lang.Long.MIN_VALUE), null};""".stripMargin)
    nullSafeCodeGen(ctx, ev, (bk, f, v) =>
      s"${ev.value} = graft.functions.BloomProbe.probe($cacheVar, $bk, $f, $v);")
  }
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(bucket = newFirst, bf = newSecond, value = newThird)
  override def prettyName: String = "bloom_probe"
}

object BloomProbe {
  /** Deserialize-once-per-bucket probe; `cache` = [lastBucket, filter]. */
  def probe(cache: Array[AnyRef], bucket: Long, bytes: Array[Byte],
      v: Long): Boolean = {
    if (cache(1) == null ||
        cache(0).asInstanceOf[java.lang.Long].longValue() != bucket) {
      cache(1) = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cache(0) = java.lang.Long.valueOf(bucket)
    }
    cache(1).asInstanceOf[org.apache.spark.util.sketch.BloomFilter]
      .mightContainLong(v)
  }
}
