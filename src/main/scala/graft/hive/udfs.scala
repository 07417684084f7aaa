package graft.hive

import org.apache.hadoop.hive.ql.exec.UDF
import org.apache.hadoop.hive.ql.metadata.HiveException
import org.apache.hadoop.hive.ql.parse.SemanticException
import org.apache.hadoop.hive.ql.udf.generic.{AbstractGenericUDAFResolver, GenericUDAFEvaluator, GenericUDF, GenericUDTF}
import org.apache.hadoop.hive.ql.udf.generic.GenericUDAFEvaluator.{AbstractAggregationBuffer, AggregationBuffer, Mode}
import org.apache.hadoop.hive.serde2.objectinspector.{ObjectInspector, ObjectInspectorFactory, PrimitiveObjectInspector, StructObjectInspector}
import org.apache.hadoop.hive.serde2.objectinspector.primitive.{PrimitiveObjectInspectorFactory, PrimitiveObjectInspectorUtils}
import org.apache.hadoop.hive.serde2.typeinfo.TypeInfo
import org.apache.hadoop.io.LongWritable

/** Hive UDF bridge fixtures — one implementation of each Hive function
  * flavor the reference's bridge layer supports (reference
  * `sql/hive/src/main/scala/org/apache/spark/sql/hive/hiveUDFs.scala`:
  * HiveSimpleUDF:43, HiveGenericUDF:124, HiveUDAFFunction /
  * HiveGenericUDTF:307), registered through the metastore session via
  * `CREATE TEMPORARY FUNCTION name AS 'class'` and gated against DuckDB
  * equivalents in HiveQueries.
  */

/** Old-style simple UDF (reflection dispatch): square of a long. */
class GraftHiveSquare extends UDF {
  def evaluate(x: java.lang.Long): java.lang.Long =
    if (x == null) null else java.lang.Long.valueOf(x.longValue() * x.longValue())
}

/** GenericUDF (ObjectInspector dispatch): string reverse. */
class GraftHiveReverse extends GenericUDF {
  private var oi: PrimitiveObjectInspector = _

  override def initialize(args: Array[ObjectInspector]): ObjectInspector = {
    if (args.length != 1) throw new HiveException("graft_reverse takes 1 arg")
    oi = args(0).asInstanceOf[PrimitiveObjectInspector]
    PrimitiveObjectInspectorFactory.javaStringObjectInspector
  }

  override def evaluate(args: Array[GenericUDF.DeferredObject]): AnyRef = {
    val v = args(0).get()
    if (v == null) null
    else String.valueOf(oi.getPrimitiveJavaObject(v)).reverse
  }

  override def getDisplayString(children: Array[String]): String =
    s"graft_reverse(${children.mkString(", ")})"
}

/** GenericUDAF: sum of squares of a long column (partial-aggregatable —
  * the partial is itself a long, exercising PARTIAL1/FINAL merge).
  */
class GraftHiveSumSq extends AbstractGenericUDAFResolver {
  override def getEvaluator(info: Array[TypeInfo]): GenericUDAFEvaluator = {
    if (info.length != 1) throw new SemanticException("graft_sumsq takes 1 arg")
    new GraftHiveSumSqEvaluator
  }
}

class GraftHiveSumSqEvaluator extends GenericUDAFEvaluator {
  class SumBuf extends AbstractAggregationBuffer { var sum: Long = 0L }

  private var inputOI: PrimitiveObjectInspector = _
  private var isOriginalInput: Boolean = _

  override def init(m: Mode, parameters: Array[ObjectInspector]): ObjectInspector = {
    super.init(m, parameters)
    inputOI = parameters(0).asInstanceOf[PrimitiveObjectInspector]
    // PARTIAL1/COMPLETE see raw rows (square then add); PARTIAL2/FINAL
    // see partial sums (add as-is).  Both are longs here.
    isOriginalInput = m == Mode.PARTIAL1 || m == Mode.COMPLETE
    PrimitiveObjectInspectorFactory.writableLongObjectInspector
  }

  override def getNewAggregationBuffer: AggregationBuffer = new SumBuf

  override def reset(agg: AggregationBuffer): Unit =
    agg.asInstanceOf[SumBuf].sum = 0L

  override def iterate(agg: AggregationBuffer, parameters: Array[AnyRef]): Unit = {
    val v = parameters(0)
    if (v != null) {
      val x = PrimitiveObjectInspectorUtils.getLong(v, inputOI)
      agg.asInstanceOf[SumBuf].sum += x * x
    }
  }

  override def terminatePartial(agg: AggregationBuffer): AnyRef = terminate(agg)

  override def merge(agg: AggregationBuffer, partial: AnyRef): Unit =
    if (partial != null)
      agg.asInstanceOf[SumBuf].sum +=
        PrimitiveObjectInspectorUtils.getLong(partial, inputOI)

  override def terminate(agg: AggregationBuffer): AnyRef =
    new LongWritable(agg.asInstanceOf[SumBuf].sum)
}

/** GenericUDTF: explode a space-separated string into (word, wlen) rows. */
class GraftHiveSplitWords extends GenericUDTF {
  private var oi: PrimitiveObjectInspector = _

  override def initialize(argOIs: Array[ObjectInspector]): StructObjectInspector = {
    if (argOIs.length != 1) throw new HiveException("graft_split_words takes 1 arg")
    oi = argOIs(0).asInstanceOf[PrimitiveObjectInspector]
    ObjectInspectorFactory.getStandardStructObjectInspector(
      java.util.Arrays.asList("word", "wlen"),
      java.util.Arrays.asList[ObjectInspector](
        PrimitiveObjectInspectorFactory.javaStringObjectInspector,
        PrimitiveObjectInspectorFactory.javaIntObjectInspector))
  }

  override def process(args: Array[AnyRef]): Unit = {
    val v = args(0)
    if (v != null) {
      String.valueOf(oi.getPrimitiveJavaObject(v)).split(" ")
        .filter(_.nonEmpty)
        .foreach(w => forward(Array[AnyRef](w, Int.box(w.length))))
    }
  }

  override def close(): Unit = {}
}
