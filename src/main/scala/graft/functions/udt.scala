package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** EXTENSION TYPE (UDT): a user-space Scala class carried through the
  * engine as a first-class column type (reference analog: the
  * `UserDefinedType` / `UDTRegistration` machinery in
  * `sql/catalyst/.../types/UserDefinedType.scala` and the
  * `VectorUDT`-style registrations MLlib layers on it — SURVEY §1.2).
  *
  * `Point2D` is the user type; `Point2DUDT` maps it onto a two-double
  * struct so every storage/execution path (parquet round-trip, typed
  * Datasets, shuffles) sees plain Catalyst data while the user-facing
  * API sees the class.  Registered out-of-band via
  * `UDTRegistration.register`, the path for classes the user cannot
  * annotate — `graft.functions.registerPointUdt()` is idempotent.
  */
class Point2D(val x: Double, val y: Double) extends Serializable {
  def dist(o: Point2D): Double = math.hypot(x - o.x, y - o.y)
  override def equals(other: Any): Boolean = other match {
    case p: Point2D => p.x == x && p.y == y
    case _ => false
  }
  override def hashCode(): Int = (x, y).hashCode()
  override def toString: String = s"Point2D($x, $y)"
}

class Point2DUDT extends UserDefinedType[Point2D] {
  override def sqlType: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  override def serialize(p: Point2D): InternalRow =
    new GenericInternalRow(Array[Any](p.x, p.y))

  override def deserialize(datum: Any): Point2D = datum match {
    case r: InternalRow => new Point2D(r.getDouble(0), r.getDouble(1))
    case other => throw new IllegalArgumentException(
      s"Point2DUDT.deserialize expects InternalRow, got " +
        s"${if (other == null) "null" else other.getClass.getName}: $other")
  }

  override def userClass: Class[Point2D] = classOf[Point2D]

  override def typeName: String = "point2d"
}
