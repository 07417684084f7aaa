package graft

import org.apache.spark.sql.functions._

import graft.functions.{Point2D, Point2DUDT}

/** A row type carrying the extension type as plain fields — the
  * encoder must resolve Point2D through UDTRegistration (top-level so
  * product-encoder derivation sees a stable class).
  */
case class UdtTrip(id: Long, origin: Point2D, dest: Point2D)

/** Extension-type (UDT) surface, SURVEY §1.2: registration via
  * UDTRegistration (reference `types/UserDefinedType.scala`), parquet
  * round-trip as the UDT's sqlType, typed Dataset computation on the
  * user class, and a column-lineage edge through the UDT column.
  */
class UdtSpec extends SparkSpec {

  test("UDTRegistration + parquet round-trip + typed query + lineage edge") {
    graft.functions.registerPointUdt()
    import spark.implicits._

    val trips = (1L to 100L).map { i =>
      UdtTrip(i, new Point2D(i.toDouble, (i % 7).toDouble),
        new Point2D((i % 11).toDouble, i.toDouble / 2))
    }
    val ds = spark.createDataset(trips)
    // the logical schema is the UDT itself, not its struct sqlType
    assert(ds.schema("origin").dataType.isInstanceOf[Point2DUDT],
      s"encoder must map Point2D through the registered UDT, " +
        s"got ${ds.schema("origin").dataType}")

    val tmp = TmpCleanup.tempDir("graft_udt_rt")
    ds.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    // parquet carries the UDT annotation in the file footer metadata,
    // so the read side restores the extension type without a hint
    assert(back.schema("origin").dataType.isInstanceOf[Point2DUDT],
      s"parquet round-trip must restore the UDT, " +
        s"got ${back.schema("origin").dataType}")

    // typed computation on the user class after the round-trip
    val typedSum = back.as[UdtTrip]
      .map(t => t.origin.dist(t.dest))
      .reduce(_ + _)
    val expected = trips.map(t => t.origin.dist(t.dest)).sum
    assert(math.abs(typedSum - expected) < 1e-9,
      s"typed distance sum $typedSum != $expected")

    // round-trip is value-exact (doubles written/read bit-identically)
    val backTrips = back.as[UdtTrip].collect().sortBy(_.id).toSeq
    assert(backTrips == trips, "round-tripped rows differ")

    // lineage: an output derived from the UDT column traces to the
    // parquet source column `origin`
    val q = back.select(col("id"), col("origin").as("o"))
    val g = graft.lineage.ColumnLineage.of(q)
    val srcs = g("o")
    assert(srcs.exists(_.column == "origin"),
      s"lineage of the UDT output must reach source column origin: $srcs")

    // SQL path sees the UDT column too (catalogString is the udt name)
    q.createOrReplaceTempView("udt_trips")
    val n = spark.sql("SELECT count(*) AS n FROM udt_trips WHERE o IS NOT NULL")
      .head().getLong(0)
    assert(n == 100L)
  }
}
