package graft.ops

import graft.SparkSpec

/** Golden-semantics tests for [[Scd2]] on a hand-checkable dimension. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, Long, Option[Long])*) =
    rows.map { case (k, a, f, t) => (k, a, f, t.map(Long.box).orNull) }
      .toDF("key", "attr", "valid_from", "valid_to")
      .selectExpr("key", "attr", "valid_from", "CAST(valid_to AS BIGINT) AS valid_to")

  test("change closes the open row and opens a new version") {
    val d = dim((1L, "red", 1L, None))
    val u = Seq((1L, "blue")).toDF("key", "attr")
    val out = Scd2.apply(d, u, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set((1L, "red", 1L, Some(2L)), (1L, "blue", 2L, None)))
  }

  test("same-attr update is a no-op; new key opens; closed rows pass through") {
    val d = dim(
      (1L, "red", 1L, None),        // no-op target
      (2L, "old", 0L, Some(1L)),    // closed history
      (2L, "new", 1L, None))        // open, untouched by batch
    val u = Seq((1L, "red"), (9L, "fresh")).toDF("key", "attr")
    val out = Scd2.apply(d, u, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      (1L, "red", 1L, None),        // unversioned: attr identical
      (2L, "old", 0L, Some(1L)),    // history verbatim
      (2L, "new", 1L, None),
      (9L, "fresh", 2L, None)))     // brand-new key opened at v2
  }

  test("applying the same batch twice is idempotent") {
    val d = dim((1L, "red", 1L, None), (2L, "green", 1L, None))
    val u = Seq((1L, "blue")).toDF("key", "attr")
    val once = Scd2.apply(d, u, 2L)
    val twice = Scd2.apply(once, u, 3L)
    // second application sees attr already 'blue' → no new versions
    assert(twice.count() == once.count())
    assert(twice.filter("valid_from = 3").count() == 0)
  }
}
