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

  test("invariants hold under a randomized batch sequence") {
    // seeded pseudo-random mutation stream; after every application:
    // ≤1 open row per key, and version intervals never overlap
    val attrs = Vector("a", "b", "c")
    var d = dim((1L, "a", 1L, None))
    for (v <- 2L to 5L) {
      val batch = (0 until 12).map { i =>
        val k = (i * 2654435761L + v) % 7
        (k, attrs(((k + v + i) % 3).toInt))
      }.distinct.groupBy(_._1).map(_._2.head).toSeq // one update per key
        .toDF("key", "attr")
      d = Scd2.apply(d, batch, v)
      val rows = d.collect().map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      val openPerKey = rows.filter(_._3.isEmpty).groupBy(_._1)
      assert(openPerKey.values.forall(_.length == 1),
        s"v$v: multiple open rows for a key")
      rows.groupBy(_._1).values.foreach { hist =>
        val spans = hist.map { case (_, f, t) => (f, t.getOrElse(Long.MaxValue)) }
          .sortBy(_._1).toList
        spans.zip(spans.drop(1)).foreach { case ((_, t1), (f2, _)) =>
          assert(t1 <= f2, s"v$v: overlap")
        }
      }
    }
  }

  test("NULL attrs are versioned null-safely, never dropped") {
    // dim open row has NULL attr; update sets a value → close + open.
    // update carries NULL for a non-null row → close + open NULL version.
    // NULL == NULL → no-op. With === instead of <=> all three rows would
    // silently vanish (both filters evaluate to NULL).
    val d = Seq(
      (1L, null.asInstanceOf[String], 1L),  // null → "x": real change
      (2L, "y", 1L),                        // "y" → null: real change
      (3L, null.asInstanceOf[String], 1L))  // null → null: no-op
      .toDF("key", "attr", "valid_from")
      .selectExpr("key", "attr", "valid_from", "CAST(NULL AS BIGINT) AS valid_to")
    val u = Seq((1L, "x"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("key", "attr")
    val out = Scd2.apply(d, u, 2L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set(
      (1L, None, 1L, Some(2L)), (1L, Some("x"), 2L, None),
      (2L, Some("y"), 1L, Some(2L)), (2L, None, 2L, None),
      (3L, None, 1L, None)), s"got $out")
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
