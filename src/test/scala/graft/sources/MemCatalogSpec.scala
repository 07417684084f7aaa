package graft.sources

import org.apache.spark.sql.AnalysisException

import graft.SparkSpec

/** Catalog-plugin contract tests for [[MemCatalog]]: SQL-driven DDL
  * lifecycle, v2 write atomic truncate-overwrite, ALTER null-padding,
  * rename, namespace listing, V2 function resolution (magic-method
  * scalar + partial/merge aggregate), and analysis-time rejection of
  * wrong function arity/types.
  */
class MemCatalogSpec extends SparkSpec {

  private val cat = "spec_cat"

  private def fresh(table: String): String = {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.$table (k BIGINT, v STRING)")
    s"$cat.ns.$table"
  }

  test("create / insert / select round-trip through the plugin catalog") {
    val t = fresh("t1")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val got = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("INSERT OVERWRITE truncates atomically; append accumulates") {
    val t = fresh("t2")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    assert(spark.table(t).count() == 2)
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'z')")
    val got = spark.sql(s"SELECT k, v FROM $t").collect()
    assert(got.length == 1 && got(0).getLong(0) == 9L)
  }

  test("ALTER TABLE ADD COLUMN null-pads existing rows; new inserts fill it") {
    val t = fresh("t3")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $t ADD COLUMN w BIGINT")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 20)")
    val got = spark.sql(s"SELECT k, v, w FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", -1L), (2L, "b", 20L)))
  }

  test("rename + drop + SHOW TABLES reflect catalog state") {
    val t = fresh("t4")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $t RENAME TO ns.t4renamed")
    val names = spark.sql(s"SHOW TABLES IN $cat.ns")
      .collect().map(_.getString(1)).toSet
    assert(names.contains("t4renamed") && !names.contains("t4"))
    assert(spark.table(s"$cat.ns.t4renamed").count() == 1)
    spark.sql(s"DROP TABLE $cat.ns.t4renamed")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").collect().isEmpty)
  }

  test("duplicate create fails; missing table load fails") {
    val t = fresh("t5")
    intercept[AnalysisException](
      spark.sql(s"CREATE TABLE $t (x BIGINT)"))
    intercept[AnalysisException](
      spark.table(s"$cat.ns.no_such_table").collect())
  }

  test("V2 scalar function: magic-method gcd, correct over a range") {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val got = spark.sql(
      s"""SELECT $cat.ns.gcd(id * 6, 15) AS g FROM range(1, 6) ORDER BY id""")
      .collect().map(_.getLong(0)).toSeq
    // ids 1..5 → (6,15)=3 (12,15)=3 (18,15)=3 (24,15)=3 (30,15)=15
    assert(got == Seq(3L, 3L, 3L, 3L, 15L))
    // int args implicitly cast to the declared bigint input types
    assert(spark.sql(s"SELECT $cat.ns.gcd(CAST(8 AS INT), CAST(12 AS INT)) AS g")
      .collect()(0).getLong(0) == 4L)
  }

  test("V2 aggregate function: sumsq equals closed form and is partition-invariant") {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.range(0, 101).createOrReplaceTempView("sumsq_in")
    val expected = 100L * 101L * 201L / 6L
    for (parts <- Seq(1, 7)) {
      val got = spark.sql(
        s"""SELECT $cat.ns.sumsq(id) AS s
           |FROM (SELECT /*+ REPARTITION($parts) */ id FROM sumsq_in)""".stripMargin)
        .collect()(0).getLong(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("function binding rejects wrong arity and non-integral types") {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val e1 = intercept[Exception](
      spark.sql(s"SELECT $cat.ns.gcd(1, 2, 3)").collect())
    assert(e1.getMessage.contains("gcd"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT $cat.ns.gcd('a', 'b')").collect())
    assert(e2.getMessage.toLowerCase.contains("gcd") ||
      e2.getMessage.toLowerCase.contains("integral"))
    val e3 = intercept[Exception](
      spark.sql(s"SELECT $cat.ns.no_such_fn(1)").collect())
    assert(e3.getMessage.contains("no_such_fn"))
  }

  test("reads snapshot-isolate from subsequent writes") {
    val t = fresh("t6")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val df = spark.table(t) // plan against current snapshot… but scans
    // snapshot at scan-build time, so materialize the "before" count
    val before = df.count()
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    assert(before == 1L)
    assert(spark.table(t).count() == 2L)
  }

  test("DataFrameWriterV2: create, append, truncate-overwrite and " +
      "createOrReplace through the plugin catalog") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val t = s"$cat.ns.wt"
    def read: Seq[(Long, String)] = spark.table(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").writeTo(t).create()
    assert(read == Seq((1L, "a"), (2L, "b")))
    // create() on an existing table must refuse, not clobber
    intercept[Exception] {
      Seq((9L, "x")).toDF("k", "v").writeTo(t).create()
    }
    Seq((3L, "c")).toDF("k", "v").writeTo(t).append()
    assert(read == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // overwrite(true) routes through the TRUNCATE capability
    Seq((7L, "z")).toDF("k", "v").writeTo(t).overwrite(lit(true))
    assert(read == Seq((7L, "z")))
    // createOrReplace drops and recreates — fresh schema-compatible data
    Seq((5L, "r")).toDF("k", "v").writeTo(t).createOrReplace()
    assert(read == Seq((5L, "r")))
  }
}
