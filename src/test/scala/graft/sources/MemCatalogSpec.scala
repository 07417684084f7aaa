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

  test("SQL DELETE and UPDATE rewrite through the group-based row-level op") {
    val t = fresh("t_rl")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    spark.sql(s"DELETE FROM $t WHERE k % 2 = 0")
    assert(spark.sql(s"SELECT k FROM $t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    spark.sql(s"UPDATE $t SET v = concat(v, '!') WHERE k = 3")
    val got = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (3L, "c!")))
  }

  test("MERGE partial update preserves unset columns; UPDATE SET NULL " +
      "writes a real null") {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val t = s"$cat.ns.t_partial"
    spark.sql(s"CREATE TABLE $t (k BIGINT, a BIGINT, b STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10, 'x'), (2, 20, 'y')")
    spark.sql(
      s"""MERGE INTO $t t USING (SELECT 1 AS k, 99 AS na) s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET a = s.na""".stripMargin)
    val afterMerge = spark.sql(s"SELECT k, a, b FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // only `a` was set: `b` (and the unmatched row) must be untouched
    assert(afterMerge == Seq((1L, 99L, "x"), (2L, 20L, "y")))
    spark.sql(s"UPDATE $t SET b = NULL WHERE k = 2")
    val nulls = spark.sql(s"SELECT k, b IS NULL FROM $t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(nulls == Seq((1L, false), (2L, true)))
  }

  test("a write committed between a row-level scan and its replace " +
      "commit is detected, not silently lost") {
    import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRowLevelOperations, TableCatalog}
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationInfo}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val t = fresh("t_conflict")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val tbl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[TableCatalog]
      .loadTable(Identifier.of(Array("ns"), "t_conflict"))
      .asInstanceOf[SupportsRowLevelOperations]
    def newOp(): RowLevelOperation =
      tbl.newRowLevelOperationBuilder(new RowLevelOperationInfo {
        override def options(): CaseInsensitiveStringMap =
          CaseInsensitiveStringMap.empty()
        override def command(): RowLevelOperation.Command =
          RowLevelOperation.Command.DELETE
      }).build()
    val winfo = new LogicalWriteInfo {
      override def queryId(): String = "spec"
      override def schema() = tbl.schema()
      override def options(): CaseInsensitiveStringMap =
        CaseInsensitiveStringMap.empty()
    }
    // conflict: snapshot-scan, then an interleaved INSERT bumps the
    // table version before the replace commit → must throw, because
    // the replacement would swap away the concurrent insert
    val op1 = newOp()
    op1.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    intercept[java.util.ConcurrentModificationException] {
      op1.newWriteBuilder(winfo).build().toBatch
        .commit(Array.empty)
    }
    // the concurrent insert survived the rejected replace
    assert(spark.table(t).count() == 3L)
    // no interleaving: the same empty replace (delete-all) commits fine
    val op2 = newOp()
    op2.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    op2.newWriteBuilder(winfo).build().toBatch.commit(Array.empty)
    assert(spark.table(t).count() == 0L)
  }
}
