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

  test("VERSION AS OF serves each commit's frozen rows; unknown and " +
      "expired versions fail loudly") {
    val t = fresh("t_tt")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')") // v1
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')") // v2
    spark.sql(s"DELETE FROM $t WHERE k = 1")     // v3
    def ks(q: String): Seq[Long] =
      spark.sql(q).collect().map(_.getLong(0)).toSeq.sorted
    assert(ks(s"SELECT k FROM $t VERSION AS OF 0") == Seq())
    assert(ks(s"SELECT k FROM $t VERSION AS OF 1") == Seq(1L))
    assert(ks(s"SELECT k FROM $t VERSION AS OF 2") == Seq(1L, 2L))
    assert(ks(s"SELECT k FROM $t VERSION AS OF 3") == Seq(2L))
    assert(ks(s"SELECT k FROM $t") == Seq(2L))
    val e = intercept[Exception](
      spark.sql(s"SELECT k FROM $t VERSION AS OF 99").collect())
    assert(e.getMessage.contains("no retained snapshot") ||
      Option(e.getCause).exists(_.getMessage.contains("no retained snapshot")))
  }

  test("TIMESTAMP AS OF picks the latest snapshot at-or-before the instant") {
    val t = fresh("t_ts")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    Thread.sleep(5) // commit timestamps are wall-clock micros
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    // timestamp_millis() is tz-independent (epoch-based), so the spec
    // never depends on the session zone
    val got = spark.sql(
      s"SELECT k FROM $t TIMESTAMP AS OF timestamp_millis(${mid}L)")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L))
    val now = System.currentTimeMillis() + 1000L
    val cur = spark.sql(
      s"SELECT k FROM $t TIMESTAMP AS OF timestamp_millis(${now}L)")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(cur == Seq(1L, 2L))
    // before the table existed → no snapshot
    intercept[Exception](
      spark.sql(s"SELECT k FROM $t TIMESTAMP AS OF timestamp_millis(0L)")
        .collect())
  }

  test("snapshot retention bounds history: old versions expire, recent " +
      "stay readable") {
    val t = fresh("t_ret")
    // v1..v40 (maxSnapshots = 32): v0..v8 expire, v9.. retained
    (1 to 40).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i, 'x')"))
    intercept[Exception](
      spark.sql(s"SELECT k FROM $t VERSION AS OF 1").collect())
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 9")
      .collect()(0).getLong(0) == 9L)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 40")
      .collect()(0).getLong(0) == 40L)
  }

  test("CALL dedupe_rows rewrites duplicates, commits a snapshot, and " +
      "time travel still sees the pre-rewrite state") {
    val t = fresh("t_dd")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (1, 'a'), (2, 'b'), (1, 'a')")
    val res = spark.sql(s"CALL $cat.ns.dedupe_rows('ns', 't_dd')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res == Seq((2L, 2L))) // 4 rows → 2 distinct, 2 removed
    assert(spark.table(t).count() == 2L)
    // v1 (pre-rewrite) still shows all four rows
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0) == 4L)
    // idempotent: nothing left to remove, and no new snapshot commits
    val before = spark.sql(s"CALL $cat.ns.snapshots('ns', 't_dd')").count()
    assert(spark.sql(s"CALL $cat.ns.dedupe_rows('ns', 't_dd')")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql(s"CALL $cat.ns.snapshots('ns', 't_dd')").count() == before)
  }

  test("CALL snapshots lists retained history; unknown procedure and " +
      "missing table fail loudly") {
    val t = fresh("t_hist")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    val hist = spark.sql(s"CALL $cat.ns.snapshots('ns', 't_hist')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist == Seq((0L, 0L), (1L, 1L), (2L, 2L)))
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.ns.no_such_proc('ns', 't_hist')").collect())
    assert(e1.getMessage.contains("no_such_proc"))
    intercept[Exception](
      spark.sql(s"CALL $cat.ns.snapshots('ns', 'absent')").collect())
  }

  test("CALL expire_snapshots drops old versions (clamped keep), " +
      "leaves the live state intact") {
    val t = fresh("t_exp")
    (1 to 6).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i, 'x')"))
    // 7 snapshots retained (v0..v6); keep the last 2
    val res = spark.sql(s"CALL $cat.ns.expire_snapshots('ns', 't_exp', 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res == Seq((5L, 2L)))
    intercept[Exception](
      spark.sql(s"SELECT k FROM $t VERSION AS OF 4").collect())
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 5")
      .collect()(0).getLong(0) == 5L)
    assert(spark.table(t).count() == 6L)
    // keep clamps to >= 1: the latest snapshot always survives
    spark.sql(s"CALL $cat.ns.expire_snapshots('ns', 't_exp', 0)")
    val hist = spark.sql(s"CALL $cat.ns.snapshots('ns', 't_exp')")
      .collect().map(_.getLong(0)).toSeq
    assert(hist == Seq(6L))
  }

  test("SHOW PROCEDURES lists the catalog's procedures; DESCRIBE " +
      "PROCEDURE renders name + description") {
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.MemCatalog")
    MemCatalog.clear(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val shown = spark.sql(s"SHOW PROCEDURES IN $cat.ns")
      .collect().map(_.toSeq.map(String.valueOf).mkString(" ")).toSeq
    assert(shown.exists(_.contains("dedupe_rows")) &&
      shown.exists(_.contains("expire_snapshots")) &&
      shown.exists(_.contains("snapshots")), shown.mkString("; "))
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.ns.dedupe_rows")
      .collect().map(_.toSeq.map(String.valueOf).mkString(" ")).mkString("\n")
    assert(desc.contains("dedupe_rows") && desc.contains("exact-duplicate"))
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
