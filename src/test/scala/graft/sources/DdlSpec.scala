package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Commands / DDL / stats coverage (§2.13; reference
  * `execution/command/tables.scala`, `views.scala`,
  * `AnalyzeTableCommand.scala`, `AnalyzeColumnCommand.scala`):
  * create/describe/show/alter/drop for datasource tables and views, and
  * ANALYZE feeding catalog statistics into the optimizer (CBO).
  */
class DdlSpec extends SparkSpec {

  test("CTAS + DESCRIBE + SHOW TABLES + ALTER ADD COLUMNS + DROP") {
    spark.sql("DROP TABLE IF EXISTS ddl_nation")
    Tables.registerAll(spark, sf)
    spark.sql(
      """CREATE TABLE ddl_nation USING parquet AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
    try {
      assert(spark.sql("SHOW TABLES").collect()
        .exists(_.getString(1) == "ddl_nation"))
      val cols = spark.sql("DESCRIBE TABLE ddl_nation")
        .select("col_name").collect().map(_.getString(0)).toSet
      assert(Set("n_nationkey", "n_name", "n_regionkey").subsetOf(cols))
      assert(spark.table("ddl_nation").count() == 25)

      spark.sql("ALTER TABLE ddl_nation ADD COLUMNS (note STRING)")
      assert(spark.table("ddl_nation").schema.fieldNames.contains("note"))
      // existing rows read the new column as null
      assert(spark.table("ddl_nation").filter(col("note").isNull).count() == 25)
    } finally spark.sql("DROP TABLE IF EXISTS ddl_nation")
    assert(!spark.sql("SHOW TABLES").collect()
      .exists(_.getString(1) == "ddl_nation"))
  }

  test("CREATE VIEW / DESCRIBE / query / DROP VIEW") {
    Tables.registerAll(spark, sf)
    spark.sql("DROP VIEW IF EXISTS big_nations")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW big_nations AS
        |SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey""".stripMargin)
    try {
      assert(spark.table("big_nations").count() == 5)
      assert(spark.sql("SELECT sum(n) FROM big_nations").head().getLong(0) == 25)
    } finally spark.sql("DROP VIEW IF EXISTS big_nations")
    assert(!spark.catalog.tableExists("big_nations"))
  }

  test("ANALYZE TABLE feeds row-count statistics to the optimizer") {
    spark.sql("DROP TABLE IF EXISTS ddl_orders")
    Tables.registerAll(spark, sf)
    spark.sql(
      """CREATE TABLE ddl_orders USING parquet AS
        |SELECT o_orderkey, o_custkey, o_totalprice FROM orders""".stripMargin)
    try {
      val expected = spark.table("ddl_orders").count()
      spark.sql("ANALYZE TABLE ddl_orders COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE ddl_orders COMPUTE STATISTICS FOR COLUMNS o_custkey")

      // row counts flow into plan stats when the cost-based optimizer
      // reads catalog statistics
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val stats = spark.table("ddl_orders").queryExecution
          .optimizedPlan.stats
        assert(stats.sizeInBytes > 0)
        assert(stats.rowCount.contains(BigInt(expected)),
          s"catalog rowCount should be $expected, got ${stats.rowCount}")
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")

      // column-level stats surface through DESCRIBE EXTENDED
      val desc = spark.sql("DESCRIBE EXTENDED ddl_orders o_custkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("distinct_count").exists(_.toLong > 0))
    } finally spark.sql("DROP TABLE IF EXISTS ddl_orders")
  }

  test("hive partition DDL: SHOW PARTITIONS / DROP PARTITION / per-partition ANALYZE") {
    graft.Tables.registerAll(spark, sf)
    spark.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")
    spark.sql("DROP TABLE IF EXISTS ddl_part")
    try {
      spark.sql(
        """CREATE TABLE ddl_part (n_nationkey INT, n_name STRING)
          |PARTITIONED BY (n_regionkey INT) STORED AS PARQUET""".stripMargin)
      spark.sql(
        """INSERT INTO ddl_part PARTITION (n_regionkey)
          |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
      val parts = spark.sql("SHOW PARTITIONS ddl_part")
        .collect().map(_.getString(0)).toSet
      assert(parts == (0 to 4).map(r => s"n_regionkey=$r").toSet,
        s"expected 5 region partitions, got $parts")
      // partition-scoped statistics (reference AnalyzePartitionCommand)
      spark.sql("ANALYZE TABLE ddl_part PARTITION (n_regionkey=2) COMPUTE STATISTICS")
      val desc = spark.sql("DESCRIBE EXTENDED ddl_part PARTITION (n_regionkey=2)")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(desc.get("Partition Statistics").exists(_.contains("rows")),
        s"expected partition row stats, got ${desc.get("Partition Statistics")}")
      // metadata-only partition drop
      spark.sql("ALTER TABLE ddl_part DROP PARTITION (n_regionkey=0)")
      assert(spark.sql("SHOW PARTITIONS ddl_part").count() == 4)
      assert(spark.table("ddl_part")
        .filter(org.apache.spark.sql.functions.col("n_regionkey") === 0).count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS ddl_part")
  }

  test("column DEFAULT values apply on INSERT and ALTER") {
    spark.sql("DROP TABLE IF EXISTS ddl_defaults")
    try {
      spark.sql(
        """CREATE TABLE ddl_defaults (
          |  k INT, status STRING DEFAULT 'new', score INT DEFAULT 10)
          |USING parquet""".stripMargin)
      spark.sql("INSERT INTO ddl_defaults (k) VALUES (1)")
      spark.sql("INSERT INTO ddl_defaults VALUES (2, 'done', DEFAULT)")
      spark.sql("ALTER TABLE ddl_defaults ALTER COLUMN score SET DEFAULT 99")
      spark.sql("INSERT INTO ddl_defaults (k) VALUES (3)")
      val rows = spark.table("ddl_defaults")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
      assert(rows == Set((1, "new", 10), (2, "done", 10), (3, "new", 99)),
        s"defaults mis-applied: $rows")
    } finally spark.sql("DROP TABLE IF EXISTS ddl_defaults")
  }

  test("INSERT OVERWRITE replaces table contents atomically") {
    Tables.registerAll(spark, sf)
    spark.sql("DROP TABLE IF EXISTS ddl_overwrite")
    try {
      spark.sql(
        """CREATE TABLE ddl_overwrite USING parquet AS
          |SELECT n_nationkey, n_name FROM nation""".stripMargin)
      assert(spark.table("ddl_overwrite").count() == 25)
      spark.sql(
        """INSERT OVERWRITE TABLE ddl_overwrite
          |SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2""".stripMargin)
      val rows = spark.table("ddl_overwrite").count()
      assert(rows == 5, s"overwrite should leave only region-2 nations, got $rows")
    } finally spark.sql("DROP TABLE IF EXISTS ddl_overwrite")
  }

  test("SHOW CREATE TABLE / SHOW FUNCTIONS / EXPLAIN surface metadata") {
    Tables.registerAll(spark, sf)
    spark.sql("DROP TABLE IF EXISTS ddl_show")
    try {
      spark.sql(
        "CREATE TABLE ddl_show (a INT, b STRING) USING parquet")
      val ddl = spark.sql("SHOW CREATE TABLE ddl_show").head().getString(0)
      assert(ddl.contains("CREATE TABLE") && ddl.contains("ddl_show")
        && ddl.contains("parquet"), s"unexpected DDL: $ddl")
      val fns = spark.sql("SHOW FUNCTIONS LIKE 'xxhash*'")
        .collect().map(_.getString(0))
      assert(fns.contains("xxhash64"))
      val explain = spark.sql("EXPLAIN FORMATTED SELECT count(*) FROM nation")
        .head().getString(0)
      assert(explain.contains("Physical Plan") && explain.contains("HashAggregate"),
        s"EXPLAIN FORMATTED should dump the physical plan:\n$explain")
    } finally spark.sql("DROP TABLE IF EXISTS ddl_show")
  }

  test("CACHE TABLE AS SELECT scans the InMemoryRelation, UNCACHE releases it") {
    graft.Tables.registerAll(spark, sf)
    spark.sql("UNCACHE TABLE IF EXISTS ddl_cached")
    spark.sql("DROP VIEW IF EXISTS ddl_cached")
    try {
      spark.sql(
        """CACHE TABLE ddl_cached AS
          |SELECT c_nationkey, count(*) AS n FROM customer GROUP BY c_nationkey""".stripMargin)
      val q = spark.sql("SELECT sum(n) AS total FROM ddl_cached")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryRelation"),
        s"cached table should read from the columnar cache:\n$plan")
      assert(q.head().getLong(0) ==
        graft.Tables.load(spark, sf, "customer").count())
      spark.sql("UNCACHE TABLE ddl_cached")
      val after = spark.sql("SELECT sum(n) FROM ddl_cached")
        .queryExecution.executedPlan.toString
      assert(!after.contains("InMemoryRelation"),
        s"UNCACHE must drop the cached relation:\n$after")
    } finally {
      spark.sql("UNCACHE TABLE IF EXISTS ddl_cached")
      spark.sql("DROP VIEW IF EXISTS ddl_cached")
    }
  }
}
