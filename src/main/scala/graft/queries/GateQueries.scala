package graft.queries


import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Gate entries that flip spec-only VERDICT rows to oracle-checked:
  * CSV/JSON/ORC sinks+sources round-trip THROUGH the driver contract
  * (write to a temp dir, read back, aggregate — the oracle aggregates
  * the original parquet, so any write/read corruption breaks the hash),
  * partitioned-write pruning, scalar UDF and typed-Aggregator UDAF
  * registration, and the custom codegen `hamming64` expression against
  * DuckDB's native `bit_count(xor(..))`.
  */
object GateQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Typed Aggregator summing prices as integer cents — deterministic
    * under any partitioning/merge order (long addition is associative-
    * commutative; double addition is not, which is why the UDAF gate
    * uses cents).  The `functions.udaf` path plans as
    * ObjectHashAggregate with partial merge — same shape as any
    * built-in declarative aggregate.
    */
  private val sumCents: Aggregator[Double, Long, Long] =
    new Aggregator[Double, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: Double): Long = b + math.floor(a * 100).toLong
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(r: Long): Long = r
      override def bufferEncoder = Encoders.scalaLong
      override def outputEncoder = Encoders.scalaLong
    }

  private def tmpDir(prefix: String): String =
    graft.TmpCleanup.tempDir(prefix)


  val queries: Map[String, Q] = Map(
    // CSV sink + source round-trip (header mode, explicit schema on
    // read): aggregate of the round-tripped data == oracle on parquet.
    "q_csv_roundtrip" -> { (s, dir) =>
      val src = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val tmp = tmpDir("graft_csv_rt")
      src.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(src.schema).option("header", "true").csv(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("price_sum"))
        .orderBy(col("o_orderstatus"))
    },

    // JSON sink + source round-trip with SCHEMA INFERENCE on read.
    "q_json_roundtrip" -> { (s, dir) =>
      val src = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val tmp = tmpDir("graft_json_rt")
      src.write.mode("overwrite").json(tmp)
      s.read.json(tmp) // inferred: bigint + strings
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"),
          min(col("c_name")).as("first_name"))
        .orderBy(col("c_mktsegment"))
    },

    // ORC sink + source round-trip.  Sampled (like the JDBC gate) — the
    // gate verifies the format plumbing, not full-table write throughput,
    // so it writes ~10% of lineitem instead of all of it.
    "q_orc_roundtrip" -> { (s, dir) =>
      val src = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_returnflag"), col("l_quantity"))
      val tmp = tmpDir("graft_orc_rt")
      src.write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty_sum"))
        .orderBy(col("l_returnflag"))
    },

    // XML FILE source + sink round-trip (Spark 4 built-in XmlFileFormat,
    // the spark-xml lineage): write rowTag-framed XML, read back with
    // schema inference, aggregate — complements q_from_xml, which covers
    // only the from_xml/to_xml EXPRESSIONS, not the file format.
    "q_xml_roundtrip" -> { (s, dir) =>
      val src = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_name"))
      val tmp = tmpDir("graft_xml_rt")
      src.write.mode("overwrite")
        .option("rootTag", "suppliers").option("rowTag", "supplier")
        .xml(tmp)
      s.read.option("rowTag", "supplier").xml(tmp) // inferred: bigint + string
        .groupBy(col("s_nationkey"))
        // whitespace-robust by construction: the XML reader trims
        // surrounding spaces (ignoreSurroundingSpaces default) and maps
        // empty elements to null, so project trim+empty→sentinel on BOTH
        // sides — the gate then holds on any corpus, padded or empty names
        // included, instead of assuming byte-exact round-trip
        .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("key_sum"),
          min(coalesce(nullif(trim(col("s_name")), lit("")), lit("~")))
            .as("first_name"))
        .orderBy(col("s_nationkey"))
    },

    // Partitioned parquet write + partition-pruned read: only the 'F'
    // directory is scanned (pruning asserted in SourcesSpec; here the
    // values go through the oracle).
    "q_partitioned_write" -> { (s, dir) =>
      val src = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val tmp = tmpDir("graft_part_rt")
      src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_orderstatus") === "F")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
    },

    // Scalar UDF, SQL-registered and invoked through SQL text.
    "q_udf_scalar" -> { (s, dir) =>
      s.udf.register("vowel_count",
        (t: String) => if (t == null) 0L else t.count("aeiou".contains(_)).toLong)
      Tables.load(s, dir, "documents")
        .select(col("source"), expr("vowel_count(text)").as("nv"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nv")).as("vowel_sum"))
        .orderBy(col("source"))
    },

    // Typed Aggregator (UDAF) via functions.udaf, SQL-registered.
    "q_udaf_sum_cents" -> { (s, dir) =>
      s.udf.register("sum_cents", udaf(sumCents, Encoders.scalaDouble))
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("sum_cents(o_totalprice)").as("cents_sum"))
        .orderBy(col("o_orderstatus"))
    },

    // JDBC sink + source round-trip through embedded Derby: write a
    // sampled orders projection to a real SQL database, read it back
    // over JDBC (with pushdown available at the scan), aggregate.
    // Derby uppercases identifiers; aliases restore the oracle names.
    "q_jdbc_roundtrip" -> { (s, dir) =>
      // one in-memory database per session, table overwritten per run —
      // repeated Bench/Verify invocations never accumulate Derby heap
      val url = "jdbc:derby:memory:graft_gate;create=true"
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").format("jdbc")
        .option("url", url).option("dbtable", "ORDERS_J").save()
      s.read.format("jdbc")
        .option("url", url).option("dbtable", "ORDERS_J").load()
        .groupBy(col("O_ORDERSTATUS").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("O_TOTALPRICE").cast("decimal(12,2)")).cast("double").as("price_sum"))
        .orderBy(col("o_orderstatus"))
    },

    // Text sink + source round-trip: rows serialized to TSV lines,
    // written as a text file, read back and re-parsed.
    "q_text_roundtrip" -> { (s, dir) =>
      val src = Tables.load(s, dir, "documents")
        .select(concat_ws("\t", col("doc_id"), col("source")).as("value"))
      val tmp = tmpDir("graft_text_rt")
      src.write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .select(split(col("value"), "\t").as("f"))
        .select(element_at(col("f"), 1).cast("long").as("doc_id"),
          element_at(col("f"), 2).as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("source"))
    },

    // DataFrameNaFunctions: nullif-created nulls, then fill + replace +
    // drop, all reflected exactly in the oracle's CASE algebra.
    "q_na_handling" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"),
          expr("nullif(event_type, 'error')").as("etype"),
          when(col("value") >= 1, col("value")).as("v"))
      ev.na.fill(Map("etype" -> "scrubbed"))
        .na.replace("etype", Map("view" -> "viewed"))
        .na.drop(Seq("v"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 100).cast("long")).as("cents_sum"))
        .orderBy(col("etype"))
    },

    // from_xml: typed extraction from synthesized XML payloads.
    "q_from_xml" -> { (s, dir) =>
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val xmlSchema = StructType(Seq(
        StructField("k", IntegerType), StructField("n", StringType)))
      Tables.load(s, dir, "nation")
        .select(col("n_nationkey"),
          concat(lit("<r><k>"), col("n_nationkey"), lit("</k><n>"),
            col("n_name"), lit("</n></r>")).as("x"))
        .select(col("n_nationkey"), from_xml(col("x"), xmlSchema).as("p"))
        .select(col("n_nationkey"), col("p.k").as("k"), col("p.n").as("n"))
        .orderBy(col("n_nationkey"))
    },

    // DSv2 WRITE gate: the two-phase-commit MemSinkV2 receives a
    // bounded sample; the committed rows are re-framed and aggregated —
    // oracle == same aggregate on the source, so a lost/duplicated task
    // commit breaks the hash.  (Driver-side rows() is the sink's
    // contract — a test double, bounded by the % 10 sample.)
    "q_dsv2_write" -> { (s, dir) =>
      import s.implicits._
      val name = "g_dsv2_write_gate"
      graft.sources.MemSinkV2.clear(name)
      Tables.load(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.format("graft.sources.MemSinkV2")
        .option("name", name).mode("append").save()
      val committed = graft.sources.MemSinkV2.rows(name)
        .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[String]))
      graft.sources.MemSinkV2.clear(name)
      committed.toDF("o_orderkey", "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },

    // DDL gate: CTAS into the session catalog, then aggregate FROM the
    // catalog table — oracle aggregates the original parquet directly.
    "q_ctas_roundtrip" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      // the warehouse DIRECTORY outlives the in-memory catalog across
      // JVMs: drop the catalog entry AND scrub any stale location
      s.sql("DROP TABLE IF EXISTS g_ctas_gate")
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      graft.TmpCleanup.deleteStale(
        java.nio.file.Paths.get(wh, "g_ctas_gate"))
      s.sql("""CREATE TABLE g_ctas_gate USING parquet AS
              |SELECT o_orderpriority, o_totalprice FROM orders
              |WHERE o_orderkey % 5 = 0""".stripMargin)
      s.sql("""SELECT o_orderpriority, count(*) AS n,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
              |FROM g_ctas_gate
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // observe() gate: metrics accumulate ON the executors during a
    // single pass (no second scan) and surface as one driver row.
    "q_observe" -> { (s, dir) =>
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation()
      Tables.load(s, dir, "lineitem")
        .observe(obs, count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      Seq((m("n").asInstanceOf[Long], m("cents").asInstanceOf[Long]))
        .toDF("n", "cents")
    },

    // Parameterized SQL gate (named-parameter binding, Spark 4 API);
    // oracle inlines the literal.
    "q_param_sql" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders WHERE o_totalprice > :minp
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("minp" -> 300000))
    },

    // Explicit hash repartition before the aggregation (REPARTITION is
    // semantically a no-op — the oracle is the plain aggregate).
    "q_repartition_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .repartition(8, col("l_returnflag"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity")).cast("long")).as("qty_sum"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Classic per-row file-provenance functions (reference
    // `inputFileBlock.scala`): `input_file_name()` and the
    // input-file-block pair, cross-checked against the `_metadata`
    // hidden column on the SAME scan.  File paths are engine-local, so
    // the oracle compares name-independent invariants: rows and file
    // count per partition value (repartition-by-column + partitionBy
    // yields exactly one file per value), zero basename mismatches
    // between input_file_name() and _metadata.file_path, block starts
    // at offset 0 somewhere in every file, and a positive block length
    // on every row — all corpus-independent at any SF.
    "q_input_file" -> { (s, dir) =>
      val src = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val tmp = tmpDir("graft_ifn")
      src.repartition(col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .select(col("o_orderstatus"),
          input_file_name().as("fn"),
          col("_metadata.file_path").as("mp"),
          expr("input_file_block_start()").as("bs"),
          expr("input_file_block_length()").as("bl"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("fn")).as("n_files"),
          sum(when(element_at(split(col("fn"), "/"), -1) ===
                   element_at(split(col("mp"), "/"), -1), 0L)
            .otherwise(1L)).as("name_mismatch"),
          min(col("bs")).as("min_bs"),
          sum(when(col("bl") > 0, 0L).otherwise(1L)).as("bad_len"))
        .orderBy(col("o_orderstatus"))
    },

    // Custom codegen expression hamming64 vs DuckDB bit_count(xor()):
    // popcount of two key-derived 64-bit words per doc.
    "q_hamming" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("source"),
          graft.functions.hamming64(col("doc_id") * lit(2654435761L),
            col("doc_id") * lit(40503L) + lit(17L)).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("ham_sum"),
          min(col("h")).cast("long").as("ham_min"),
          max(col("h")).cast("long").as("ham_max"))
        .orderBy(col("source"))
    })

  val oracle: Map[String, String] = Map(
    "q_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum, min(c_name) AS first_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_partitioned_write" ->
      """SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_udf_scalar" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))) AS BIGINT) AS vowel_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_udaf_sum_cents" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_jdbc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_text_roundtrip" ->
      """SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_na_handling" ->
      """SELECT CASE coalesce(nullif(event_type, 'error'), 'scrubbed')
        |         WHEN 'view' THEN 'viewed'
        |         ELSE coalesce(nullif(event_type, 'error'), 'scrubbed') END AS etype,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM events WHERE value >= 1
        |GROUP BY etype ORDER BY etype""".stripMargin,
    "q_from_xml" ->
      """SELECT n_nationkey, CAST(n_nationkey AS INT) AS k, n_name AS n
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_dsv2_write" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_ctas_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
        |FROM orders WHERE o_orderkey % 5 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_observe" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem""".stripMargin,
    "q_param_sql" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders WHERE o_totalprice > 300000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_xml_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |  min(coalesce(nullif(trim(s_name), ''), '~')) AS first_name
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_input_file" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST(0 AS BIGINT) AS name_mismatch,
        |  CAST(0 AS BIGINT) AS min_bs,
        |  CAST(0 AS BIGINT) AS bad_len
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_repartition_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_hamming" ->
      """SELECT source, count(*) AS n,
        |  CAST(sum(bit_count(xor(doc_id * 2654435761, doc_id * 40503 + 17))) AS BIGINT) AS ham_sum,
        |  CAST(min(bit_count(xor(doc_id * 2654435761, doc_id * 40503 + 17))) AS BIGINT) AS ham_min,
        |  CAST(max(bit_count(xor(doc_id * 2654435761, doc_id * 40503 + 17))) AS BIGINT) AS ham_max
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
