package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function battery — SURVEY.md §2.8's function families
  * (FunctionRegistry.scala's 282 registrations), exercised family-by-
  * family with DuckDB oracles: strings, regex, datetime, math/bitwise,
  * JSON, arrays, higher-order lambdas, hashes, casts, structs.
  * Every query is a narrow per-row projection + small aggregate so the
  * oracle compare pins exact semantics, not just row counts.
  */
object Functions {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_fn_string" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") <= 100)
      c.select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
          substring(col("c_name"), 1, 8).as("sub"),
          length(col("c_name")).as("len"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
          reverse(col("c_name")).as("rev"),
          repeat(lit("ab"), 3).as("rep"),
          trim(lit("  x  ")).as("trimmed"),
          instr(col("c_name"), "Customer").as("pos"))
        .orderBy(col("c_custkey"))
    },

    "q_fn_regex" -> { (s, dir) =>
      val c = Tables.load(s, dir, "part").filter(col("p_partkey") <= 200)
      c.select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          col("p_name").rlike("^[a-z]+ ").as("starts_word"),
          col("p_type").like("%BRASS%").as("is_brass"),
          split(col("p_type"), " ").getItem(0).as("type_head"))
        .orderBy(col("p_partkey"))
    },

    "q_fn_datetime" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 500)
      o.select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).as("days_to_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"))
        .orderBy(col("o_orderkey"))
    },

    "q_fn_math" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").filter(col("l_orderkey") <= 300)
      li.select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("absd"),
          round(col("l_extendedprice") / 1000, 2).as("price_k"),
          floor(col("l_quantity") / 7).as("fl"),
          ceil(col("l_quantity") / 7).as("ce"),
          round(pow(col("l_quantity"), 2), 6).as("sq"),
          round(sqrt(col("l_extendedprice")), 6).as("rt"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          signum(col("l_discount") - 0.05).as("sgn"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"),
          (col("l_partkey") % 10).as("mod10"),
          col("l_partkey").bitwiseAND(lit(255L)).as("band"),
          col("l_partkey").bitwiseOR(lit(1L)).as("bor"),
          col("l_partkey").bitwiseXOR(col("l_suppkey")).as("bxor"),
          shiftleft(col("l_linenumber"), 3).as("shl"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    "q_fn_json" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events").filter(col("event_id") <= 500)
      ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k_struct"),
          to_json(struct(col("event_id").as("id"))).as("j"))
        .orderBy(col("event_id"))
    },

    // Array results are joined to strings (driver compare can't hash
    // raw ndarray cells) — same array ops, string-serialized output.
    "q_fn_array" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
      val words = split(col("text"), " ")
      docs.select(col("doc_id"),
          size(words).as("n_words"),
          element_at(words, 1).as("first_word"),
          element_at(words, -1).as("last_word"),
          concat_ws("|", slice(words, 1, 3)).as("head3"),
          concat_ws("|", sort_array(array_distinct(words))).as("vocab"),
          array_contains(words, "spark").as("has_spark"),
          concat_ws("|", reverse(words)).as("rev_words"),
          concat_ws("-", slice(words, 1, 2)).as("first2"))
        .orderBy(col("doc_id"))
    },

    "q_fn_higher_order" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
      val words = split(col("text"), " ")
      docs.select(col("doc_id"),
          concat_ws(",", transform(words, w => length(w).cast("string"))).as("lens"),
          concat_ws("|", filter(words, w => length(w) > 4)).as("long_words"),
          aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("total_chars"),
          exists(words, w => w === "spark").as("any_spark"),
          forall(words, w => length(w) > 0).as("all_nonempty"),
          concat_ws("|", zip_with(slice(words, 1, 3), slice(words, 2, 3),
            (a, b) => concat_ws("_", a, b))).as("bigrams"))
        .orderBy(col("doc_id"))
    },

    "q_fn_map" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
      val ks = array_distinct(slice(split(col("text"), " "), 1, 5))
      docs
        .select(col("doc_id"), ks.as("ks"))
        .select(col("doc_id"),
          map_from_arrays(col("ks"), transform(col("ks"), w => length(w))).as("m"))
        .select(col("doc_id"),
          concat_ws("|", sort_array(map_keys(col("m")))).as("keys_sorted"),
          size(col("m")).as("n_entries"),
          coalesce(element_at(col("m"), lit("the")), lit(-1)).as("len_of_the"),
          aggregate(map_values(transform_values(col("m"), (_, v) => v * 2)),
            lit(0), (acc, x) => acc + x).as("sum_doubled"))
        .orderBy(col("doc_id"))
    },

    "q_fn_hash_cast" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") <= 100)
      c.select(col("c_custkey"),
          md5(col("c_name")).as("md5_name"),
          sha2(col("c_name"), 256).as("sha256_name"),
          col("c_acctbal").cast("int").as("bal_int"),
          col("c_acctbal").cast("string").as("bal_str"),
          col("c_custkey").cast("double").as("key_dbl"),
          col("c_custkey").cast("string").as("key_str"),
          lit("123").cast("long").as("parsed"),
          round(col("c_acctbal").cast("decimal(12,2)"), 0).cast("long").as("bal_round"))
        .orderBy(col("c_custkey"))
    },

    "q_fn_misc" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      n.select(col("n_nationkey"),
          hex(col("n_nationkey")).as("key_hex"),
          base64(encode(col("n_name"), "UTF-8")).as("name_b64"),
          concat_ws(",", transform(sequence(lit(1), col("n_regionkey") + 1),
            x => x.cast("string"))).as("seq"),
          concat_ws("|", array_repeat(col("n_name"), 2)).as("repeated"),
          format_string("nation-%03d", col("n_nationkey")).as("tag"),
          conv(col("n_nationkey").cast("string"), 10, 2).as("bin_str"))
        .orderBy(col("n_nationkey"))
    },

    // xpath family (reference `expressions/xml/`): extract from XML
    // synthesized out of table columns, so the oracle is the original
    // column and the XML round-trip is what's under test.
    "q_fn_xpath" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val xml = concat(lit("<r><n>"), col("n_name"),
        lit("</n><k>"), col("n_nationkey"), lit("</k></r>"))
      n.select(col("n_nationkey"), xml.as("xml"))
        .select(col("n_nationkey"),
          expr("xpath_string(xml, '/r/n')").as("name_x"),
          expr("xpath_long(xml, '/r/k')").as("key_x"),
          expr("xpath_boolean(xml, '/r/n')").as("has_n"),
          expr("size(xpath(xml, '/r/*'))").as("n_children"))
        .orderBy(col("n_nationkey"))
    },

    // reflect/java_method (reference `CallMethodViaReflection.scala`):
    // call a JVM static method per row; oracle is the equivalent SQL.
    "q_fn_reflect" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      n.select(col("n_nationkey"),
          expr("CAST(reflect('java.lang.Math', 'abs', CAST(n_nationkey - 12 AS INT)) AS INT)").as("abs_r"),
          expr("reflect('java.lang.String', 'valueOf', n_regionkey)").as("str_r"),
          expr("CAST(java_method('java.lang.Math', 'max', CAST(n_nationkey AS INT), CAST(n_regionkey AS INT)) AS INT)").as("max_r"))
        .orderBy(col("n_nationkey"))
    },

    // schema_of_json: Spark's inferred-DDL string for a JSON literal
    // (deterministic; the oracle pins the exact expected text).
    "q_fn_schema_of_json" -> { (s, dir) =>
      val s2 = s
      import s2.implicits._
      Seq(1).toDF("one")
        .select(
          schema_of_json(lit("""{"a": 1, "b": "x", "c": [1.5]}""")).as("schema_abc"),
          schema_of_json(lit("""[{"k": 2}]""")).as("schema_arr"))
    },

    "q_fn_struct" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      n.select(col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("region")).as("info"))
        .select(col("n_nationkey"),
          col("info.name").as("name"),
          col("info.region").as("region"),
          to_json(col("info")).as("info_json"))
        .orderBy(col("n_nationkey"))
    },

    // Custom Generator (UDTF): top word bigrams across the corpus.
    // One Generate node, no per-document token array materialized.
    "q_ngrams_generate" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      d.select(graft.functions.ngrams(col("text"), 2))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n"), min(col("pos")).cast("long").as("first_pos"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)
    })

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  concat_ws('|', c_name, c_mktsegment) AS joined,
        |  substring(c_name, 1, 8) AS sub, length(c_name) AS len,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        |  reverse(c_name) AS rev, repeat('ab', 3) AS rep,
        |  trim('  x  ') AS trimmed,
        |  CAST(strpos(c_name, 'Customer') AS INT) AS pos
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,
    "q_fn_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        |  p_type LIKE '%BRASS%' AS is_brass,
        |  string_split(p_type, ' ')[1] AS type_head
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d, CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS absd,
        |  round(l_extendedprice / 1000, 2) AS price_k,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS fl, CAST(ceil(l_quantity / 7) AS BIGINT) AS ce,
        |  round(pow(l_quantity, 2), 6) AS sq,
        |  round(sqrt(l_extendedprice), 6) AS rt,
        |  round(exp(l_discount), 6) AS ex,
        |  round(ln(l_extendedprice), 6) AS ln_p,
        |  round(log10(l_extendedprice), 6) AS log10_p,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
        |  greatest(l_tax, l_discount) AS gr, least(l_tax, l_discount) AS le,
        |  l_partkey % 10 AS mod10,
        |  l_partkey & 255 AS band, l_partkey | 1 AS bor,
        |  xor(l_partkey, l_suppkey) AS bxor,
        |  CAST(l_linenumber << 3 AS INT) AS shl
        |FROM lineitem WHERE l_orderkey <= 300 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |  '{"id":' || event_id || '}' AS j
        |FROM events WHERE event_id <= 500 ORDER BY event_id""".stripMargin,
    "q_fn_array" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  string_split(text, ' ')[1] AS first_word,
        |  string_split(text, ' ')[-1] AS last_word,
        |  array_to_string(string_split(text, ' ')[1:3], '|') AS head3,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS vocab,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_reverse(string_split(text, ' ')), '|') AS rev_words,
        |  array_to_string(string_split(text, ' ')[1:2], '-') AS first2
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_fn_higher_order" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(string_split(text, ' '), w -> len(w)), ',') AS lens,
        |  array_to_string(list_filter(string_split(text, ' '), w -> len(w) > 4), '|') AS long_words,
        |  CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '), w -> len(w))), (a,b) -> a+b) AS BIGINT) AS total_chars,
        |  list_contains(string_split(text, ' '), 'spark') AS any_spark,
        |  len(list_filter(string_split(text, ' '), w -> len(w) = 0)) = 0 AS all_nonempty,
        |  array_to_string(list_transform(list_zip(string_split(text, ' ')[1:3], string_split(text, ' ')[2:4]),
        |    p -> CASE WHEN p[2] IS NULL THEN p[1] ELSE p[1] || '_' || p[2] END), '|') AS bigrams
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q_fn_map" ->
      """WITH m AS (
        |  SELECT doc_id, map(ks, list_transform(ks, w -> CAST(len(w) AS INT))) AS m
        |  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')[1:5]) AS ks
        |        FROM documents WHERE doc_id < 100))
        |SELECT doc_id,
        |  array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted,
        |  CAST(cardinality(m) AS INT) AS n_entries,
        |  CAST(coalesce(m['the'][1], -1) AS INT) AS len_of_the,
        |  CAST(list_reduce(list_prepend(0, list_transform(map_values(m), v -> v * 2)), (a,b) -> a+b) AS INT) AS sum_doubled
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_fn_hash_cast" ->
      """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name,
        |  CAST(trunc(c_acctbal) AS INT) AS bal_int,
        |  CAST(c_acctbal AS VARCHAR) AS bal_str,
        |  CAST(c_custkey AS DOUBLE) AS key_dbl,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST('123' AS BIGINT) AS parsed,
        |  CAST(round(CAST(c_acctbal AS DECIMAL(12,2)), 0) AS BIGINT) AS bal_round
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,
    "q_fn_misc" ->
      """SELECT n_nationkey,
        |  hex(n_nationkey) AS key_hex,
        |  to_base64(encode(n_name)) AS name_b64,
        |  array_to_string(generate_series(1, n_regionkey + 1), ',') AS seq,
        |  array_to_string([n_name, n_name], '|') AS repeated,
        |  printf('nation-%03d', n_nationkey) AS tag,
        |  bin(n_nationkey) AS bin_str
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_fn_schema_of_json" ->
      """SELECT 'STRUCT<a: BIGINT, b: STRING, c: ARRAY<DOUBLE>>' AS schema_abc,
        |  'ARRAY<STRUCT<k: BIGINT>>' AS schema_arr""".stripMargin,
    "q_fn_xpath" ->
      """SELECT n_nationkey, n_name AS name_x, n_nationkey AS key_x,
        |  true AS has_n, 2 AS n_children
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_fn_reflect" ->
      """SELECT n_nationkey, CAST(abs(n_nationkey - 12) AS INT) AS abs_r,
        |  CAST(n_regionkey AS VARCHAR) AS str_r,
        |  CAST(greatest(n_nationkey, n_regionkey) AS INT) AS max_r
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_fn_struct" ->
      """SELECT n_nationkey, n_name AS name, n_regionkey AS region,
        |  '{"name":"' || n_name || '","region":' || n_regionkey || '}' AS info_json
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_ngrams_generate" ->
      """WITH w AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS words
        |  FROM documents
        |), g AS (
        |  SELECT unnest(generate_series(1, len(words) - 1)) AS i, words
        |  FROM w WHERE len(words) >= 2
        |)
        |SELECT words[i] || ' ' || words[i + 1] AS ngram,
        |  count(*) AS n,
        |  CAST(min(i - 1) AS BIGINT) AS first_pos
        |FROM g GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""".stripMargin)
}
