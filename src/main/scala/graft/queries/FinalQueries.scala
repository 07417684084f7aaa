package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2 stragglers: NATURAL JOIN, the typed `reduceGroups` path, and the
  * string/NaN function tail (levenshtein / translate / repeat / nanvl).
  */
object FinalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // NATURAL JOIN resolves on the shared column name (k).
    "q_natural_join" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT k, n_name, r_name FROM
          |  (SELECT n_regionkey AS k, n_name FROM nation) a
          |NATURAL JOIN
          |  (SELECT r_regionkey AS k, r_name FROM region) b
          |ORDER BY k, n_name""".stripMargin)
    },

    // KeyValueGroupedDataset.reduceGroups — the typed reduction path
    // (plans as partial+final ObjectHashAggregate like any agg).
    // Integer cents keep the reduction associative-commutative-exact
    // under any partitioning/merge order.
    "q_reduce_groups" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, a._2 + b._2))
        .map { case (st, (_, cents)) => (st, cents) }
        .toDF("st", "cents_sum")
        .orderBy(col("st"))
    },

    // Map higher-order tail: transform_keys / map_filter /
    // map_zip_with, entries serialized sorted (never raw map output).
    "q_fn_map_higher" -> { (s, dir) =>
      def ser(m: org.apache.spark.sql.Column) =
        concat_ws("|", transform(sort_array(map_entries(m)),
          e => concat_ws("=", e.getField("key"), e.getField("value"))))
      val n = col("n_nationkey").cast("long")
      Tables.load(s, dir, "nation")
        .select(col("n_nationkey"),
          map(lit("a"), n, lit("b"), n * 2).as("m1"),
          map(lit("b"), lit(10L), lit("c"), n).as("m2"))
        .select(col("n_nationkey"),
          ser(transform_keys(col("m1"), (k, _) => upper(k))).as("tk"),
          ser(map_filter(col("m1"), (_, v) => v % 2 === 0)).as("mf"),
          ser(map_zip_with(col("m1"), col("m2"),
            (_, x, y) => coalesce(x, lit(0L)) + coalesce(y, lit(0L)))).as("mz"))
        .orderBy(col("n_nationkey"))
    },

    // Map CONSTRUCTION tail: map_concat / map_from_entries /
    // map_from_arrays / str_to_map, serialized sorted (never raw maps).
    "q_fn_map_build" -> { (s, dir) =>
      def ser(m: org.apache.spark.sql.Column) =
        concat_ws("|", transform(sort_array(map_entries(m)),
          e => concat_ws("=", e.getField("key"), e.getField("value"))))
      val n = col("n_nationkey").cast("long")
      Tables.load(s, dir, "nation")
        .select(col("n_nationkey"),
          ser(map_concat(map(lit("a"), n), map(lit("b"), n * 2))).as("mc"),
          ser(map_from_entries(array(
            struct(lit("x").as("k"), n.as("v")),
            struct(lit("y").as("k"), (n + 1).as("v"))))).as("me"),
          ser(map_from_arrays(array(lit("p"), lit("q")),
            array(n, n * 3))).as("ma"),
          ser(str_to_map(
            concat(lit("u:"), n, lit(",v:"), n * 2), lit(","), lit(":"))).as("sm"))
        .orderBy(col("n_nationkey"))
    },

    // OUTER generator: posexplode_outer via LATERAL VIEW OUTER — rows
    // with an EMPTY array survive as a single null-padded row (plain
    // explode would drop them); the DuckDB twin injects [NULL] for
    // empty lists to mirror the outer semantics.
    "q_gen_outer" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_nationkey, p, x FROM (
          |  SELECT n_nationkey,
          |    slice(sequence(CAST(1 AS BIGINT), CAST(3 AS BIGINT)), 1,
          |          CAST(n_nationkey % 3 AS INT)) AS a
          |  FROM nation) t
          |LATERAL VIEW OUTER posexplode(a) v AS p, x
          |ORDER BY n_nationkey, p""".stripMargin)
    },

    // String-function tail + NaN handling.
    "q_fn_string_extra" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_nationkey,
          |  levenshtein(n_name, 'FRANCE') AS lev,
          |  translate(n_name, 'AEIOU', 'aeiou') AS tr,
          |  repeat(substr(n_name, 1, 2), 2) AS rep,
          |  nanvl(CASE WHEN n_nationkey % 2 = 0 THEN CAST('nan' AS DOUBLE)
          |        ELSE CAST(n_nationkey AS DOUBLE) END, -1.0D) AS nn
          |FROM nation ORDER BY n_nationkey""".stripMargin)
    },

    // parse_url family over synthesized URLs; the DuckDB oracle mirrors
    // each component with an equivalent regexp (host, path-sans-query,
    // single query param, protocol, fragment).
    "q_fn_url" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT doc_id, u,
          |  parse_url(u, 'HOST') AS host,
          |  parse_url(u, 'PATH') AS path,
          |  parse_url(u, 'QUERY', 'lang') AS q_lang,
          |  parse_url(u, 'PROTOCOL') AS proto,
          |  parse_url(u, 'REF') AS frag
          |FROM (SELECT doc_id,
          |        concat('https://', source, '.example.com/', lang, '/', doc_id,
          |               '?lang=', lang, '&id=', doc_id, '#s', doc_id % 5) AS u
          |      FROM documents WHERE doc_id <= 50)
          |ORDER BY doc_id""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_fn_url" ->
      """SELECT doc_id, u,
        |  regexp_extract(u, '^https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(u, '^https?://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(u, '[?&]lang=([^&#]*)', 1) AS q_lang,
        |  regexp_extract(u, '^([a-z]+):', 1) AS proto,
        |  regexp_extract(u, '#(.*)$', 1) AS frag
        |FROM (SELECT doc_id,
        |        'https://' || source || '.example.com/' || lang || '/' || doc_id
        |          || '?lang=' || lang || '&id=' || doc_id || '#s' || (doc_id % 5) AS u
        |      FROM documents WHERE doc_id <= 50)
        |ORDER BY doc_id""".stripMargin,
    "q_natural_join" ->
      """SELECT k, n_name, r_name FROM
        |  (SELECT n_regionkey AS k, n_name FROM nation) a
        |NATURAL JOIN
        |  (SELECT r_regionkey AS k, r_name FROM region) b
        |ORDER BY k, n_name""".stripMargin,
    "q_reduce_groups" ->
      """SELECT o_orderstatus AS st,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    "q_fn_map_higher" ->
      """SELECT n_nationkey,
        |  'A=' || n_nationkey || '|B=' || (n_nationkey * 2) AS tk,
        |  CASE WHEN n_nationkey % 2 = 0
        |       THEN 'a=' || n_nationkey || '|b=' || (n_nationkey * 2)
        |       ELSE 'b=' || (n_nationkey * 2) END AS mf,
        |  'a=' || n_nationkey || '|b=' || (n_nationkey * 2 + 10) || '|c=' || n_nationkey AS mz
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_fn_map_build" ->
      """SELECT n_nationkey,
        |  'a=' || n_nationkey || '|b=' || (n_nationkey * 2) AS mc,
        |  'x=' || n_nationkey || '|y=' || (n_nationkey + 1) AS me,
        |  'p=' || n_nationkey || '|q=' || (n_nationkey * 3) AS ma,
        |  'u=' || n_nationkey || '|v=' || (n_nationkey * 2) AS sm
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_gen_outer" ->
      """WITH t AS (
        |  SELECT n_nationkey, ([1,2,3])[1:(n_nationkey % 3)] AS a FROM nation),
        |s AS (SELECT n_nationkey,
        |  CASE WHEN len(a) = 0
        |    THEN [struct_pack(p := CAST(NULL AS INT), x := CAST(NULL AS BIGINT))]
        |    ELSE list_transform(range(0, len(a)),
        |           i -> struct_pack(p := CAST(i AS INT), x := CAST(a[i+1] AS BIGINT)))
        |  END AS ps FROM t)
        |SELECT n_nationkey, u['p'] AS p, u['x'] AS x
        |FROM (SELECT n_nationkey, unnest(ps) AS u FROM s) q
        |ORDER BY n_nationkey, p""".stripMargin,
    "q_fn_string_extra" ->
      """SELECT n_nationkey,
        |  levenshtein(n_name, 'FRANCE') AS lev,
        |  translate(n_name, 'AEIOU', 'aeiou') AS tr,
        |  repeat(substr(n_name, 1, 2), 2) AS rep,
        |  CASE WHEN n_nationkey % 2 = 0 THEN -1.0
        |       ELSE CAST(n_nationkey AS DOUBLE) END AS nn
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
