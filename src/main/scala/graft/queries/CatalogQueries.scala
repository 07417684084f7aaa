package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DSv2 CATALOG PLUGIN coverage (§2.1/§2.13): a user-provided
  * `TableCatalog` + `FunctionCatalog` (`graft.sources.MemCatalog`)
  * driven entirely through SQL — namespace + table DDL, two-phase v2
  * INSERT/INSERT OVERWRITE, ALTER ADD COLUMN null-padding, and
  * catalog-resolved V2 scalar (magic-method) / aggregate functions.
  * The reference hard-wires one session catalog
  * (`sql/catalyst/.../catalog/SessionCatalog.scala`); the V2 contract
  * turns that into a plugin point, which is what every modern
  * lakehouse format attaches through.
  */
object CatalogQueries {
  type Q = (SparkSession, String) => DataFrame

  private def withCatalog(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.MemCatalog")

  val queries: Map[String, Q] = Map(
    // Full DDL/DML lifecycle against the plugin catalog: CREATE
    // NAMESPACE/TABLE → INSERT (v2 append) → ALTER ADD COLUMN (old
    // rows null-pad) → second INSERT with the widened schema → read
    // back.  Re-runnable: the table is dropped up front.
    "q_catalog_table" -> { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      withCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ns")
      s.sql("DROP TABLE IF EXISTS graft_cat.ns.nation_stats")
      s.sql("CREATE TABLE graft_cat.ns.nation_stats (rkey BIGINT, n_nations BIGINT)")
      s.sql("""INSERT INTO graft_cat.ns.nation_stats
              |SELECT n_regionkey, count(*) FROM nation GROUP BY n_regionkey""".stripMargin)
      s.sql("ALTER TABLE graft_cat.ns.nation_stats ADD COLUMN note STRING")
      s.sql("INSERT INTO graft_cat.ns.nation_stats VALUES (99, 0, 'sentinel')")
      s.sql("""SELECT rkey, n_nations, coalesce(note, '-') AS note
              |FROM graft_cat.ns.nation_stats ORDER BY rkey""".stripMargin)
    },

    // Catalog-resolved V2 functions over real data: gcd is a
    // ScalarFunction bound through the magic-method (primitive
    // invoke) fast path; sumsq is a V2 AggregateFunction running the
    // standard partial/merge protocol.  DuckDB recomputes both from
    // its built-ins.
    "q_catalog_function" -> { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      withCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ns")
      s.sql("""SELECT l_linenumber AS ln, count(*) AS n,
              |  CAST(sum(graft_cat.ns.gcd(l_orderkey, l_partkey)) AS BIGINT) AS sum_gcd,
              |  graft_cat.ns.sumsq(l_linenumber) AS sumsq_ln
              |FROM lineitem
              |GROUP BY l_linenumber ORDER BY ln""".stripMargin)
    })

  val oracle: Map[String, String] = Map(
    "q_catalog_table" ->
      """SELECT rkey, n_nations, note FROM (
        |  SELECT n_regionkey AS rkey, CAST(count(*) AS BIGINT) AS n_nations,
        |    '-' AS note
        |  FROM nation GROUP BY n_regionkey
        |  UNION ALL SELECT 99, 0, 'sentinel')
        |ORDER BY rkey""".stripMargin,
    "q_catalog_function" ->
      """SELECT l_linenumber AS ln, count(*) AS n,
        |  CAST(sum(gcd(l_orderkey, l_partkey)) AS BIGINT) AS sum_gcd,
        |  CAST(sum(l_linenumber * l_linenumber) AS BIGINT) AS sumsq_ln
        |FROM lineitem
        |GROUP BY l_linenumber ORDER BY ln""".stripMargin)
}
