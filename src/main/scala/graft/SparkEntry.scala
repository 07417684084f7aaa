package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-group query maps; each group file documents which
  * SURVEY.md §2 rows it covers.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Tpch.queries ++
    graft.queries.TpchHard.queries ++
    graft.queries.Joins.queries ++
    graft.queries.Relational.queries ++
    graft.queries.OpsQueries.queries ++
    graft.queries.LineageQueries.queries ++
    graft.queries.Functions.queries ++
    graft.queries.Events.queries ++
    graft.queries.AsOfQueries.queries ++
    graft.queries.Subqueries.queries ++
    graft.queries.Approx.queries ++
    graft.queries.TopKQueries.queries ++
    graft.queries.SqlSurface.queries ++
    graft.queries.StreamingQueries.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.GateQueries.queries ++
    graft.queries.ModernSql.queries ++
    graft.queries.ModernSql4.queries ++
    graft.queries.VocabQueries.queries ++
    graft.queries.MergeQueries.queries ++
    graft.queries.FinalQueries.queries ++
    graft.queries.TpcdsShapes.queries ++
    graft.queries.TpcdsShapes2.queries ++
    graft.queries.TpcdsShapes3.queries ++
    graft.queries.TpcdsShapes4.queries ++
    graft.queries.CoercionQueries.queries ++
    graft.queries.SsbShapes.queries ++
    graft.queries.SubqueryCorners.queries ++
    graft.queries.GroupAnalytics.queries ++
    graft.queries.HiveQueries.queries ++
    graft.queries.SqlGolden.queries ++
    graft.queries.SketchQueries.queries ++
    graft.queries.SurfaceTail.queries ++
    graft.queries.CorpusQueries.queries ++
    graft.queries.AnalyticsQueries.queries ++
    graft.queries.WarehouseQueries.queries ++
    graft.queries.FuzzQueries.queries ++
    graft.queries.GoldenTail.queries ++
    graft.queries.CurationQueries.queries ++
    graft.queries.QualityQueries.queries ++
    graft.queries.CatalogQueries.queries ++
    graft.queries.TfIdfQueries.queries ++
    graft.queries.StateStoreQueries.queries ++
    graft.queries.MixQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Tpch.oracle ++
    graft.queries.TpchHard.oracle ++
    graft.queries.Joins.oracle ++
    graft.queries.Relational.oracle ++
    graft.queries.OpsQueries.oracle ++
    graft.queries.LineageQueries.oracle ++
    graft.queries.Functions.oracle ++
    graft.queries.Events.oracle ++
    graft.queries.AsOfQueries.oracle ++
    graft.queries.Subqueries.oracle ++
    graft.queries.Approx.oracle ++
    graft.queries.TopKQueries.oracle ++
    graft.queries.SqlSurface.oracle ++
    graft.queries.StreamingQueries.oracle ++
    graft.queries.PipelineQueries.oracle ++
    graft.queries.GateQueries.oracle ++
    graft.queries.ModernSql.oracle ++
    graft.queries.ModernSql4.oracle ++
    graft.queries.VocabQueries.oracle ++
    graft.queries.MergeQueries.oracle ++
    graft.queries.FinalQueries.oracle ++
    graft.queries.TpcdsShapes.oracle ++
    graft.queries.TpcdsShapes2.oracle ++
    graft.queries.TpcdsShapes3.oracle ++
    graft.queries.TpcdsShapes4.oracle ++
    graft.queries.CoercionQueries.oracle ++
    graft.queries.SsbShapes.oracle ++
    graft.queries.SubqueryCorners.oracle ++
    graft.queries.GroupAnalytics.oracle ++
    graft.queries.HiveQueries.oracle ++
    graft.queries.SqlGolden.oracle ++
    graft.queries.SketchQueries.oracle ++
    graft.queries.SurfaceTail.oracle ++
    graft.queries.CorpusQueries.oracle ++
    graft.queries.AnalyticsQueries.oracle ++
    graft.queries.WarehouseQueries.oracle ++
    graft.queries.FuzzQueries.oracle ++
    graft.queries.GoldenTail.oracle ++
    graft.queries.CurationQueries.oracle ++
    graft.queries.QualityQueries.oracle ++
    graft.queries.CatalogQueries.oracle ++
    graft.queries.TfIdfQueries.oracle ++
    graft.queries.StateStoreQueries.oracle ++
    graft.queries.MixQueries.oracle
}
