package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Column-level lineage, rebuilt from the reference's design
  * (`sql/catalyst/.../analysis/ResolveLineage.scala:29-135`,
  * `catalyst/lineage/{Column,ExpressionColumn,RelationColumn,UnionColumn}.scala`)
  * as a pure post-hoc walk over the *analyzed* logical plan instead of
  * analyzer-rule mutation.
  *
  * Differences from the reference, by design:
  *  - Immutable: no `var lineageChildren` on plan nodes
  *    (`LineageEntity.scala:22-23`), so plan copies can't lose lineage —
  *    the reference's known copy-loss bug (SURVEY.md §7 hard-parts (b)).
  *  - Complete edges: the reference passes `Aggregate`/`Window`/
  *    `Generate`/`Join` through untouched (`ResolveLineage.scala:108-116`);
  *    here each maps its output expressions to leaf source columns, and
  *    n-ary `Union` works (reference zips only binary unions, :96-107).
  *  - Same core algorithm: ExprId join between an expression's leaf
  *    references and the child plan's resolved columns
  *    (`ResolveLineage.scala:32-74` fetchRelation/findAllChildren).
  */
object ColumnLineage {

  /** A physical source column: table identity + column name. */
  final case class SourceColumn(table: String, column: String) {
    override def toString: String = s"$table.$column"
  }

  /** Lineage of one output column of a query. */
  final case class OutputLineage(name: String, sources: Set[SourceColumn])

  /** Column lineage DAG flattened to output → leaf-source sets. */
  final case class LineageGraph(outputs: Seq[OutputLineage]) {
    def apply(name: String): Set[SourceColumn] =
      outputs.find(_.name == name).map(_.sources).getOrElse(Set.empty)

    /** Edge list as a DataFrame (out_column, src_table, src_column). */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      outputs.flatMap(o => o.sources.toSeq.sortBy(s => (s.table, s.column))
          .map(s => (o.name, s.table, s.column)))
        .toDF("out_column", "src_table", "src_column")
    }
  }

  /** Lineage of a DataFrame's output columns (walks the analyzed plan —
    * same lifecycle point as the reference's `Batch("LineageTrack")`,
    * `Analyzer.scala:211-213`).
    */
  def of(df: DataFrame): LineageGraph = ofPlan(df.queryExecution.analyzed)

  /** Lineage of a SQL statement against the session's current views. */
  def ofSql(spark: SparkSession, sql: String): LineageGraph =
    of(spark.sql(sql))

  /** Lineage of an already-analyzed plan. */
  def ofPlan(plan: LogicalPlan): LineageGraph = {
    val resolved = resolve(plan, None, Map.empty)
    LineageGraph(plan.output.map(a =>
      OutputLineage(a.name, resolved.getOrElse(a.exprId, Set.empty))))
  }

  /** Output ExprId → leaf sources, for [[LineageRegistry.capture]]. */
  private[lineage] def outputSources(plan: LogicalPlan)
      : Map[ExprId, Set[SourceColumn]] = {
    val resolved = resolve(plan, None, Map.empty)
    plan.output.map(a =>
      a.exprId -> resolved.getOrElse(a.exprId, Set.empty[SourceColumn])).toMap
  }

  /** Best-effort identity of a leaf relation (mirrors the reference's
    * `RelationColumn.source`: `ResolveHiveRelation.scala:18` captures
    * `catalogTable`; we also capture file paths and v2 table names).
    */
  private def leafName(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.unquotedString).getOrElse(lr.relation match {
        // a file relation's toString is just its format ("parquet") —
        // the root path is the actual table identity
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.toString)
            .getOrElse(fs.toString.takeWhile(_ != '['))
        case rel => rel.toString.takeWhile(_ != '[')
      })
    case dsv2: DataSourceV2Relation => dsv2.table.name()
    case lcr: LocalRelation => "local"
    // streaming leaves (the reference's lineage silently no-ops on
    // streaming plans): name them by their source so a readStream →
    // transform plan traces exactly like its batch twin
    case sr: org.apache.spark.sql.execution.streaming.runtime.StreamingRelation =>
      sr.sourceName
    case srv2: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2 =>
      srv2.sourceName
    // RUNNING-query leaves (MicroBatchExecution.logicalPlan rewrites the
    // pre-start relations above into these): name v1 sources by the
    // source's own identity string (FileStreamSource[path], rate, …) and
    // v2 scan relations by their table
    case ser: org.apache.spark.sql.execution.streaming.runtime.StreamingExecutionRelation =>
      ser.source.toString
    case sv2: org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation =>
      scala.util.Try(sv2.relation.table.name()).getOrElse(sv2.stream.toString)
    case other => other.nodeName
  }

  /** Core recursion: map from ExprId to leaf source columns for every
    * attribute visible at `plan`'s output (plus intermediates).
    */
  /** CTE context: def id → (def output, def lineage map). */
  private type CteCtx = Map[Long, (Seq[Attribute], Map[ExprId, Set[SourceColumn]])]

  private def resolve(plan: LogicalPlan, alias: Option[String], ctes: CteCtx)
      : Map[ExprId, Set[SourceColumn]] = plan match {

    case s: SubqueryAlias =>
      // name the subtree after the alias only if its leaves are anonymous
      resolve(s.child, Some(s.alias), ctes)

    case w: WithCTE =>
      // resolve defs first (later defs may reference earlier ones)
      val defCtx = w.cteDefs.foldLeft(ctes) { (ctx, d) =>
        ctx + (d.id -> (d.child.output, resolve(d.child, None, ctx)))
      }
      resolve(w.plan, alias, defCtx)

    case r: CTERelationRef if ctes.contains(r.cteId) =>
      // positional mapping from the ref's fresh attribute ids to the
      // def's resolved sources (same algorithm as Union pairing)
      val (defOut, defMap) = ctes(r.cteId)
      r.output.zip(defOut).map { case (refAttr, defAttr) =>
        refAttr.exprId -> defMap.getOrElse(defAttr.exprId, Set.empty[SourceColumn])
      }.toMap

    case l: LeafNode =>
      // a checkpointed ops pipeline surfaces as a LogicalRDD leaf; if
      // its output was captured at checkpoint time, splice the
      // pre-checkpoint lineage in instead of naming the RDD a source.
      // Self-joined checkpoints get re-instanced with fresh ExprIds
      // during analysis — fall back to the (rdd id, column) identity.
      val table = alias.getOrElse(leafName(l))
      val rddId = l match {
        case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd.id)
        case _ => None
      }
      l.output.map(a => a.exprId ->
        LineageRegistry.lookup(a.exprId)
          .orElse(rddId.flatMap(LineageRegistry.lookupByRdd(_, a.name)))
          .getOrElse(Set(SourceColumn(table, a.name)))).toMap

    case p: Project =>
      val child = resolveChildren(p, alias, ctes)
      child ++ namedEdges(p.projectList, child)

    case a: Aggregate =>
      val child = resolveChildren(a, alias, ctes)
      child ++ namedEdges(a.aggregateExpressions, child)

    case w: Window =>
      val child = resolveChildren(w, alias, ctes)
      child ++ namedEdges(w.windowExpressions, child)

    case g: Generate =>
      val child = resolveChildren(g, alias, ctes)
      val genSources = exprSources(g.generator, child)
      child ++ g.generatorOutput.map(a => a.exprId -> genSources).toMap

    case u: Union =>
      // n-ary positional pairing (reference: binary-only UnionColumn zip,
      // ResolveLineage.scala:96-107)
      val childMaps = u.children.map(c => (c, resolve(c, alias, ctes)))
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> childMaps.flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty)
        }.toSet
      }.toMap

    case e: Expand =>
      val child = resolveChildren(e, alias, ctes)
      child ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(proj =>
          exprSources(proj(i), child)).toSet
      }.toMap

    case _ =>
      // Join, Filter, Sort, Limit, Distinct, Repartition, subquery glue…:
      // output attributes pass through from children unchanged.
      resolveChildren(plan, alias, ctes)
  }

  private def resolveChildren(plan: LogicalPlan, alias: Option[String],
      ctes: CteCtx): Map[ExprId, Set[SourceColumn]] =
    plan.children.map(resolve(_, alias match {
      case Some(_) if plan.children.sizeIs == 1 => alias
      case _ => None
    }, ctes)).foldLeft(Map.empty[ExprId, Set[SourceColumn]])(_ ++ _)

  /** ExprId-join of each named expression's leaf references against the
    * child map (the reference's fetchRelation/findAllChildren,
    * `ResolveLineage.scala:32-74`).
    */
  private def namedEdges(exprs: Seq[NamedExpression],
      child: Map[ExprId, Set[SourceColumn]])
      : Map[ExprId, Set[SourceColumn]] =
    exprs.map { ne => ne.exprId -> exprSources(ne, child) }.toMap

  /** All leaf sources feeding one expression, including through scalar
    * subqueries (the reference skips subquery expressions entirely).
    */
  private def exprSources(e: Expression,
      child: Map[ExprId, Set[SourceColumn]]): Set[SourceColumn] = {
    val direct = e.references.iterator
      .flatMap(a => child.getOrElse(a.exprId, Set.empty)).toSet
    val viaSubquery = e.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        sq.plan.output.flatMap(a =>
          resolve(sq.plan, None, Map.empty).getOrElse(a.exprId, Set.empty)).toSet
    }.flatten.toSet
    direct ++ viaSubquery
  }
}
