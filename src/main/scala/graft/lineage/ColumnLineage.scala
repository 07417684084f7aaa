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
    *
    * `includeControlFlow = true` (opt-in; default DATA-flow only, the
    * reference's semantics) additionally traces PREDICATE edges: a
    * column that survives a `Filter` or a conditioned `Join` also
    * depends on the predicate's source columns — the row's PRESENCE is
    * a function of them even when its value is not.
    */
  def of(df: DataFrame, includeControlFlow: Boolean = false): LineageGraph =
    ofPlan(df.queryExecution.analyzed, includeControlFlow)

  /** Lineage of a SQL statement against the session's current views. */
  def ofSql(spark: SparkSession, sql: String,
      includeControlFlow: Boolean = false): LineageGraph =
    of(spark.sql(sql), includeControlFlow)

  /** Lineage of an already-analyzed plan. */
  def ofPlan(plan: LogicalPlan,
      includeControlFlow: Boolean = false): LineageGraph = {
    val resolved = resolve(plan, None, Map.empty, includeControlFlow)
    LineageGraph(plan.output.map(a =>
      OutputLineage(a.name, resolved.getOrElse(a.exprId, Set.empty))))
  }

  /** Output ExprId → leaf sources, for [[LineageRegistry.capture]]. */
  private[lineage] def outputSources(plan: LogicalPlan)
      : Map[ExprId, Set[SourceColumn]] = {
    val resolved = resolve(plan, None, Map.empty, cf = false)
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

  /** Durable table identity of a leaf, for the SINK-side registry
    * splice ([[SinkLineage]]): catalog tables by identifier, file
    * relations by root path, v2 relations by table name — normalized
    * the same way the write capture normalized them.
    */
  private def leafTableId(leaf: LeafNode): Option[String] = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable
        .map(t => SinkLineage.normalizeId(t.identifier.unquotedString))
        .orElse(lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption
              .map(p => SinkLineage.normalizeId(p.toString))
          case _ => None
        })
    case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
      Some(SinkLineage.normalizeId(h.tableMeta.identifier.unquotedString))
    case d: DataSourceV2Relation =>
      Some(SinkLineage.normalizeId(d.table.name()))
    case _ => None
  }

  /** Core recursion: map from ExprId to leaf source columns for every
    * attribute visible at `plan`'s output (plus intermediates).
    */
  /** CTE context: def id → (def output, def lineage map). */
  private type CteCtx = Map[Long, (Seq[Attribute], Map[ExprId, Set[SourceColumn]])]

  private def resolve(plan: LogicalPlan, alias: Option[String], ctes: CteCtx,
      cf: Boolean): Map[ExprId, Set[SourceColumn]] = plan match {

    case s: SubqueryAlias =>
      // name the subtree after the alias only if its leaves are anonymous
      resolve(s.child, Some(s.alias), ctes, cf)

    case w: WithCTE =>
      // resolve defs first (later defs may reference earlier ones)
      val defCtx = w.cteDefs.foldLeft(ctes) { (ctx, d) =>
        ctx + (d.id -> (d.child.output, resolve(d.child, None, ctx, cf)))
      }
      resolve(w.plan, alias, defCtx, cf)

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
      // a table that a captured WRITE produced splices the writing
      // query's lineage in (durable identity key) — lineage composes
      // across materializations
      val tableId = leafTableId(l)
      l.output.map(a => a.exprId ->
        LineageRegistry.lookup(a.exprId)
          .orElse(rddId.flatMap(LineageRegistry.lookupByRdd(_, a.name)))
          .orElse(tableId.flatMap(LineageRegistry.lookupTable(_, a.name)))
          .getOrElse(Set(SourceColumn(table, a.name)))).toMap

    case p: Project =>
      val child = resolveChildren(p, alias, ctes, cf)
      child ++ namedEdges(p.projectList, child, cf)

    case a: Aggregate =>
      val child = resolveChildren(a, alias, ctes, cf)
      child ++ namedEdges(a.aggregateExpressions, child, cf)

    case w: Window =>
      val child = resolveChildren(w, alias, ctes, cf)
      child ++ namedEdges(w.windowExpressions, child, cf)

    case g: Generate =>
      val child = resolveChildren(g, alias, ctes, cf)
      val genSources = exprSources(g.generator, child, cf)
      child ++ g.generatorOutput.map(a => a.exprId -> genSources).toMap

    // control-flow mode: a predicate's sources feed every surviving
    // column — the row's presence is derived from them (SURVEY §7
    // hard-part (a): the reference leaves these edges undefined)
    case f: Filter if cf =>
      val child = resolveChildren(f, alias, ctes, cf)
      val pred = exprSources(f.condition, child, cf)
      child.map { case (k, v) => k -> (v ++ pred) }

    case j: Join if cf && j.condition.isDefined =>
      val child = resolveChildren(j, alias, ctes, cf)
      val pred = exprSources(j.condition.get, child, cf)
      child.map { case (k, v) => k -> (v ++ pred) }

    case u: Union =>
      // n-ary positional pairing (reference: binary-only UnionColumn zip,
      // ResolveLineage.scala:96-107)
      val childMaps = u.children.map(c => (c, resolve(c, alias, ctes, cf)))
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> childMaps.flatMap { case (c, m) =>
          m.getOrElse(c.output(i).exprId, Set.empty)
        }.toSet
      }.toMap

    case e: Expand =>
      val child = resolveChildren(e, alias, ctes, cf)
      child ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(proj =>
          exprSources(proj(i), child, cf)).toSet
      }.toMap

    // row-level rewrite assembly (UPDATE / MERGE INTO → ReplaceData):
    // each output position is produced by one expression per merge
    // instruction — MergeRows.outputs is positionally aligned with
    // MergeRows.output — so union every instruction's sources for the
    // position (the Expand device).  Without this case the node's
    // freshly-produced attrs resolve to nothing and a MERGE target's
    // sink lineage silently loses the merge source.
    case m: MergeRows =>
      val child = resolveChildren(m, alias, ctes, cf)
      child ++ m.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> m.outputs.flatMap(row =>
          if (i < row.size) exprSources(row(i), child, cf)
          else Set.empty[SourceColumn]).toSet
      }.toMap

    case _ =>
      // Join, Filter, Sort, Limit, Distinct, Repartition, subquery glue…:
      // output attributes pass through from children unchanged.
      resolveChildren(plan, alias, ctes, cf)
  }

  private def resolveChildren(plan: LogicalPlan, alias: Option[String],
      ctes: CteCtx, cf: Boolean): Map[ExprId, Set[SourceColumn]] =
    plan.children.map(resolve(_, alias match {
      case Some(_) if plan.children.sizeIs == 1 => alias
      case _ => None
    }, ctes, cf)).foldLeft(Map.empty[ExprId, Set[SourceColumn]])(_ ++ _)

  /** ExprId-join of each named expression's leaf references against the
    * child map (the reference's fetchRelation/findAllChildren,
    * `ResolveLineage.scala:32-74`).
    */
  private def namedEdges(exprs: Seq[NamedExpression],
      child: Map[ExprId, Set[SourceColumn]], cf: Boolean)
      : Map[ExprId, Set[SourceColumn]] =
    exprs.map { ne => ne.exprId -> exprSources(ne, child, cf) }.toMap

  /** All leaf sources feeding one expression, including through scalar
    * subqueries (the reference skips subquery expressions entirely).
    */
  private def exprSources(e: Expression,
      child: Map[ExprId, Set[SourceColumn]], cf: Boolean): Set[SourceColumn] = {
    val direct = e.references.iterator
      .flatMap(a => child.getOrElse(a.exprId, Set.empty)).toSet
    val viaSubquery = e.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        sq.plan.output.flatMap(a =>
          resolve(sq.plan, None, Map.empty, cf)
            .getOrElse(a.exprId, Set.empty)).toSet
    }.flatten.toSet
    direct ++ viaSubquery
  }

  // ──────────────────── hop-level derivation DAG ────────────────────
  //
  // Where LineageGraph flattens to output → leaf-source CLOSURE, the
  // hop view preserves every intermediate named derivation — the
  // structure the reference keeps as `Column extends TreeNode[Column]`
  // (`catalyst/lineage/Column.scala:23`), one `ExpressionColumn`
  // (`ExpressionColumn.scala:22`) per deriving expression with
  // `RelationColumn` leaves.  Differences, by design:
  //  - pass-through attributes are NOT hops (an untouched column
  //    flowing through a node derives nothing; a RENAME is a hop);
  //  - the DAG is immutable and shared (same sub-derivation feeding
  //    two outputs is one node), so plan copies can't lose it;
  //  - a lineage-erasing checkpoint boundary degrades gracefully to a
  //    single "checkpoint" hop over the registry-spliced leaf sources
  //    (intermediate hops below the checkpoint are gone by then).

  /** One node of a column's derivation tree. */
  sealed trait HopNode {
    /** One-line description (the reference's `ExpressionColumn.toString`). */
    def label: String
    def children: Seq[HopNode]

    /** Nested rendering of the derivation, reference
      * `lineageChildren(i).treeString` style
      * (`examples/.../SparkLineageExample.scala:58`).
      */
    final def treeString: String = {
      val sb = new StringBuilder
      def go(n: HopNode, depth: Int): Unit = {
        if (depth > 0) sb.append("  " * (depth - 1)).append("+- ")
        sb.append(n.label).append('\n')
        n.children.foreach(go(_, depth + 1))
      }
      go(this, 0)
      sb.result()
    }
  }

  /** A column produced by expression `exprSql` at plan node `node`. */
  final case class DerivedHop(name: String, exprSql: String, node: String,
      children: Seq[HopNode]) extends HopNode {
    def label: String = s"$name := $exprSql [$node]"
  }

  /** A physical leaf column (the reference's `RelationColumn`). */
  final case class LeafHop(source: SourceColumn) extends HopNode {
    def label: String = source.toString
    def children: Seq[HopNode] = Nil
  }

  /** Derivation trees of a frame's output columns, in output order. */
  def hopsOf(df: DataFrame): Seq[(String, HopNode)] =
    hopsOfPlan(df.queryExecution.analyzed)

  /** Derivation trees of an analyzed plan's output columns. */
  def hopsOfPlan(plan: LogicalPlan): Seq[(String, HopNode)] = {
    val m = hopWalk(plan, None, Map.empty)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId,
      LeafHop(SourceColumn("unknown", a.name))))
  }

  /** Output ExprId → hop tree, for [[LineageRegistry.capture]]. */
  private[lineage] def outputHops(plan: LogicalPlan)
      : Map[ExprId, HopNode] = {
    val m = hopWalk(plan, None, Map.empty)
    plan.output.flatMap(a => m.get(a.exprId).map(a.exprId -> _)).toMap
  }

  /** Rendered derivation tree of one output column. */
  def hopTree(df: DataFrame, column: String): String =
    hopsOf(df).collectFirst { case (n, h) if n == column => h.treeString }
      .getOrElse(s"<no such output column: $column>")

  /** Flat hop edge list, deduplicated:
    * (out_column, deriving expression sql, plan node, input label) —
    * input is the upstream hop's column name, a `table.column` leaf, or
    * empty for reference-free derivations (literals, count(*)).
    */
  def hopEdges(df: DataFrame): Seq[(String, String, String, String)] = {
    val visited = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[HopNode, java.lang.Boolean]())
    val out = Seq.newBuilder[(String, String, String, String)]
    def go(n: HopNode): Unit = if (visited.add(n)) n match {
      case d: DerivedHop =>
        if (d.children.isEmpty) out += ((d.name, d.exprSql, d.node, ""))
        d.children.foreach { c =>
          val lbl = c match {
            case dc: DerivedHop => dc.name
            case lf: LeafHop => lf.source.toString
          }
          out += ((d.name, d.exprSql, d.node, lbl))
        }
        d.children.foreach(go)
      case _ => ()
    }
    hopsOf(df).foreach { case (_, n) => go(n) }
    out.result().distinct
  }

  /** Robust SQL text of a deriving expression. */
  private def sqlOf(e: Expression): String =
    scala.util.Try(e.sql).getOrElse(e.toString)

  private type HopCtx = Map[Long, (Seq[Attribute], Map[ExprId, HopNode])]

  private def hopWalk(plan: LogicalPlan, alias: Option[String], ctes: HopCtx)
      : Map[ExprId, HopNode] = plan match {

    case s: SubqueryAlias =>
      hopWalk(s.child, Some(s.alias), ctes)

    case w: WithCTE =>
      val defCtx = w.cteDefs.foldLeft(ctes) { (ctx, d) =>
        ctx + (d.id -> (d.child.output, hopWalk(d.child, None, ctx)))
      }
      hopWalk(w.plan, alias, defCtx)

    case r: CTERelationRef if ctes.contains(r.cteId) =>
      val (defOut, defMap) = ctes(r.cteId)
      r.output.zip(defOut).flatMap { case (refAttr, defAttr) =>
        defMap.get(defAttr.exprId).map(refAttr.exprId -> _)
      }.toMap

    case l: LeafNode =>
      val table = alias.getOrElse(leafName(l))
      val rddId = l match {
        case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd.id)
        case _ => None
      }
      val tableId = leafTableId(l)
      l.output.map { a =>
        // full pre-checkpoint hop tree when the registry captured one
        // (lineage-erasing localCheckpoints in the ops layer), or the
        // writing query's hop tree for a captured SINK table; source
        // sets as the degraded fallback; a raw leaf otherwise
        val hopTree = LineageRegistry.lookupHop(a.exprId)
          .orElse(rddId.flatMap(LineageRegistry.lookupHopByRdd(_, a.name)))
          .orElse(tableId.flatMap(LineageRegistry.lookupTableHop(_, a.name)))
        val spliced = LineageRegistry.lookup(a.exprId)
          .orElse(rddId.flatMap(LineageRegistry.lookupByRdd(_, a.name)))
          .orElse(tableId.flatMap(LineageRegistry.lookupTable(_, a.name)))
        a.exprId -> hopTree.getOrElse(spliced match {
          case Some(srcs) =>
            DerivedHop(a.name, "checkpoint", l.nodeName,
              srcs.toSeq.sortBy(s => (s.table, s.column)).map(LeafHop.apply))
          case None => LeafHop(SourceColumn(table, a.name))
        })
      }.toMap

    case p: Project =>
      val child = hopChildren(p, alias, ctes)
      child ++ namedHops(p.projectList, "Project", child)

    case a: Aggregate =>
      val child = hopChildren(a, alias, ctes)
      child ++ namedHops(a.aggregateExpressions, "Aggregate", child)

    case w: Window =>
      val child = hopChildren(w, alias, ctes)
      child ++ namedHops(w.windowExpressions, "Window", child)

    case g: Generate =>
      val child = hopChildren(g, alias, ctes)
      val kids = exprHopInputs(g.generator, child)
      val sql = sqlOf(g.generator)
      child ++ g.generatorOutput.map(a =>
        a.exprId -> (DerivedHop(a.name, sql, "Generate", kids): HopNode)).toMap

    case u: Union =>
      val childMaps = u.children.map(c => (c, hopWalk(c, alias, ctes)))
      u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> (DerivedHop(out.name, "union", "Union",
          childMaps.flatMap { case (c, m) =>
            m.get(c.output(i).exprId)
          }): HopNode)
      }.toMap

    case e: Expand =>
      val child = hopChildren(e, alias, ctes)
      child ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> (DerivedHop(out.name, "expand", "Expand",
          dedupIdentity(e.projections.flatMap(proj =>
            exprHopInputs(proj(i), child)))): HopNode)
      }.toMap

    // row-level rewrite assembly: same positional-union shape as
    // Expand — each output column's hop gathers every merge
    // instruction's expression for that position (see the sources-side
    // MergeRows case)
    case m: MergeRows =>
      val child = hopChildren(m, alias, ctes)
      child ++ m.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> (DerivedHop(out.name, "merge", "MergeRows",
          dedupIdentity(m.outputs.flatMap(row =>
            if (i < row.size) exprHopInputs(row(i), child)
            else Nil))): HopNode)
      }.toMap

    case _ =>
      hopChildren(plan, alias, ctes)
  }

  private def hopChildren(plan: LogicalPlan, alias: Option[String],
      ctes: HopCtx): Map[ExprId, HopNode] =
    plan.children.map(hopWalk(_, alias match {
      case Some(_) if plan.children.sizeIs == 1 => alias
      case _ => None
    }, ctes)).foldLeft(Map.empty[ExprId, HopNode])(_ ++ _)

  /** One hop per DERIVING named expression: an alias records a hop
    * (renames included); a bare attribute passes its node through.
    */
  private def namedHops(exprs: Seq[NamedExpression], node: String,
      child: Map[ExprId, HopNode]): Map[ExprId, HopNode] =
    exprs.flatMap {
      case a: Attribute =>
        child.get(a.exprId).map(a.exprId -> _)
      case al: Alias =>
        Some(al.exprId -> (DerivedHop(al.name, sqlOf(al.child), node,
          exprHopInputs(al.child, child)): HopNode))
      case ne =>
        Some(ne.exprId -> (DerivedHop(ne.name, sqlOf(ne), node,
          exprHopInputs(ne, child)): HopNode))
    }.toMap

  /** Upstream hop nodes an expression reads: its attribute references
    * (name-ordered for determinism) plus subquery plan outputs.
    */
  private def exprHopInputs(e: Expression, child: Map[ExprId, HopNode])
      : Seq[HopNode] = {
    val direct = e.references.toSeq.sortBy(a => (a.name, a.exprId.id))
      .flatMap(a => child.get(a.exprId))
    val viaSubquery = e.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        val m = hopWalk(sq.plan, None, Map.empty)
        sq.plan.output.flatMap(a => m.get(a.exprId))
    }.flatten
    dedupIdentity(direct ++ viaSubquery)
  }

  private def dedupIdentity(ns: Seq[HopNode]): Seq[HopNode] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[HopNode, java.lang.Boolean]())
    ns.filter(seen.add)
  }
}
