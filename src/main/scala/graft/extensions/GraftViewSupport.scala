package graft.extensions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, CurrentNamespace, NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DescribeRelation, DropView, LogicalPlan, RenameTable, ShowCreateTable, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.io.GraftCatalog

/** Persisted catalog views over the graft `ViewCatalog`.
  *
  * Spark 4.1's OSS analyzer has the DSv2 `ViewCatalog` INTERFACE but
  * no rules that route SQL to it (no built-in rule calls `loadView`;
  * `CREATE VIEW` on a non-session catalog falls through unplanned) —
  * exactly the gap Iceberg fills with its SparkSessionExtensions view
  * rules. Graft does the same, in two halves:
  *
  *   - DDL (`CREATE/ALTER/DROP/SHOW VIEWS`, `ALTER VIEW ... RENAME`):
  *     rewritten at PARSE time by [[GraftSqlParser]] via
  *     [[GraftViewSupport.rewriteDdl]] into the command nodes below —
  *     parse-time, not an analyzer rule, so no built-in resolution
  *     rule can intercept (or reject) the statement first. Statements
  *     addressing the session catalog or temp views pass through
  *     untouched.
  *   - Reads (`SELECT ... FROM <view>`, `spark.table(...)`):
  *     [[ResolveGraftViewRelations]], an injected resolution rule that
  *     expands an `UnresolvedRelation` naming a stored view into its
  *     parsed SQL — CTE-substituted, table references qualified under
  *     the view's CAPTURED catalog/namespace context (a bare `fact`
  *     in the body means the same table in every future session), and
  *     column aliases applied. Resolution is pure metadata (one ~KB
  *     document read at analysis time), nothing changes on executors.
  */
object GraftViewSupport {

  /** Is `name` a registered catalog? (Never instantiates new ones
    * beyond the lookup itself; unknown names return false.)
    */
  private def catalogNamed(session: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(session.sessionState.catalogManager.catalog(name))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Route `parts` the way Spark's LookupCatalog would, answering the
    * graft catalog that owns them — None when they land in the session
    * catalog, another v2 catalog, or a temp view (temp resolution
    * outranks catalogs for short names, same as Spark).
    */
  def target(session: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, String, Identifier)] = {
    val cm = session.sessionState.catalogManager
    def current: Option[(GraftCatalog, String, Identifier)] =
      cm.currentCatalog match {
        case g: GraftCatalog =>
          val ident =
            if (parts.length == 1) Identifier.of(cm.currentNamespace, parts.head)
            else Identifier.of(parts.init.toArray, parts.last)
          Some((g, g.name(), ident))
        case _ => None
      }
    if (parts.isEmpty) return None
    if (session.sessionState.catalog.isTempView(parts)) return None
    if (parts.length >= 2) {
      catalogNamed(session, parts.head) match {
        case Some(g: GraftCatalog) =>
          Some((g, parts.head, Identifier.of(parts.tail.init.toArray, parts.last)))
        case Some(_) => None // another catalog owns it
        case None => current
      }
    } else current
  }

  /** The stored view for `parts`, when they name one. */
  def viewFor(session: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, String, Identifier,
                org.apache.spark.sql.connector.catalog.View)] =
    target(session, parts).flatMap { case (g, catName, ident) =>
      if (g.viewExists(ident)) Some((g, catName, ident, g.loadView(ident)))
      else None
    }

  /** Parse-time DDL rewrite (see class doc). Conservative: any shape
    * we don't positively route to a graft catalog parses through
    * unchanged.
    */
  def rewriteDdl(session: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _collation,
        props, originalText, query, allowExisting, replace, _mode) =>
      target(session, parts) match {
        case Some((_, catName, ident)) =>
          val sql = originalText.getOrElse(throw new IllegalArgumentException(
            s"CREATE VIEW ${parts.mkString(".")}: no original SQL text captured"))
          CreateGraftViewCommand(catName, ident, userCols, comment, props, sql,
            query, allowExisting, replace)
        case None => cv
      }
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      target(session, parts) match {
        case Some((_, catName, ident)) => DropGraftViewCommand(catName, ident, ifExists)
        case None => dv
      }
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      parts match {
        case head +: rest =>
          catalogNamed(session, head) match {
            case Some(_: GraftCatalog) =>
              ShowGraftViewsCommand(head, rest, pattern, output)
            case Some(_) => sv
            case None =>
              session.sessionState.catalogManager.currentCatalog match {
                case g: GraftCatalog => ShowGraftViewsCommand(g.name(), parts, pattern, output)
                case _ => sv
              }
          }
        case _ => sv
      }
    case sv @ ShowViews(CurrentNamespace, pattern, output) =>
      session.sessionState.catalogManager.currentCatalog match {
        case g: GraftCatalog =>
          ShowGraftViewsCommand(g.name(),
            session.sessionState.catalogManager.currentNamespace.toSeq, pattern, output)
        case _ => sv
      }
    case av @ AlterViewAs(u: UnresolvedView, originalText, query) =>
      target(session, u.multipartIdentifier) match {
        case Some((_, catName, ident)) =>
          AlterGraftViewAsCommand(catName, ident, originalText, query)
        case None => av
      }
    case rt @ RenameTable(u: UnresolvedTableOrView, newName, true) =>
      target(session, u.multipartIdentifier) match {
        case Some((_, catName, ident)) =>
          RenameGraftViewCommand(catName, ident, newName)
        case None => rt
      }
    // introspection on a STORED VIEW: tables keep Spark's native v2
    // paths; only identifiers that positively name an existing graft
    // view reroute (existence checked here — parse time — against the
    // persisted document, the same read resolution does)
    case sc @ ShowCreateTable(u: UnresolvedTableOrView, false, output) =>
      target(session, u.multipartIdentifier) match {
        case Some((g, catName, ident)) if g.viewExists(ident) =>
          ShowCreateGraftViewCommand(catName, ident, output)
        case _ => sc
      }
    case d @ DescribeRelation(u: UnresolvedTableOrView, partitionSpec, isExtended, output) =>
      target(session, u.multipartIdentifier) match {
        case Some((g, catName, ident)) if g.viewExists(ident) =>
          require(partitionSpec.isEmpty, "DESCRIBE ... PARTITION is not valid on a view")
          DescribeGraftViewCommand(catName, ident, isExtended, output)
        case _ => d
      }
    case other => other
  }

  private[extensions] def graftCatalog(session: SparkSession, catName: String): GraftCatalog =
    session.sessionState.catalogManager.catalog(catName) match {
      case g: GraftCatalog => g
      case other => throw new IllegalStateException(
        s"catalog $catName is no longer a graft catalog: $other")
    }

  /** `[catalogName] ++ namespace ++ [name]` — the absolute spelling. */
  private[extensions] def fullParts(catName: String, ident: Identifier): Seq[String] =
    (catName +: ident.namespace().toSeq) :+ ident.name()
}

/** `CREATE [OR REPLACE] VIEW` against a graft catalog. Analysis of the
  * view body happens here (run time): the text is what persists, the
  * analyzed plan supplies the captured schema + query column names.
  */
case class CreateGraftViewCommand(
    catName: String,
    ident: Identifier,
    userCols: Seq[(String, Option[String])],
    comment: Option[String],
    properties: Map[String, String],
    originalText: String,
    query: LogicalPlan,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    if (allowExisting && !replace && g.viewExists(ident)) return Seq.empty
    val analyzed = session.sessionState.executePlan(query).analyzed
    val qcols = analyzed.output.map(_.name)
    if (userCols.nonEmpty) require(userCols.length == qcols.length,
      s"CREATE VIEW ${ident}: ${userCols.length} column aliases for a " +
        s"${qcols.length}-column query")
    val aliases = userCols.map(_._1)
    val comments = userCols.map(_._2.getOrElse(""))
    val schema0 = analyzed.schema
    val schema =
      if (aliases.isEmpty) schema0
      else StructType(schema0.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    val cm = session.sessionState.catalogManager
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name(),
      cm.currentNamespace, schema, qcols.toArray, aliases.toArray, comments.toArray,
      props.asJava)
    if (replace) g.replaceView(info, orCreate = true) else g.createView(info)
    Seq.empty
  }
}

/** `ALTER VIEW ... AS <query>`: replaces the stored SQL + captured
  * schema, keeps properties, clears any column alias list (the
  * statement carries none — session-catalog semantics).
  */
case class AlterGraftViewAsCommand(
    catName: String,
    ident: Identifier,
    originalText: String,
    query: LogicalPlan) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val prior = g.loadView(ident) // throws NoSuchViewException when absent
    // an MV's SQL is derived from its recipe — redefinition goes
    // through CREATE OR REPLACE MATERIALIZED VIEW (which recomputes
    // the backing table), never a raw text swap
    if (prior.properties().asScala.get(graft.io.MaterializedViews.PropIsMv)
        .contains("true"))
      throw new IllegalArgumentException(
        s"${GraftViewSupport.fullParts(catName, ident).mkString(".")} is a " +
          "materialized view — use CREATE OR REPLACE MATERIALIZED VIEW")
    val analyzed = session.sessionState.executePlan(query).analyzed
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name(),
      cm.currentNamespace, analyzed.schema, analyzed.output.map(_.name).toArray,
      Array.empty, Array.empty, prior.properties())
    g.replaceView(info, orCreate = false)
    Seq.empty
  }
}

case class DropGraftViewCommand(
    catName: String,
    ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    // a materialized view owns a backing table; plain DROP VIEW would
    // orphan it — route to the statement that drops both
    if (g.viewExists(ident) &&
        g.loadView(ident).properties().asScala.get(graft.io.MaterializedViews.PropIsMv)
          .contains("true"))
      throw new IllegalArgumentException(
        s"${GraftViewSupport.fullParts(catName, ident).mkString(".")} is a " +
          "materialized view — use DROP MATERIALIZED VIEW")
    if (!g.dropView(ident) && !ifExists) throw new NoSuchViewException(ident)
    Seq.empty
  }
}

/** `CREATE [OR REPLACE] MATERIALIZED VIEW`: analyze the defining
  * query here (run time), then hand the validated recipe + initial
  * full compute to [[graft.io.MaterializedViews.create]].
  */
case class CreateGraftMvCommand(
    catName: String,
    ident: Identifier,
    querySql: String,
    replace: Boolean,
    ifNotExists: Boolean = false) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val name = (ident.namespace() :+ ident.name()).mkString(".")
    if (ifNotExists && g.viewExists(ident)) return Seq.empty
    val parsed = session.sessionState.sqlParser.parseQuery(querySql)
    // the defining query must analyze AS WRITTEN: with the transparent
    // MV rewrite live, CREATE OR REPLACE's own definition would match
    // the MV being replaced and collapse to a backing-table scan.
    // Thread-scoped suppression (not a session-conf toggle): analysis
    // happens on this thread, and other sessions'/threads' queries
    // must keep the rewrite during this window.
    val analyzed = RewriteAggregatesToMv.withRewriteSuppressed {
      session.sessionState.executePlan(parsed).analyzed
    }
    graft.io.MaterializedViews.create(session, g, name, analyzed, replace)
    Seq.empty
  }
}

case class DropGraftMvCommand(
    catName: String,
    ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val name = (ident.namespace() :+ ident.name()).mkString(".")
    graft.io.MaterializedViews.drop(session, g.tableCatalog, name, ifExists)
    Seq.empty
  }
}

case class RenameGraftViewCommand(
    catName: String,
    ident: Identifier,
    newNameParts: Seq[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    // the target may arrive fully qualified — strip OUR catalog name;
    // a different leading catalog is a cross-catalog move, refused
    val parts =
      if (newNameParts.length > 1 && newNameParts.head == catName) newNameParts.tail
      else newNameParts
    require(newNameParts.length == 1 || newNameParts.head == catName ||
        GraftViewSupport.target(SparkSession.active, newNameParts)
          .exists(_._2 == catName),
      s"cannot rename view across catalogs: ${ident} -> ${newNameParts.mkString(".")}")
    val to =
      if (parts.length == 1) Identifier.of(ident.namespace(), parts.head)
      else Identifier.of(parts.init.toArray, parts.last)
    g.renameView(ident, to)
    Seq.empty
  }
}

case class ShowGraftViewsCommand(
    catName: String,
    namespace: Seq[String],
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val names = g.listViews(namespace: _*).map(_.name()).toSeq
    val filtered = pattern match {
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p)
      case None => names
    }
    filtered.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

/** `SHOW CREATE TABLE` on a stored view: reconstruct the CREATE VIEW
  * statement from the persisted document (Spark's own behavior for
  * session-catalog views — SHOW CREATE TABLE serves views too).
  */
case class ShowCreateGraftViewCommand(
    catName: String,
    ident: Identifier,
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val v = g.loadView(ident)
    val cols =
      if (v.columnAliases().isEmpty) ""
      else v.columnAliases().zip(
        v.columnComments() ++ Array.fill(v.columnAliases().length)("")).map {
          case (a, c) if c.nonEmpty => s"$a COMMENT '${c.replace("'", "''")}'"
          case (a, _) => a
        }.mkString(" (", ", ", ")")
    val props = v.properties().asScala.toSeq
      .filterNot { case (k, _) => ViewCatalog.RESERVED_PROPERTIES.contains(k) }
      .sortBy(_._1)
    val tbl = if (props.isEmpty) ""
      else props.map { case (k, p) => s"'$k' = '$p'" }
        .mkString(" TBLPROPERTIES (", ", ", ")")
    val stmt = s"CREATE VIEW ${GraftViewSupport.fullParts(catName, ident).mkString(".")}" +
      s"$cols$tbl AS ${v.query()}"
    Seq(Row(stmt))
  }
}

/** `DESCRIBE [EXTENDED]` on a stored view: the captured schema, plus
  * the view-information block under EXTENDED (text, captured context,
  * properties) — the session-catalog DESCRIBE shape.
  */
case class DescribeGraftViewCommand(
    catName: String,
    ident: Identifier,
    isExtended: Boolean,
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val g = GraftViewSupport.graftCatalog(session, catName)
    val v = g.loadView(ident)
    val cols = v.schema().fields.map(f =>
      Row(f.name, f.dataType.simpleString, null: String)).toSeq
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", null: String),
      Row("# View Information", "", null: String),
      Row("Catalog", catName, null: String),
      Row("Namespace", ident.namespace().mkString("."), null: String),
      Row("View Name", ident.name(), null: String),
      Row("View Text", v.query(), null: String),
      Row("View Original Catalog", v.currentCatalog(), null: String),
      Row("View Original Namespace", v.currentNamespace().mkString("."), null: String)) ++
      v.properties().asScala.toSeq.sortBy(_._1).map { case (k, p) =>
        Row(s"View Property: $k", p, null: String)
      }
  }
}

/** Read-side view resolution: expand an `UnresolvedRelation` that
  * names a stored graft view into its parsed, context-qualified SQL.
  */
case class ResolveGraftViewRelations(session: SparkSession) extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, MergeIntoTable, UpdateTable}

  /** A stored view is never a write target: refuse INSERT/UPDATE/
    * DELETE/MERGE aimed at one with the standard
    * expect-table-not-view error instead of expanding the view into
    * the target position and failing downstream with a confusing
    * unresolved-write error (r19 advice).
    */
  private def refuseWriteTarget(target: LogicalPlan, operation: String): Unit = {
    def parts(p: LogicalPlan): Option[Seq[String]] = p match {
      case u: UnresolvedRelation => Some(u.multipartIdentifier)
      case SubqueryAlias(_, child) => parts(child)
      case _ => None
    }
    parts(target).foreach { ps =>
      if (GraftViewSupport.viewFor(session, ps).isDefined)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "EXPECT_TABLE_NOT_VIEW.NO_ALTERNATIVE",
          messageParameters = Map(
            "operation" -> operation,
            "viewName" -> ps.mkString(".")))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case i: InsertIntoStatement => refuseWriteTarget(i.table, "INSERT INTO")
      case d: DeleteFromTable => refuseWriteTarget(d.table, "DELETE FROM")
      case u: UpdateTable => refuseWriteTarget(u.table, "UPDATE")
      case m: MergeIntoTable => refuseWriteTarget(m.targetTable, "MERGE INTO")
      case _ =>
    }
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming =>
        GraftViewSupport.viewFor(session, u.multipartIdentifier) match {
          case Some((_, catName, ident, view)) => expand(catName, ident, view)
          case None => u
        }
    }
  }

  private def expand(catName: String, ident: Identifier,
                     view: org.apache.spark.sql.connector.catalog.View): LogicalPlan = {
    val selfParts = GraftViewSupport.fullParts(catName, ident).map(_.toLowerCase)
    val parsed = session.sessionState.sqlParser.parseQuery(view.query)
    // CTE names must bind BEFORE table-reference qualification — the
    // outer plan's Substitution batch already ran, so apply it to the
    // freshly parsed body by hand (Iceberg's ResolveViews does the
    // same).
    val cteBound = CTESubstitution.apply(parsed)
    // Qualify short table references under the view's CAPTURED
    // context: the creating session's current catalog + namespace.
    // A 2-part name whose head is itself a registered catalog is
    // already absolute and stays untouched.
    def refuseSelf(parts: Seq[String]): Unit =
      if (parts.map(_.toLowerCase) == selfParts)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "RECURSIVE_VIEW",
          messageParameters = Map(
            "viewIdent" -> selfParts.mkString("."),
            "newPath" -> selfParts.mkString(".")))
    val qualified = cteBound.transformUp {
      case r: UnresolvedRelation if !r.isStreaming =>
        if (r.multipartIdentifier.length < 3 && !headIsCatalog(r.multipartIdentifier)) {
          val parts = r.multipartIdentifier match {
            case Seq(one) =>
              (view.currentCatalog() +: view.currentNamespace().toSeq) :+ one
            case two => view.currentCatalog() +: two
          }
          refuseSelf(parts)
          r.copy(multipartIdentifier = parts)
        } else {
          // already absolute — still refuse a direct self-reference
          // (indirect cycles die on the analyzer's iteration cap)
          refuseSelf(r.multipartIdentifier)
          r
        }
    }
    val aliased =
      if (view.columnAliases().nonEmpty)
        UnresolvedSubqueryColumnAliases(view.columnAliases().toSeq, qualified)
      else qualified
    SubqueryAlias(GraftViewSupport.fullParts(catName, ident), aliased)
  }

  private def headIsCatalog(parts: Seq[String]): Boolean =
    parts.length >= 2 && (
      try { session.sessionState.catalogManager.catalog(parts.head); true }
      catch { case scala.util.control.NonFatal(_) => false })
}

/** Post-analysis check: a stored view's RESOLVED output must still
  * match the column names captured at creation. Without this, an
  * incompatible change to an underlying table (a column added under
  * SELECT *, dropped, or renamed) silently changes the view's output
  * while DESCRIBE keeps reporting the stale captured schema — Spark
  * session views and Iceberg's ResolveViews both fail this case with
  * an incompatible-view-change error (r19 advice). Views declared
  * with explicit column aliases are covered natively by the alias
  * count check in UnresolvedSubqueryColumnAliases.
  */
case class GraftViewSchemaCheck(session: SparkSession) extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    case a: SubqueryAlias if a.identifier.qualifier.length >= 2 =>
      val parts = a.identifier.qualifier :+ a.identifier.name
      GraftViewSupport.viewFor(session, parts) match {
        case Some((_, _, _, view))
            if view.columnAliases().isEmpty && view.queryColumnNames().nonEmpty =>
          val expected = view.queryColumnNames().toSeq
          val actual = a.output.map(_.name)
          if (actual != expected) {
            val missing = expected.diff(actual).headOption
              .orElse(expected.zip(actual).collectFirst { case (e, g) if e != g => e })
              .getOrElse(expected.last)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "INCOMPATIBLE_VIEW_SCHEMA_CHANGE",
              messageParameters = Map(
                "viewName" -> parts.mkString("."),
                "colName" -> missing,
                "expectedNum" -> expected.count(_ == missing).toString,
                "actualCols" -> actual.mkString("[", ",", "]"),
                "suggestion" -> s"CREATE OR REPLACE VIEW ${parts.mkString(".")} AS ${view.query()}"))
          }
        case _ =>
      }
    case _ =>
  }
}
