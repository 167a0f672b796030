package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.io.{GraftCatalog, MaterializedViews}

/** Transparent materialized-view QUERY REWRITE (the serving half of a
  * real MV system — Databricks/BigQuery-style aggregate matching):
  * a resolved `SELECT <keys>, count(*), sum(col)... FROM <base>
  * [WHERE <pred>] GROUP BY <keys>` whose shape matches an MV's stored
  * recipe is answered from the MV's BACKING TABLE — O(groups) served
  * rows instead of an O(base) scan+shuffle — when and only when the
  * MV is FRESH for exactly the snapshot the query reads: the
  * relation's pinned version (every graft scan's name carries
  * `@v<n>`) must equal the MV's `refreshed_version` marker. A stale
  * MV, a predicate/key/measure mismatch, or an untranslatable shape
  * all leave the plan untouched — the rewrite can miss, never lie.
  *
  * Matching is deliberately conservative:
  *   - the WHERE must equal the MV's stored predicate TEXTUALLY
  *     (both canonicalized through analysis + qualifier stripping);
  *   - group keys compare as a set of base-column names;
  *   - each query aggregate maps structurally (count(*) -> the MV's
  *     count column; sum(c) -> the MV measure on column c), so the
  *     query may use a SUBSET of the MV's aggregates under any
  *     aliases;
  *   - sums serve as the exact-decimal stored sum cast to the query's
  *     own result type — deterministic where a fresh double-sum over
  *     the base is partition-order-dependent.
  *
  * Opt-out: `SET spark.graft.mv.rewrite.enabled = false`. The MV
  * DDL path disables it around analysis of a defining query so
  * CREATE OR REPLACE never matches the MV being replaced.
  */
object RewriteAggregatesToMv {
  /** Thread-scoped suppression for the MV DDL path: CREATE OR REPLACE
    * analyzes its defining query on THIS thread and must not match the
    * MV being replaced — a session-conf toggle would blind every
    * concurrently-analyzing query in the session (and two racing
    * CREATEs could clobber each other's restore, leaving the rewrite
    * off for good).
    */
  private val suppressed = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def withRewriteSuppressed[T](f: => T): T = {
    val prev = suppressed.get()
    suppressed.set(java.lang.Boolean.TRUE)
    try f finally suppressed.set(prev)
  }

  private[extensions] def isSuppressed: Boolean = suppressed.get()
}

case class RewriteAggregatesToMv(session: SparkSession) extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.mv.rewrite.enabled"
  private val VersionSuffix = ".*@v(\\d+)$".r

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (RewriteAggregatesToMv.isSuppressed) return plan
    if (!session.conf.get(EnabledKey, "true").toBoolean) return plan
    plan.resolveOperatorsUp {
      case agg: Aggregate if agg.resolved => tryRewrite(agg).getOrElse(agg)
    }
  }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case other => other
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // cheap shape gate before any metadata I/O: the leaf must be a
    // graft-catalog relation directly under at most one Filter
    val source = stripAlias(agg.child) match {
      case Filter(_, rel) => stripAlias(rel)
      case rel => rel
    }
    val (rel, g, relIdent) = source match {
      case r: DataSourceV2Relation =>
        r.catalog match {
          case Some(gc: GraftCatalog) => (r, gc, r.identifier)
          case _ => return None
        }
      case _ => return None
    }
    val ident = relIdent.getOrElse(return None)
    // the snapshot this query reads, off the scan's pinned name
    val relVersion = rel.table.name() match {
      case VersionSuffix(v) => v.toInt
      case _ => return None
    }
    val recipe =
      try MaterializedViews.extractRecipe(g.name(), agg)
      catch { case scala.util.control.NonFatal(_) => return None }
    val base = (ident.namespace() :+ ident.name()).mkString(".")
    if (recipe.base != base) return None
    val candidates =
      try MaterializedViews.mvInfosOn(g.tableCatalog, ident.namespace().toSeq, base)
      catch { case scala.util.control.NonFatal(_) => return None }
    candidates.collectFirst {
      case mv if mv.refreshedVersion == relVersion &&
          mv.predicateSql == recipe.predicateSql &&
          mv.keys.toSet == recipe.keys.toSet &&
          recipe.measures.forall { case (m, _) =>
            mv.measures.exists { case (mm, _) =>
              mm.column == m.column && mm.scale == m.scale
            }
          } =>
        substitute(agg, g, mv)
    }.flatten
  }

  /** Build the replacement: a Project over the backing relation that
    * reproduces the Aggregate's output columns UNDER THEIR ORIGINAL
    * exprIds (downstream operators keep resolving).
    */
  private def substitute(agg: Aggregate, g: GraftCatalog,
                         mv: MaterializedViews.MvInfo): Option[LogicalPlan] = {
    val parts = mv.backing.split('.')
    val backingIdent = Identifier.of(parts.init, parts.last)
    val table =
      try g.loadTable(backingIdent)
      catch { case scala.util.control.NonFatal(_) => return None }
    val rel = DataSourceV2Relation.create(table, Some(g), Some(backingIdent))
    val byName = rel.output.map(a => a.name -> a).toMap
    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    def cast(child: Expression, to: org.apache.spark.sql.types.DataType): Expression =
      if (child.dataType == to) child else Cast(child, to, tz)
    val projections: Option[Seq[NamedExpression]] =
      traverseOption(agg.aggregateExpressions) {
        case a: AttributeReference =>
          byName.get(a.name).map(b => Alias(cast(b, a.dataType), a.name)(exprId = a.exprId))
        case al @ Alias(child, name) => child match {
          case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
            byName.get(mv.countAlias)
              .map(b => Alias(cast(b, al.dataType), name)(exprId = al.exprId))
          case AggregateExpression(s: Sum, _, false, None, _) =>
            // NEVER serve a floating-point sum from the backing table:
            // the MV stores double/float measures quantized to a
            // DECIMAL(30,s) grid (exact only for data already on that
            // grid), and a TRANSPARENT rewrite of a plain sum(double)
            // would silently change sub-grid answers — breaking the
            // "can miss, never lie" contract. Explicit MV reads still
            // see the documented quantized sum; exact types serve.
            s.child.dataType match {
              case org.apache.spark.sql.types.DoubleType |
                   org.apache.spark.sql.types.FloatType => return None
              case _ =>
            }
            val src = s.child match {
              case a: AttributeReference => a.name
              case Cast(a: AttributeReference, _, _, _) => a.name
              case _ => return None
            }
            mv.measures.collectFirst { case (m, _) if m.column == src => m.alias }
              .flatMap(byName.get)
              .map(b => Alias(cast(b, al.dataType), name)(exprId = al.exprId))
          case a: AttributeReference =>
            byName.get(a.name).map(b => Alias(cast(b, al.dataType), name)(exprId = al.exprId))
          case _ => None
        }
        case _ => None
      }
    projections.map { ps =>
      logInfo(s"answering aggregate over ${mv.base}@v${mv.refreshedVersion} " +
        s"from materialized view ${mv.viewName} (backing ${mv.backing})")
      Project(ps, rel)
    }
  }

  private def traverseOption[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = Seq.newBuilder[B]
    xs.foreach { x =>
      f(x) match {
        case Some(b) => out += b
        case None => return None
      }
    }
    Some(out.result())
  }
}
