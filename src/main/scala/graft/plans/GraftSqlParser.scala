package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier,
  UnresolvedNamespace}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext,
  ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView,
  LogicalPlan, ShowViews}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL ROUTING for persistent views (round 16) — the statement surface OSS
  * Spark 4.1 does not ship: the parser produces v2 `CreateView` /
  * `DropView` / `ShowViews` nodes, but `ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY.VIEWS for any non-session catalog EVEN WHEN the
  * catalog implements the `ViewCatalog` SPI, and it runs before every
  * injected resolution rule — so an analyzer rule can never intercept.
  * This delegating parser rewrites those three nodes at PARSE time, before
  * the analyzer sees them, into runnable commands over the same
  * [[graft.sources.GraftViewDdl]] / [[graft.sources.GraftViews]] logic the
  * `CALL system.create_view` procedure uses — plain
  * `CREATE [OR REPLACE] VIEW g.default.v AS …`, `DROP VIEW [IF EXISTS]`,
  * and `SHOW VIEWS IN g.default` now just work.
  *
  * Inert for everything else: the rewrite fires only when the statement's
  * head identifier names a configured `GraftCatalog` (conf lookup only);
  * session-catalog and temp-view statements pass through verbatim. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def rootOf(catalog: String): Option[String] =
    graft.sources.GraftViews.rootOf(session, catalog)

  /** Whether `n` is RESERVED in Spark's multipart resolution order —
    * any configured catalog (catalog-first rule) or the global-temp
    * database (which resolves BEFORE catalogs): such a head must never
    * fall back to namespace-in-current-catalog routing, or
    * `global_temp.v` / `other_cat.ns.t` statements would be hijacked. */
  private def isAnyCatalog(n: String): Boolean =
    n == "spark_catalog" ||
      n.equalsIgnoreCase(session.sessionState.conf.getConf(
        org.apache.spark.sql.internal.StaticSQLConf.GLOBAL_TEMP_DATABASE)) ||
      session.conf.getOption(s"spark.sql.catalog.$n").isDefined

  /** The session's current (catalog, namespace, root) iff the current
    * catalog is a configured GraftCatalog. */
  private def currentGraft: Option[(String, Seq[String], String)] = {
    val cm = session.sessionState.catalogManager
    val cat = cm.currentCatalog.name()
    rootOf(cat).map { r =>
      val ns = cm.currentNamespace.toSeq
      (cat, if (ns.isEmpty) Seq("default") else ns, r)
    }
  }

  /** (catalog, namespace, root) for an identifier, with Spark's
    * catalog-first multipart semantics: a graft-catalog head routes
    * verbatim; a head that is no catalog at all resolves against the
    * session's CURRENT catalog (1-part = current namespace, 2-part =
    * the head as a namespace) — `USE graft_cat; CREATE VIEW [ns.]v …`
    * must route exactly like the fully-qualified form. None when the
    * owning catalog is not a configured GraftCatalog. */
  private def resolveIdent(parts: Seq[String])
      : Option[(String, Seq[String], String)] = parts.length match {
    case 1 => currentGraft
    case 2 =>
      rootOf(parts.head).map(r => (parts.head, Seq("default"), r))
        .orElse(if (isAnyCatalog(parts.head)) None
          else currentGraft.map { case (cat, _, r) =>
            (cat, Seq(parts.head), r) })
    case 3 => rootOf(parts.head).map(r => (parts.head, Seq(parts(1)), r))
    case _ => None
  }

  /** Whether a 1-part name resolves to a session temp view — Spark's
    * DROP VIEW gives temp views PRECEDENCE over catalog objects, so a
    * 1-part drop with a matching temp view must pass through to the
    * delegate untouched (routing it would delete the wrong object). */
  private def isTempView(name: String): Boolean =
    session.sessionState.catalog.getRawTempView(name).isDefined

  /** The owning catalog name for a ShowViews routing decision: the
    * explicit head when it is a graft catalog, else the current one. */
  private def catFor(parts: Seq[String], ns: Seq[String]): String =
    if (rootOf(parts.head).isDefined) parts.head
    else session.sessionState.catalogManager.currentCatalog.name()

  private def route(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case UnresolvedIdentifier(parts, _) if parts.length <= 3 =>
        resolveIdent(parts) match {
          case Some((cat, ns, root)) =>
            require(cv.userSpecifiedColumns.isEmpty,
              "CREATE VIEW with a column list is not supported for graft " +
                "views — alias the columns in the body query instead")
            val body = cv.originalText.getOrElse(
              throw new IllegalArgumentException(
                "CREATE VIEW without body text cannot persist"))
            GraftCreateViewCommand(cat, root, ns, parts.last, body,
              cv.replace, cv.allowExisting,
              cv.properties ++ cv.comment.map("comment" -> _))
          case None => cv
        }
      case _ => cv
    }
    case dv: DropView => dv.child match {
      case UnresolvedIdentifier(parts, _) if parts.length <= 3 &&
          !(parts.length == 1 && isTempView(parts.head)) =>
        resolveIdent(parts) match {
          case Some((_, ns, root)) =>
            GraftDropViewCommand(root, ns, parts.last, dv.ifExists)
          case None => dv
        }
      case _ => dv
    }
    case sv: ShowViews => sv.child match {
      case UnresolvedNamespace(parts, _) if parts.nonEmpty =>
        rootOf(parts.head)
          .map(r => (r, if (parts.length >= 2) parts.tail
            else Seq("default")))
          // `SHOW VIEWS IN <ns>` where <ns> is no catalog: the namespace
          // resolves against the CURRENT catalog (catalog-first rule)
          .orElse(if (isAnyCatalog(parts.head)) None
            else currentGraft.map { case (_, _, r) => (r, parts) })
          .map { case (root, ns) =>
            GraftShowViewsCommand(catFor(parts, ns), root, ns,
              sv.pattern, sv.output) }
          .getOrElse(sv)
      // bare `SHOW VIEWS` under `USE <graft-catalog>`
      case org.apache.spark.sql.catalyst.analysis.CurrentNamespace
          if currentGraft.isDefined =>
        val (cat, ns, root) = currentGraft.get
        GraftShowViewsCommand(cat, root, ns, sv.pattern, sv.output)
      case _ => sv
    }
    case p => p
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    route(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    route(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String):
      org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW <graft-catalog>.<ns>.<name> AS <query>`. */
case class GraftCreateViewCommand(catalogName: String, root: String,
    ns: Seq[String], name: String, sql: String, replace: Boolean,
    allowExisting: Boolean, props: Map[String, String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (allowExisting &&
        graft.sources.GraftViews.load(root, ns, name).isDefined)
      return Seq.empty // IF NOT EXISTS on an existing view: no-op
    try graft.sources.GraftViewDdl.create(session, catalogName, root, ns,
      name, sql, replace, props)
    catch {
      // a concurrent create can win between the load() check and the
      // publish — IF NOT EXISTS must still succeed silently
      case _: org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException if allowExisting => ()
    }
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] <graft-catalog>.<ns>.<name>`. */
case class GraftDropViewCommand(root: String, ns: Seq[String], name: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = graft.sources.GraftViews.drop(root, ns, name)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          ns.toArray, name))
    Seq.empty
  }
}

/** `SHOW VIEWS IN <graft-catalog>[.<ns>] [LIKE 'pattern']` — the standard
  * (namespace, viewName, isTemporary) shape: stored documents first
  * (never temporary), then the session's LOCAL temp views, which Spark's
  * SHOW VIEWS contract always includes regardless of the namespace
  * argument. */
case class GraftShowViewsCommand(catalogName: String, root: String,
    ns: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    // a typo'd namespace must raise SCHEMA_NOT_FOUND, not read as empty
    graft.sources.GraftViews.namespaceCheck(session, catalogName, ns)
    def filt(names: Seq[String]): Seq[String] =
      pattern.fold(names)(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(names, p))
    filt(graft.sources.GraftViews.list(root, ns))
      .map(n => Row(ns.mkString("."), n, false)) ++
      filt(session.sessionState.catalog.getTempViewNames().sorted)
        .map(n => Row("", n, true))
  }
}
