package graft.plans

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier,
  UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext,
  ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView,
  DescribeRelation, DropView, LogicalPlan, RenameTable, SetViewProperties,
  ShowCreateTable, ShowViews, UnsetViewProperties}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog,
  ViewCatalog}
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
  private def catFor(parts: Seq[String]): String =
    if (rootOf(parts.head).isDefined) parts.head
    else session.sessionState.catalogManager.currentCatalog.name()

  /** Whether a multipart name is a candidate for graft routing at all:
    * short enough, and not a 1-part name shadowed by a session temp view
    * (Spark gives temp views precedence for every view statement —
    * routing one would address the wrong object). */
  private def routable(parts: Seq[String]): Boolean =
    parts.length <= 3 && !(parts.length == 1 && isTempView(parts.head))

  /** The stored-view document for `parts` iff it resolves into a graft
    * catalog AND the view exists right now — the routing test for
    * statements views SHARE with tables (DESCRIBE, SHOW CREATE TABLE):
    * graft tables must keep their native DSv2 path. */
  private def existingView(parts: Seq[String])
      : Option[(String, Seq[String], String)] =
    resolveIdent(parts).filter { case (_, ns, root) =>
      graft.sources.GraftViews.load(root, ns, parts.last).isDefined
    }

  private def route(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView => cv.child match {
      case UnresolvedIdentifier(parts, _) if parts.length <= 3 =>
        resolveIdent(parts) match {
          case Some((cat, ns, root)) =>
            // validation (body text present, column-list arity) happens
            // in run(), with Spark's error shapes — a parse-only context
            // (EXPLAIN) must never throw here
            GraftCreateViewCommand(cat, root, ns, parts.last,
              cv.originalText, cv.userSpecifiedColumns,
              cv.replace, cv.allowExisting,
              cv.properties ++ cv.comment.map("comment" -> _))
          case None => cv
        }
      case _ => cv
    }
    // ALTER VIEW … SET TBLPROPERTIES
    case sp @ SetViewProperties(UnresolvedView(parts, _, _, _), props)
        if routable(parts) =>
      resolveIdent(parts) match {
        case Some((cat, ns, _)) =>
          GraftAlterViewPropsCommand(cat, ns, parts.last, props, Nil)
        case None => sp
      }
    // ALTER VIEW … UNSET TBLPROPERTIES [IF EXISTS] — idempotent either
    // way, the v2 semantics: a missing key is simply not removed
    case up @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _)
        if routable(parts) =>
      resolveIdent(parts) match {
        case Some((cat, ns, _)) =>
          GraftAlterViewPropsCommand(cat, ns, parts.last, Map.empty, keys)
        case None => up
      }
    // ALTER VIEW … RENAME TO (RenameTable with isView = true)
    case rt @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
        if routable(parts) =>
      resolveIdent(parts) match {
        case Some((cat, ns, _)) =>
          GraftRenameViewCommand(cat, ns, parts.last, newName)
        case None => rt
      }
    // SHOW CREATE TABLE on a graft VIEW (Spark's statement for view DDL
    // text); graft TABLES keep the native path, as does AS SERDE
    case sct @ ShowCreateTable(UnresolvedTableOrView(parts, _, _), false, _)
        if routable(parts) =>
      existingView(parts) match {
        case Some((cat, ns, root)) =>
          GraftShowCreateViewCommand(cat, root, ns, parts.last, sct.output)
        case None => sct
      }
    // DESCRIBE a graft VIEW; tables (and PARTITION specs) stay native
    case dr @ DescribeRelation(UnresolvedTableOrView(parts, _, _), spec,
        isExtended, _) if spec.isEmpty && routable(parts) =>
      existingView(parts) match {
        case Some((cat, ns, root)) =>
          GraftDescribeViewCommand(cat, root, ns, parts.last, isExtended,
            dr.output)
        case None => dr
      }
    // ALTER VIEW … AS <query> — redefine the body, keep the properties
    case av @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _)
        if routable(parts) =>
      resolveIdent(parts) match {
        case Some((cat, ns, root)) =>
          GraftAlterViewAsCommand(cat, root, ns, parts.last,
            Option(originalText))
        case None => av
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
            GraftShowViewsCommand(catFor(parts), root, ns,
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

/** Shared plumbing for the routed view commands. */
private[plans] object GraftViewCmds {
  def viewCatalog(s: SparkSession, cat: String): ViewCatalog =
    s.sessionState.catalogManager.catalog(cat).asInstanceOf[ViewCatalog]
  def isTable(s: SparkSession, cat: String, ns: Seq[String],
      name: String): Boolean =
    s.sessionState.catalogManager.catalog(cat) match {
      case tc: TableCatalog => tc.tableExists(Identifier.of(ns.toArray, name))
      case _ => false
    }
  /** The ALTER VIEW statements addressed to a graft TABLE get Spark's
    * own error shape, not a confusing view-not-found. */
  def requireView(s: SparkSession, cat: String, ns: Seq[String],
      name: String, operation: String): Unit = {
    if (graft.sources.GraftViews.rootOf(s, cat)
        .flatMap(r => graft.sources.GraftViews.load(r, ns, name)).isEmpty) {
      if (isTable(s, cat, ns, name))
        throw new AnalysisException(
          errorClass = "EXPECT_VIEW_NOT_TABLE.USE_ALTER_TABLE",
          messageParameters = Map(
            "tableName" -> (cat +: ns :+ name).mkString("."),
            "operation" -> operation))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        Identifier.of(ns.toArray, name))
    }
  }
  def quoted(parts: Seq[String]): String =
    parts.map(p => s"`${p.replace("`", "``")}`").mkString(".")
  /** ONE definition of "internal bookkeeping property" for every surface
    * that renders or carries view properties (SHOW CREATE, DESCRIBE,
    * ALTER AS) — a property added to one rendering but not the others
    * would otherwise leak or survive inconsistently. */
  def isInternal(key: String): Boolean =
    key == graft.sources.GraftViews.CrossCatalogHeadsProp ||
      key.startsWith("graft.col.comment.")
  /** A SQL single-quoted string literal that re-parses to exactly `s` —
    * backslashes double FIRST (Spark's parser treats them as escapes:
    * '\t' is a tab), then quotes: a trailing backslash would otherwise
    * swallow the closing delimiter. Assumes the DEFAULT parser config;
    * under the legacy `spark.sql.parser.escapedStringLiterals=true`
    * (Hive compat — backslashes literal) a re-execution would double
    * backslashes, the same caveat every Spark-emitted DDL carries. */
  def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
}

/** `CREATE [OR REPLACE] VIEW <graft-catalog>.<ns>.<name>
  * [(col [COMMENT …], …)] AS <query>`. Validation is deferred to run()
  * so parse-only contexts (EXPLAIN) never throw, and errors surface with
  * Spark's shapes. A user column list persists as a positional aliasing
  * wrapper around the body (arity-checked by the creation-time analysis
  * probe); column comments ride the view properties. */
case class GraftCreateViewCommand(catalogName: String, root: String,
    ns: Seq[String], name: String, sql: Option[String],
    userCols: Seq[(String, Option[String])], replace: Boolean,
    allowExisting: Boolean, props: Map[String, String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val body0 = sql.getOrElse(throw new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" ->
        (s"CREATE VIEW ${(ns :+ name).mkString(".")} carried no body " +
          "text to persist"))))
    val body =
      if (userCols.isEmpty) body0
      else s"SELECT * FROM (\n$body0\n) AS __graft_view_cols(" +
        userCols.map(c => s"`${c._1.replace("`", "``")}`")
          .mkString(", ") + ")"
    val colComments = userCols.collect {
      case (n, Some(c)) => s"graft.col.comment.$n" -> c
    }
    if (allowExisting &&
        graft.sources.GraftViews.load(root, ns, name).isDefined)
      return Seq.empty // IF NOT EXISTS on an existing view: no-op
    try graft.sources.GraftViewDdl.create(session, catalogName, root, ns,
      name, body, replace, props ++ colComments)
    catch {
      // a concurrent create can win between the load() check and the
      // publish — IF NOT EXISTS must still succeed silently
      case _: org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException if allowExisting => ()
    }
    Seq.empty
  }
}

/** `ALTER VIEW … SET TBLPROPERTIES (…)` / `UNSET TBLPROPERTIES (…)` —
  * both route through the catalog's own alterView SPI (one definition of
  * a property edit). UNSET is idempotent, the v2 semantics: a missing
  * key is simply not removed. The internal cross-catalog-heads property
  * is reserved — user edits would corrupt stored resolution decisions. */
case class GraftAlterViewPropsCommand(catalogName: String, ns: Seq[String],
    name: String, set: Map[String, String], unset: Seq[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    // target-shape errors first (table / missing view), THEN the
    // reserved-property refusal — each statement shape with its own
    // Spark error class
    GraftViewCmds.requireView(session, catalogName, ns, name,
      "ALTER VIEW … TBLPROPERTIES")
    val reserved = graft.sources.GraftViews.CrossCatalogHeadsProp
    if (set.contains(reserved))
      throw new AnalysisException(
        errorClass = "UNSUPPORTED_FEATURE.SET_TABLE_PROPERTY",
        messageParameters = Map("property" -> reserved,
          "msg" -> "it records the view's creation-time catalog decisions"))
    if (unset.contains(reserved))
      throw new AnalysisException(
        errorClass = "CANNOT_REMOVE_RESERVED_PROPERTY",
        messageParameters = Map("property" -> reserved))
    val changes: Seq[ViewChange] =
      set.toSeq.sortBy(_._1).map { case (k, v) =>
        ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    GraftViewCmds.viewCatalog(session, catalogName)
      .alterView(Identifier.of(ns.toArray, name), changes: _*)
    Seq.empty
  }
}

/** `ALTER VIEW <graft-catalog>.<ns>.<name> RENAME TO <new>` — the new
  * name resolves WITHIN the same catalog: 1-part is RELATIVE (keeps the
  * source namespace); 2-/3-part are ABSOLUTE, read with the same
  * catalog-first rule as table identifiers — a head naming the catalog
  * means the rest is the full path (`g.v2` = g.default.v2, matching how
  * `resolveIdent` reads `g.v2` everywhere else), any other head is a
  * namespace (which must exist). A namespace that shares the catalog's
  * name is therefore only addressable through the 3-part form — the
  * standing Spark ambiguity, resolved catalog-first here as there.
  * Cross-catalog renames refuse. The catalog's renameView publishes
  * atomically (link-then-unlink). */
case class GraftRenameViewCommand(catalogName: String, ns: Seq[String],
    name: String, newName: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    def otherCatalog(h: String): Boolean = h != catalogName &&
      (h == "spark_catalog" ||
        session.conf.getOption(s"spark.sql.catalog.$h").isDefined)
    val (toNs, toName) = newName match {
      case Seq(n) => (ns, n)
      case Seq(c, n) if c == catalogName => (Seq("default"), n)
      case Seq(a, n) if !otherCatalog(a) => (Seq(a), n)
      case Seq(c, a, n) if c == catalogName => (Seq(a), n)
      case other => throw new IllegalArgumentException(
        s"ALTER VIEW … RENAME TO ${other.mkString(".")}: the new name " +
          s"must stay inside catalog $catalogName")
    }
    GraftViewCmds.requireView(session, catalogName, ns, name,
      "ALTER VIEW … RENAME TO")
    graft.sources.GraftViews.namespaceCheck(session, catalogName, toNs)
    GraftViewCmds.viewCatalog(session, catalogName).renameView(
      Identifier.of(ns.toArray, name), Identifier.of(toNs.toArray, toName))
    Seq.empty
  }
}

/** `SHOW CREATE TABLE` on a stored graft view: reconstruct the runnable
  * CREATE VIEW statement — name, comment, user properties (internal
  * bookkeeping props stay hidden), and the stored body verbatim. */
case class GraftShowCreateViewCommand(catalogName: String, root: String,
    ns: Seq[String], name: String,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = graft.sources.GraftViews.load(root, ns, name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        Identifier.of(ns.toArray, name)))
    val sb = new StringBuilder(
      s"CREATE VIEW ${GraftViewCmds.quoted(catalogName +: ns :+ name)}")
    // column comments render as a COLUMN LIST, not TBLPROPERTIES — the
    // one form whose re-execution recreates the view with its comments
    // intact (the body's alias wrapper is positional, so the outer list
    // re-aliasing the same names is idempotent)
    if (v.properties.keys.exists(_.startsWith("graft.col.comment."))) {
      sb.append(v.schema.fieldNames.map { f =>
        val q = s"`${f.replace("`", "``")}`"
        v.properties.get(s"graft.col.comment.$f")
          .fold(q)(c => s"$q COMMENT ${GraftViewCmds.sqlStr(c)}")
      }.mkString(" (", ", ", ")"))
    }
    v.properties.get("comment").foreach(c =>
      sb.append(s"\nCOMMENT ${GraftViewCmds.sqlStr(c)}"))
    val user = (v.properties - "comment")
      .filterNot(p => GraftViewCmds.isInternal(p._1)).toSeq.sortBy(_._1)
    if (user.nonEmpty)
      sb.append(user.map { case (k, x) =>
        s"${GraftViewCmds.sqlStr(k)} = ${GraftViewCmds.sqlStr(x)}"
      }.mkString("\nTBLPROPERTIES (\n  ", ",\n  ", ")"))
    sb.append(s" AS\n${v.sql}")
    Seq(Row(sb.toString))
  }
}

/** `DESCRIBE [EXTENDED] <graft-catalog>.<ns>.<view>` — the pinned
  * analysis-time columns, then (extended) the view text and context. */
case class GraftDescribeViewCommand(catalogName: String, root: String,
    ns: Seq[String], name: String, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val v = graft.sources.GraftViews.load(root, ns, name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        Identifier.of(ns.toArray, name)))
    val cols = v.schema.fields.toSeq.map { f =>
      Row(f.name, f.dataType.simpleString,
        v.properties.get(s"graft.col.comment.${f.name}").orNull)
    }
    if (!isExtended) cols
    else {
      val user = v.properties
        .filterNot(p => GraftViewCmds.isInternal(p._1)).toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k=$x" }.mkString("[", ", ", "]")
      cols ++ Seq(
        Row("", "", ""),
        Row("# Detailed View Information", "", ""),
        Row("Catalog", catalogName, ""),
        Row("Namespace", ns.mkString("."), ""),
        Row("View Name", name, ""),
        Row("View Text", v.sql, ""),
        Row("View Properties", user, ""))
    }
  }
}

/** `ALTER VIEW <graft-catalog>.<ns>.<name> AS <query>` — redefine the
  * body through the same validated create path (REPLACE), preserving the
  * view's user properties; the cross-catalog-heads decisions recompute
  * for the NEW body. Refuses when the view does not exist (ALTER, not
  * CREATE). */
case class GraftAlterViewAsCommand(catalogName: String, root: String,
    ns: Seq[String], name: String, sql: Option[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val body = sql.getOrElse(throw new AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" ->
        (s"ALTER VIEW ${(ns :+ name).mkString(".")} AS carried no body " +
          "text to persist"))))
    GraftViewCmds.requireView(session, catalogName, ns, name,
      "ALTER VIEW … AS")
    // USER properties survive the redefinition; internal bookkeeping
    // does not — per-column comments belong to the replaced definition
    // (matching Spark's own ALTER VIEW … AS, which re-derives the schema
    // from the new body without comments; keeping them would also leave
    // stale entries against columns the new body never had) and the
    // cross-catalog-heads decisions recompute for the new body
    val keep = graft.sources.GraftViews.load(root, ns, name)
      .map(_.properties.filterNot(p => GraftViewCmds.isInternal(p._1)))
      .getOrElse(Map.empty)
    graft.sources.GraftViewDdl.create(session, catalogName, root, ns, name,
      body, replace = true, keep)
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
