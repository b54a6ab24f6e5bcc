package graft.plans

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** PERSISTENT-VIEW resolution (round 15): substitutes a reference to a
  * stored graft view (`SELECT … FROM <catalog>.<ns>.<name>`) with its
  * parsed defining SQL — the extension-views shape Iceberg ships, since
  * OSS Spark 4.1 does not route view resolution to v2 catalogs. The rule
  * runs inside the analyzer's resolution fixed-point: the substituted
  * plan's own relations (including nested views) resolve on later
  * iterations. The view's OUTPUT is pinned to its creation-time column
  * set by a Project over the stored schema's names — a `SELECT *` view
  * does not grow with its base table, and a later `DROP COLUMN` on the
  * base makes the view REFUSE with an unresolved-column error instead of
  * silently changing shape.
  *
  * Inert unless a referenced identifier's catalog is a configured
  * `graft.sources.GraftCatalog` (conf lookup only — no catalog
  * instantiation) AND that catalog stores a view document under the
  * name; every other relation passes through untouched. Direct
  * self-reference refuses explicitly; longer cycles stop at the
  * analyzer's iteration limit. */
class GraftViewRule(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def rootOf(catalog: String): Option[String] =
    graft.sources.GraftViews.rootOf(session, catalog)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 &&
          u.multipartIdentifier.length <= 3 && !u.isStreaming =>
        val parts = u.multipartIdentifier
        val (ns, name) =
          if (parts.length == 3) (Seq(parts(1)), parts(2))
          else (Seq("default"), parts(1))
        rootOf(parts.head)
          .flatMap(root => graft.sources.GraftViews.load(root, ns, name))
          .map { v =>
            val parsed = CatalystSqlParser.parsePlan(v.sql)
            // CREATION-context qualification + WITH-body substitution
            // (CTE substitution lives in the analyzer's Substitution
            // batch, which already ran before this spliced subtree
            // existed) — ONE definition shared with create_view's
            // validation, so what validates is what resolves
            // the catalog decisions were made (and persisted) at CREATE
            // time; replaying them verbatim keeps a cross-catalog
            // reference cross-catalog even when the reading session lacks
            // that catalog's config (it then fails loudly instead of
            // silently re-qualifying into the view's own catalog). The
            // reader-conf probe only serves hand-written documents.
            val substituted = graft.sources.GraftViews.qualify(
              parsed, v.currentCatalog, v.currentNamespace,
              graft.sources.GraftViews.isCatalogFor(v.properties,
                n => n == "spark_catalog" ||
                  session.conf.getOption(s"spark.sql.catalog.$n").isDefined))
            if (graft.sources.GraftViews.referencesSelf(substituted,
                v.currentCatalog, v.currentNamespace, name))
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "RECURSIVE_VIEW",
                messageParameters = Map(
                  "viewIdent" -> parts.mkString("."),
                  "newPath" -> parts.mkString(".")))
            // an empty stored schema marks creation-time VALIDATION
            // probes — no column pinning yet, the probe's analysis
            // defines it; every persisted view pins its creation-time
            // column set
            SubqueryAlias(name,
              if (v.schema.isEmpty) substituted
              else Project(v.schema.fieldNames.toSeq
                .map(UnresolvedAttribute.quoted), substituted))
          }
          .getOrElse(u)
    }
}
