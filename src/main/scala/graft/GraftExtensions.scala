package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers graft's native expressions at session build
  * time, so a user can adopt the library with
  * `--conf spark.sql.extensions=graft.GraftExtensions` and call
  * `cosine_sim` / `sorted_intersect_count` from SQL without any imperative
  * registration call. (The `functions.VectorOps.register` path still works
  * for sessions built without extensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => functions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[functions.SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => functions.SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_dot_product"),
      new ExpressionInfo(classOf[functions.SortedDotProduct].getName, "sorted_dot_product"),
      (exprs: Seq[Expression]) => functions.SortedDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[functions.BloomContains].getName, "bloom_contains"),
      (exprs: Seq[Expression]) => functions.BloomContains(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("explode_shingles"),
      new ExpressionInfo(classOf[functions.ExplodeShingles].getName, "explode_shingles"),
      (exprs: Seq[Expression]) => functions.ExplodeShingles(exprs(0),
        functions.ShingleGen.nOf(exprs(1)))))
    // the BUILD side of the Bloom pair — without it a pure-SQL session gets
    // bloom_contains but no way to produce a sketch, an asymmetric surface
    e.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[functions.BloomBuildAgg].getName, "bloom_build"),
      (exprs: Seq[Expression]) => functions.BloomBuildAgg(exprs(0),
        functions.BloomOps.intLit(exprs(1), "numBits"),
        functions.BloomOps.intLit(exprs(2), "k"))))
    e.injectFunction((
      FunctionIdentifier("levenshtein_within"),
      new ExpressionInfo(classOf[functions.LevenshteinWithin].getName, "levenshtein_within"),
      (exprs: Seq[Expression]) => functions.LevenshteinWithin(exprs(0), exprs(1),
        functions.EditDistance.kOf(exprs(2)))))
    // persistent-view substitution (inert unless the referenced catalog
    // is a configured GraftCatalog storing a view under the name)
    e.injectResolutionRule(s => new plans.GraftViewRule(s))
    // CREATE/DROP/SHOW VIEWS statement routing for graft catalogs —
    // intercepted at parse time because ResolveSessionCatalog throws
    // MISSING_CATALOG_ABILITY for v2 view DDL before any injected
    // resolution rule can run (inert for non-graft statements)
    e.injectParser((s, delegate) => new plans.GraftSqlParser(s, delegate))
    // band-join rewrite (inert until spark.graft.bandJoin.width is set)
    e.injectOptimizerRule(_ => plans.BandJoinRule)
    // materialized-view auto-rewrite (inert until a view registers)
    e.injectOptimizerRule(_ => plans.MvRewriteRule)
  }
}
