package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's public operator surface: one entry per
  * implemented operator family from SURVEY.md §2 (reference parity) plus the
  * LLM-data-pipeline extensions. Every entry with SQL-expressible semantics
  * has a matching `oracleSql` row (DuckDB-dialect ANSI SQL over the same
  * parquet fixtures); non-SQL-expressible ops (LSH, language-ID heuristics,
  * ML) are rows-only checked by the driver.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TimeJoins.queries ++
      functions.Json.queries ++
      operators.TextAnalysis.queries ++
      operators.TextFeatures.queries ++
      operators.DedupOps.queries ++
      operators.SimilarityOps.queries ++
      operators.Multimodal.queries ++
      operators.OlapExtras.queries ++
      operators.ScaleOps.queries ++
      operators.Composition.queries ++
      operators.CurationOps.queries ++
      operators.RangeOps.queries ++
      operators.AnalyticsOps.queries ++
      operators.TokenizerOps.queries ++
      operators.GraphOps.queries ++
      operators.AuditOps.queries ++
      operators.IntegrityOps.queries ++
      streaming.StreamingOps.queries ++
      streaming.Sessionize.queries ++
      streaming.TransformWithStateOps.queries ++
      ml.Forecast.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.TimeJoins.oracle ++
      functions.Json.oracle ++
      operators.TextAnalysis.oracle ++
      operators.TextFeatures.oracle ++
      operators.DedupOps.oracle ++
      operators.SimilarityOps.oracle ++
      operators.Multimodal.oracle ++
      operators.OlapExtras.oracle ++
      operators.ScaleOps.oracle ++
      operators.Composition.oracle ++
      operators.CurationOps.oracle ++
      operators.RangeOps.oracle ++
      operators.AnalyticsOps.oracle ++
      operators.TokenizerOps.oracle ++
      operators.GraphOps.oracle ++
      operators.AuditOps.oracle ++
      operators.IntegrityOps.oracle ++
      streaming.StreamingOps.oracle ++
      streaming.Sessionize.oracle ++
      streaming.TransformWithStateOps.oracle ++
      ml.Forecast.oracle
}
