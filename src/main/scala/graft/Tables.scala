package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver fixture tables (`TESTDATA.md` / `FIXTURES.md` §B).
  *
  * Every loader is a plain parquet scan — Catalyst handles column pruning and
  * predicate pushdown into the scan, so callers just `select`/`filter` and the
  * physical plan reads only the row groups / columns it needs. At 100 TB these
  * paths would be partitioned directories instead of single files; nothing in
  * the call sites assumes a single file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet `timestamp[ns]`, which Spark's parquet reader
    * rejects outright (illegalParquetTypeError). Sessions therefore set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (done defensively here too)
    * and this loader converts the raw nanosecond longs to microsecond
    * `TimestampType` with floor division — the same truncation DuckDB applies
    * in `CAST(ts_ns AS TIMESTAMP)`, so oracle comparisons line up exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
