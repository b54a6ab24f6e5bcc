package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Remaining analytics surface + an end-to-end curation pipeline:
  * exact percentiles, pivot, and the composed quality→dedup flow a
  * training-data pipeline runs before near-dup removal.
  */
object Composition {
  private val D2 = DecimalType(18, 2)

  /** Exact linear-interpolation percentiles per group — the `percentile` /
    * DuckDB `quantile_cont` definition, computed by
    * `ExactQuantiles.quantileCont` (distributed bucketed rank selection)
    * instead of the built-in, whose per-group ObjectHashAggregate buffer
    * holds that group's entire value multiset (~⅓ of lineitem per return
    * flag here — unbounded at scale). Bit-identical to `percentile`
    * (spec-asserted), so values agree with the oracle to float precision
    * (rounded to 4dp for the hash compare). The two value columns take
    * independent rank-selection passes, joined on the group key. */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val price = ExactQuantiles.quantileCont(
      li.select($"l_returnflag", $"l_extendedprice"), Seq("l_returnflag"),
      "l_extendedprice", Seq("p50" -> 0.5, "p95" -> 0.95))
    val qty = ExactQuantiles.quantileCont(
      li.select($"l_returnflag", $"l_quantity"), Seq("l_returnflag"),
      "l_quantity", Seq("q25_qty" -> 0.25))
    price.join(qty, "l_returnflag")
      .select($"l_returnflag", round($"p50", 4).as("p50"),
        round($"p95", 4).as("p95"), round($"q25_qty", 4).as("q25_qty"))
  }

  /** Pivot: order counts per year × priority, with an explicit value list so
    * the output schema is deterministic. */
  def pivotOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /** Curation pipeline: quality-gate → canonical-fingerprint dedup → keep
    * the lowest doc_id per fingerprint. The deterministic core of a
    * training-data curation flow (near-dup removal then chains
    * `DedupOps.minhashLsh` on the survivors). Fully oracle-checkable. */
  def curate(s: SparkSession, dir: String, minTokens: Int = 30,
      maxStopRatio: Double = 0.4): DataFrame = {
    import s.implicits._
    val toks = split(trim($"text"), "\\s+")
    val nTok = size(toks).cast("double")
    val stopRatio =
      size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in",
        "is", "on", "for", "with"))).cast("double") / nTok
    Tables.documents(s, dir)
      .withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio", stopRatio)
      .filter($"n_tokens" >= minTokens && $"stop_ratio" <= maxStopRatio)
      .withColumn("fp", md5(concat_ws(" ", transform(toks, lower(_)))))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dupes"),
        max($"n_tokens").as("n_tokens"))
  }

  /** Sketch twin of `percentiles`: `approx_percentile` (KLL-style
    * quantile summary — mergeable bounded state, the 100 TB path) at
    * accuracy 1000, checked against the exact value from
    * `ExactQuantiles.quantileCont` (bit-identical to `percentile`, bounded
    * state), so NO query in the registry plans the built-in's full-input
    * ObjectHashAggregate. Oracle-backed via the bound-invariant pattern:
    * emits the exact p50 plus a boolean asserting the sketch landed within
    * 1% relative error; the oracle recomputes the exact value and expects
    * TRUE. The sketch is deterministic given the data, so the flag is
    * stable and a drifting sketch breaks the hash compare. */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val approx = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_approx"))
    val exact = ExactQuantiles.quantileCont(
      Tables.lineitem(s, dir).select($"l_returnflag", $"l_extendedprice"),
      Seq("l_returnflag"), "l_extendedprice", Seq("p50_exact" -> 0.5))
    approx.join(exact, "l_returnflag")
      .select($"l_returnflag", round($"p50_exact", 4).as("p50_exact"),
        (abs($"p50_approx" - $"p50_exact") / $"p50_exact" <= 0.01)
          .as("sketch_within_1pct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_quantiles" -> ((s, d) => approxQuantiles(s, d)),
    "q_percentiles" -> ((s, d) => percentiles(s, d)),
    "q_pivot" -> ((s, d) => pivotOrders(s, d)),
    "q_curate" -> ((s, d) => curate(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_approx_quantiles" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |       TRUE AS sketch_within_1pct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        | round(quantile_cont(l_quantity, 0.25), 4) AS q25_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
        | COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        | COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        | COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        | COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        | COUNT(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY 1""".stripMargin,
    "q_curate" ->
      """WITH t AS (
        |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, text, len(toks) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(toks) AS stop_ratio,
        |         md5(array_to_string(list_transform(toks, x -> lower(x)), ' ')) AS fp
        |  FROM t)
        |SELECT fp, min(doc_id) AS keep_id, count(*) AS n_dupes,
        |       CAST(max(n_tokens) AS INTEGER) AS n_tokens
        |FROM scored
        |WHERE n_tokens >= 30 AND stop_ratio <= 0.4
        |GROUP BY fp""".stripMargin,
  )
}
