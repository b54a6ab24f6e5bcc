package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-governance and layout audits a production corpus pipeline runs
  * before publishing a dataset: k-anonymity over quasi-identifiers, IQR
  * outlier detection, and Z-order (Morton-curve) layout keys for
  * multi-dimensional data skipping. All single-pass hash aggregates or
  * row-local bit arithmetic — no joins over the big side, no collect.
  */
object AuditOps {

  /** Default k for the registered query — the oracle SQL interpolates the
    * SAME constant, so the checked pair cannot silently diverge (calls with
    * a custom k are library use, outside the oracle contract). */
  private val DefaultK = 5

  /** k-anonymity audit: quasi-identifier groups (market segment, nation,
    * account-balance band) with fewer than k members are re-identification
    * risks. One hash aggregate over the table; the output is only the risky
    * groups, so the result stays small no matter the input size. */
  def kAnonymity(s: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("bal_band", floor($"c_acctbal" / 2000).cast("long"))
      .groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("n"))
      .filter($"n" < k)
  }

  private val kAnonymitySql =
    s"""SELECT c_mktsegment, c_nationkey,
       |       CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
       |       count(*) AS n
       |FROM customer GROUP BY 1, 2, 3 HAVING count(*) < $DefaultK""".stripMargin

  /** IQR (Tukey fence) outlier counts per return flag: exact interpolated
    * quartiles per group via `ExactQuantiles.quantileCont` (bit-identical to
    * `percentile` = DuckDB `quantile_cont`, but bounded aggregate state —
    * the built-in buffers each group's whole value multiset), then one pass
    * counting rows outside [q1 - 1.5·IQR, q3 + 1.5·IQR]. The quartile table
    * is tiny (|groups| rows) and broadcast back onto the fact scan. */
  def iqrOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_returnflag", $"l_extendedprice")
    val q = ExactQuantiles.quantileCont(li, Seq("l_returnflag"),
      "l_extendedprice", Seq("q1" -> 0.25, "q3" -> 0.75))
    li.join(broadcast(q), "l_returnflag")
      .withColumn("iqr", $"q3" - $"q1")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        count(when($"l_extendedprice" < $"q1" - lit(1.5) * $"iqr" ||
          $"l_extendedprice" > $"q3" + lit(1.5) * $"iqr", 1)).as("n_out"),
        round(max($"q1"), 4).as("q1"), round(max($"q3"), 4).as("q3"))
  }

  private val iqrOutliersSql =
    """WITH q AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, 0.25) AS q1,
      |         quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, count(*) AS n,
      |       count(*) FILTER (l.l_extendedprice < q.q1 - 1.5e0 * (q.q3 - q.q1)
      |                     OR l.l_extendedprice > q.q3 + 1.5e0 * (q.q3 - q.q1)) AS n_out,
      |       round(max(q.q1), 4) AS q1, round(max(q.q3), 4) AS q3
      |FROM lineitem l JOIN q USING (l_returnflag)
      |GROUP BY 1""".stripMargin

  /** Test hook: the Morton key over arbitrary input columns. */
  private[graft] def mortonForTest(df: DataFrame, x: Column, y: Column): DataFrame =
    df.select(morton6(x, y).as("zkey"))

  /** 6-bit × 6-bit Morton (Z-order) interleave — row-local integer bit
    * arithmetic, fully codegen'd. Shared with the manifest-table z-order
    * skipping layout (`Relational.q_zorder_skipping`). */
  private[graft] def morton6(x: Column, y: Column): Column =
    (0 until 6).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order layout audit: interleave part size and a price band into a
    * Morton key, then show per-Z-range stats — each range covers a tight
    * (size × price) rectangle, which is exactly why sorting files by this
    * key lets min/max row-group stats skip on BOTH dimensions at once.
    * At 100 TB this is the write-side `sortWithinPartitions(zkey)` before
    * a parquet sink; the audit aggregate here proves the locality. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .withColumn("price_band",
        least(lit(63), floor($"p_retailprice" / 32)).cast("int"))
      .withColumn("zkey", morton6($"p_size".cast("int"), $"price_band"))
      .groupBy(shiftright($"zkey", 6).as("zrange"))
      .agg(count(lit(1)).as("n"),
        min($"p_size").as("min_size"), max($"p_size").as("max_size"),
        min($"price_band").as("min_band"), max($"price_band").as("max_band"))
  }

  private val zorderSql = {
    val morton = (0 until 6).map { i =>
      s"(((p_size >> $i) & 1) << ${2 * i}) + (((price_band >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT CAST(p_size AS INTEGER) AS p_size,
       |         CAST(least(63, floor(p_retailprice / 32)) AS INTEGER) AS price_band
       |  FROM part),
       |z AS (SELECT p_size, price_band, $morton AS zkey FROM b)
       |SELECT zkey >> 6 AS zrange, count(*) AS n,
       |       min(p_size) AS min_size, max(p_size) AS max_size,
       |       min(price_band) AS min_band, max(price_band) AS max_band
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Benford's-law first-digit audit over order totals — the classic
    * fabricated-data screen: naturally-grown monetary amounts follow
    * P(d) = log10(1 + 1/d); synthetic or tampered columns usually don't.
    * One hash aggregate over 9 groups plus a broadcast singleton total.
    * The leading digit is taken from the decimal rendering of the integer
    * part — exact in both engines, where float `log10` near powers of ten
    * is not (log10(1000) can land at 2.9999999999999996 and shift the
    * digit). Shares are rounded to 6 dp before compare — doubles agree to
    * ~1e-16, the grain is 1e-6. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.orders(s, dir)
      .filter($"o_totalprice" >= 1)
      .select(substring(floor($"o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val total = d.agg(sum($"n").as("tot"))
    d.crossJoin(broadcast(total))
      .select($"digit", $"n",
        round($"n".cast("double") / $"tot".cast("double"), 6).as("observed_p"),
        round(log10(lit(1.0) + lit(1.0) / $"digit".cast("double")), 6)
          .as("benford_p"))
      .withColumn("dev", round($"observed_p" - $"benford_p", 6))
  }

  private val benfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
      |                     1, 1) AS INTEGER) AS digit
      |  FROM orders WHERE o_totalprice >= 1),
      |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |t AS (SELECT sum(n) AS tot FROM c)
      |SELECT digit, n,
      |       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS observed_p,
      |       round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
      |       round(round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6)
      |             - round(log10(1.0 + 1.0 / digit), 6), 6) AS dev
      |FROM c, t""".stripMargin

  /** In-flight data-quality metrics via `observe()` — the monitoring gate a
    * production pipeline attaches to its MAIN job so quality counters cost
    * ZERO extra scans. `Dataset.observe` plants a `CollectMetrics` node in
    * the plan: the named aggregates accumulate per-task (accumulator-based,
    * O(1) state, no extra shuffle) while the SAME single pass computes the
    * job's real result — at 100 TB the alternative is a second full
    * monitoring query, i.e. doubling the scan bill to learn what the first
    * job already saw. The pipeline here: lineitem → discount-policy screen →
    * the job's own count; observed = rows in, policy violations, bulk-order
    * rows. Eager by necessity (metrics exist only after the action); output
    * is one bounded row, every value an exact count restated by the oracle. */
  def observeMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gate = org.apache.spark.sql.Observation()
    val screened = Tables.lineitem(s, dir)
      .observe(gate,
        count(lit(1)).as("rows_in"),
        sum(when($"l_discount" > 0.05, 1L).otherwise(0L)).as("n_high_discount"),
        sum(when($"l_quantity" >= 30, 1L).otherwise(0L)).as("n_bulk"))
      .filter($"l_discount" <= 0.05)
    val rowsOut = screened.count() // the job's action; metrics ride along
    val m = gate.get
    Seq((m("rows_in").asInstanceOf[Long],
      m("n_high_discount").asInstanceOf[Long],
      m("n_bulk").asInstanceOf[Long], rowsOut))
      .toDF("rows_in", "n_high_discount", "n_bulk", "rows_out")
      .withColumn("high_discount_frac",
        round($"n_high_discount".cast("double") / $"rows_in", 6))
  }

  private val observeMetricsSql =
    """SELECT count(*) AS rows_in,
      |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount,
      |  CAST(sum(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
      |  CAST(sum(CASE WHEN l_discount <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS rows_out,
      |  round(CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS high_discount_frac
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_observe_metrics" -> ((s, d) => observeMetrics(s, d)),
    "q_k_anonymity" -> ((s, d) => kAnonymity(s, d)),
    "q_iqr_outliers" -> ((s, d) => iqrOutliers(s, d)),
    "q_zorder" -> ((s, d) => zorderLayout(s, d)),
    "q_benford" -> ((s, d) => benfordAudit(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_observe_metrics" -> observeMetricsSql,
    "q_k_anonymity" -> kAnonymitySql,
    "q_iqr_outliers" -> iqrOutliersSql,
    "q_zorder" -> zorderSql,
    "q_benford" -> benfordSql,
  )
}
