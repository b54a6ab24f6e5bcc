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
    * arithmetic, fully codegen'd. */
  private def morton6(x: Column, y: Column): Column =
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anonymity" -> ((s, d) => kAnonymity(s, d)),
    "q_iqr_outliers" -> ((s, d) => iqrOutliers(s, d)),
    "q_zorder" -> ((s, d) => zorderLayout(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_k_anonymity" -> kAnonymitySql,
    "q_iqr_outliers" -> iqrOutliersSql,
    "q_zorder" -> zorderSql,
  )
}
