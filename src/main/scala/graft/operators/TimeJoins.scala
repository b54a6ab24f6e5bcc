package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-keyed joins — the reference's declared trips⨝weather capability:
  * "joined (trips + weather) by time and zone in dbt models"
  * (`/root/reference/readme.md:135-136`), SURVEY.md §2.4 J2.
  *
  * Two scale-aware shapes:
  *  - bucket equi-join: truncate both sides to a common grain and equi-join —
  *    a plain shuffled hash join Catalyst/AQE can optimize (and broadcast when
  *    one side aggregates small, as a per-day observation table does);
  *  - as-of join: "latest observation at or before this event" expressed as a
  *    single partitioned sort + running `last(ignoreNulls)` window — one
  *    shuffle on the partition key, no range cross-product, scales linearly
  *    with rows per key (vs the naive O(n·m) inequality join).
  */
object TimeJoins {
  private val D2 = DecimalType(18, 2)

  /** Day-bucket equi-join: shipments (trips analog) ⨝ per-day order stats
    * (weather-observation analog), then aggregate per day. */
  def dayBucketJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ship = Tables.lineitem(s, dir)
      .select(date_trunc("day", $"l_shipdate").as("day_ts"), $"l_quantity")
    val orderDay = Tables.orders(s, dir)
      .groupBy(date_trunc("day", $"o_orderdate").as("day_ts"))
      .agg(
        sum($"o_totalprice".cast(DecimalType(18, 4))).cast(DecimalType(18, 4)).as("sum_price"),
        count(lit(1)).as("n_orders"))
    ship.join(orderDay, "day_ts")
      .groupBy($"day_ts")
      .agg(
        count(lit(1)).as("n_ship"),
        sum($"l_quantity".cast(D2)).cast("double").as("sum_qty"),
        max($"n_orders").as("n_orders"),
        max($"sum_price").cast("double").as("sum_price"))
  }

  private val dayBucketJoinSql =
    """WITH ship AS (
      |  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day_ts, l_quantity FROM lineitem),
      |od AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_ts,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_price,
      |         count(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT s.day_ts, count(*) AS n_ship,
      |       CAST(SUM(CAST(s.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       max(od.n_orders) AS n_orders, CAST(max(od.sum_price) AS DOUBLE) AS sum_price
      |FROM ship s JOIN od USING (day_ts) GROUP BY s.day_ts""".stripMargin

  /** As-of join within the `events` stream: for every purchase, the timestamp
    * of the most recent prior error by the same user. One shuffle on
    * `user_id`, one sort per partition — the idiomatic Spark as-of plan. */
  def asofLastError(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"event_type" === "purchase" || $"event_type" === "error")
    // errors sort BEFORE purchases at equal ts: the oracle's ASOF condition
    // `p.ts >= e.ts` is inclusive, so a same-timestamp error must be visible
    // to the purchase's running `last` regardless of event_id order
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", when($"event_type" === "error", 0).otherwise(1), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("err_ts", when($"event_type" === "error", $"ts"))
      .withColumn("last_error_ts", last($"err_ts", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".as("purchase_ts"), $"last_error_ts")
  }

  private val asofLastErrorSql =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |       CAST(e.ts AS TIMESTAMP) AS last_error_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts""".stripMargin

  /** Hourly demand per event type — the "demand per zone-hour" flagship grain
    * (`/root/reference/readme.md:136`): tumbling-window style hash agg. */
  def demandByHour(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value".cast(D2)).cast("double").as("sum_value"))
  }

  private val demandByHourSql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
      |       count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** As-of join with a staleness tolerance: the matched error must fall
    * within `toleranceMinutes` before the purchase, else the match is
    * blanked — the common "don't join against stale observations" variant.
    * Same single-shuffle window plan as [[asofLastError]]; the tolerance is
    * a row-local post-filter on the matched timestamp. */
  def asofWithTolerance(s: SparkSession, dir: String,
      toleranceMinutes: Long = 60): DataFrame = {
    import s.implicits._
    asofLastError(s, dir)
      .withColumn("last_error_ts",
        when(unix_micros($"purchase_ts") - unix_micros($"last_error_ts")
          <= toleranceMinutes * 60L * 1000000L, $"last_error_ts"))
  }

  private val asofWithToleranceSql =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |       CASE WHEN epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP))
      |                 <= 3600000000 THEN CAST(e.ts AS TIMESTAMP) END AS last_error_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND p.ts >= e.ts""".stripMargin

  /** Time-series resampling with gap fill: hourly per-type aggregates on a
    * dense hour scaffold — missing hours get n=0 and a forward-filled last
    * observed sum (the "carry the last reading" contract of sensor/metrics
    * pipelines). Scaffold generation is per-group `sequence(min, max)` — no
    * driver loop, no cross join against a global calendar; the fill is one
    * partitioned running `last(ignoreNulls)` window, so the whole op costs
    * one shuffle on event_type beyond the base aggregate. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("n"), sum($"value".cast(D2)).as("sum_v"))
    val scaffold = hourly.groupBy($"event_type")
      .agg(min($"hr").as("lo"), max($"hr").as("hi"))
      .select($"event_type",
        explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy($"event_type").orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(hourly, Seq("event_type", "hr"), "left")
      .select($"event_type", $"hr",
        coalesce($"n", lit(0L)).as("n"),
        last($"sum_v", ignoreNulls = true).over(w).cast("double").as("ffill_sum"))
  }

  private val gapFillSql =
    """WITH hourly AS (
      |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
      |         count(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sum_v
      |  FROM events GROUP BY 1, 2),
      |scaffold AS (
      |  SELECT event_type,
      |         unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
      |  FROM hourly GROUP BY event_type)
      |SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n,
      |       CAST(last_value(h.sum_v IGNORE NULLS) OVER (
      |              PARTITION BY s.event_type ORDER BY s.hr
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS ffill_sum
      |FROM scaffold s
      |LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hr = h.hr""".stripMargin

  /** Point-in-time feature join — the FEATURE-STORE primitive: each label
    * event (purchase) is enriched with the state of several independent
    * feature streams exactly AS OF its timestamp (latest click value,
    * latest view value, clicks-to-date), never leaking anything from the
    * future — the training-serving-skew bug this join exists to prevent.
    *
    * Scale shape: the naive form is one as-of join PER feature table
    * (N features → N shuffles of the spine). Here all feature streams and
    * the spine union-tag into ONE user-keyed shuffle and one ordered
    * window pass; each feature is a `last(…, ignoreNulls)` (or running
    * sum) over the same window — N features for the price of one shuffle,
    * and adding a feature adds a column, not a join. Feature rows sort
    * BEFORE the spine at equal ts so the as-of is inclusive, matching the
    * oracle's `p.ts >= f.ts`. Per-user timelines are bounded (the
    * sessionization argument); the corpus of users is what scales and is
    * what's partitioned. */
  def pitFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"event_type".isin("purchase", "click", "view"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", when($"event_type" === "purchase", 1).otherwise(0), $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_v", when($"event_type" === "click", $"value"))
      .withColumn("view_v", when($"event_type" === "view", $"value"))
      .withColumn("last_click_value", last($"click_v", ignoreNulls = true).over(w))
      .withColumn("last_view_value", last($"view_v", ignoreNulls = true).over(w))
      .withColumn("n_clicks_so_far",
        sum(when($"event_type" === "click", 1L).otherwise(0L)).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".as("label_ts"),
        $"last_click_value", $"last_view_value", $"n_clicks_so_far")
  }

  // shared with the streaming PIT (stream must equal batch)
  private[graft] val pitFeaturesSql =
    """WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
      |v AS (SELECT * FROM events WHERE event_type = 'view'),
      |p AS (SELECT * FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS label_ts,
      |       c.value AS last_click_value,
      |       v.value AS last_view_value,
      |       (SELECT CAST(count(*) AS BIGINT) FROM c c2
      |        WHERE c2.user_id = p.user_id AND c2.ts <= p.ts) AS n_clicks_so_far
      |FROM p
      |ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pit_features" -> ((s, d) => pitFeatures(s, d)),
    "q_time_join_day" -> ((s, d) => dayBucketJoin(s, d)),
    "q_asof_last_error" -> ((s, d) => asofLastError(s, d)),
    "q_asof_tolerance" -> ((s, d) => asofWithTolerance(s, d)),
    "q_demand_by_hour" -> ((s, d) => demandByHour(s, d)),
    "q_gap_fill" -> ((s, d) => gapFill(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_pit_features" -> pitFeaturesSql,
    "q_time_join_day" -> dayBucketJoinSql,
    "q_asof_last_error" -> asofLastErrorSql,
    "q_asof_tolerance" -> asofWithToleranceSql,
    "q_demand_by_hour" -> demandByHourSql,
    "q_gap_fill" -> gapFillSql,
  )
}
