package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OLAP surface beyond the reference's literal queries: grouping sets
  * (rollup/cube), Spark-4 VARIANT, date arithmetic, sketch aggregates, and
  * sampling — the standard analytics toolbox a user of this engine expects
  * (SURVEY.md §2.5/§2.7 extensions; sampling is the documented 100 TB
  * replacement for the reference's 200k-row cap, SURVEY.md §4).
  */
object OlapExtras {
  private val D2 = DecimalType(18, 2)

  /** Variant shredding round trip (see the `q_variant_shredded` registry
    * comment): write `parse_json(props)` as a SHREDDED variant parquet —
    * typed subcolumns beside the binary — then read it back extracting the
    * typed `$.k` subcolumn straight from the scan. At 100 TB this is the
    * difference between decoding every variant binary per query and a plain
    * pruned typed-column scan with parquet min/max pushdown; the write-side
    * cost is paid once at ingest. Session configs are restored after the
    * write so shredding stays an explicit per-sink choice, and the read-side
    * push (`pushVariantIntoScan`) is left at its session default — the probe
    * asserts the SHREDDED FILE enables it, not a session-wide override. */
  def variantShredded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_variant_shred_" +
      java.lang.ProcessHandle.current().pid()
    val keys = Seq("spark.sql.variant.writeShredding.enabled",
      "spark.sql.variant.inferShreddingSchema",
      "spark.sql.variant.allowReadingShredded")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      keys.foreach(k => s.conf.set(k, "true"))
      Tables.events(s, dir)
        .select($"event_id", parse_json($"props").as("v"))
        .write.mode("overwrite").parquet(tmp)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    s.read.parquet(tmp)
      .select(variant_get($"v", "$.k", "int").as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
  }

  /** SCD Type-2 dimension versioning: two deterministic snapshots of the
    * customer dimension (base at 2024-01-01; every 7th customer re-snapshot
    * at 2024-06-01 with a changed balance) merged into validity intervals —
    * `valid_from`/`valid_to` via `lead` over (custkey, version_ts),
    * `is_current` where the interval is open. The warehouse temporal-merge
    * shape: one union + one partitioned window, shuffle keyed on custkey
    * only. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val base = Tables.customer(s, dir)
      .select($"c_custkey", $"c_acctbal",
        lit("2024-01-01 00:00:00").cast("timestamp").as("version_ts"))
    val update = Tables.customer(s, dir)
      .filter($"c_custkey" % 7 === 0)
      .select($"c_custkey", ($"c_acctbal" + 100.0).as("c_acctbal"),
        lit("2024-06-01 00:00:00").cast("timestamp").as("version_ts"))
    val w = Window.partitionBy($"c_custkey").orderBy($"version_ts")
    base.union(update)
      .withColumn("valid_from", $"version_ts")
      .withColumn("valid_to", lead($"version_ts", 1).over(w))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"c_custkey", $"c_acctbal", $"valid_from", $"valid_to", $"is_current")
  }

  private val scd2Sql =
    """WITH snaps AS (
      |  SELECT c_custkey, c_acctbal, TIMESTAMP '2024-01-01 00:00:00' AS version_ts
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal + 100.0, TIMESTAMP '2024-06-01 00:00:00'
      |  FROM customer WHERE c_custkey % 7 = 0)
      |SELECT c_custkey, c_acctbal, version_ts AS valid_from,
      |       lead(version_ts) OVER (PARTITION BY c_custkey ORDER BY version_ts) AS valid_to,
      |       lead(version_ts) OVER (PARTITION BY c_custkey ORDER BY version_ts) IS NULL AS is_current
      |FROM snaps""".stripMargin

  /** Statistical aggregates: per-flag Pearson correlation, sample
    * stddev/variance, and sample covariance — the moments family. Both
    * engines use numerically stable single-pass algorithms whose float
    * results can differ in the last ulps (merge order), so every output is
    * rounded to 6. */
  def corrStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
        round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
        round(var_samp($"l_discount"), 6).as("var_disc"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 6).as("cov_qty_price"))
  }

  private val corrStatsSql =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  round(var_samp(l_discount), 6) AS var_disc,
      |  round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Event-transition counts — the first-order Markov view of user
    * behavior: for each user's time-ordered event stream, count
    * (current_type → next_type) pairs. One `lead` window partitioned by
    * user (shuffle on user_id, bounded per-user state) + one small hash
    * aggregate over the 5×5 type grid. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("from_type"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n"))
  }

  private val eventTransitionsSql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, count(*) AS n
      |FROM seq WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type""".stripMargin

  /** Key-skew diagnostic: the 10 heaviest join keys with their share of all
    * rows — the report that decides whether a join needs salting (see
    * `ScaleOps.saltedJoin`). One hash aggregate + a bounded top-k. */
  def keySkew(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.lineitem(s, dir)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
    val total = per.agg(sum($"n").as("total_n"))
    per.join(broadcast(total))
      .select($"l_suppkey", $"n",
        ($"n".cast("double") / $"total_n".cast("double")).as("share"))
      .orderBy($"n".desc, $"l_suppkey")
      .limit(10)
  }

  private val keySkewSql =
    """WITH per AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey),
      |t AS (SELECT SUM(n) AS total_n FROM per)
      |SELECT l_suppkey, n, CAST(n AS DOUBLE) / CAST(total_n AS DOUBLE) AS share
      |FROM per, t
      |ORDER BY n DESC, l_suppkey LIMIT 10""".stripMargin

  /** Share-of-total: per-status revenue and its fraction of the whole. The
    * naive form is `sum(x) over ()` — an empty-partition window that funnels
    * every row through ONE task; the scale-safe form computed here derives
    * the total from the already-aggregated per-group rows via a broadcast
    * singleton cross join. Shares are exact-decimal ratios cast to double —
    * a single IEEE division, bit-identical across engines, left unrounded. */
  def shareOfTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(sum($"o_totalprice".cast(D2)).as("rev"))
    val total = per.agg(sum($"rev").as("total_rev"))
    per.join(broadcast(total))
      .select($"o_orderstatus",
        $"rev".cast("double").as("revenue"),
        ($"rev".cast("double") / $"total_rev".cast("double")).as("share"))
  }

  private val shareOfTotalSql =
    """WITH per AS (
      |  SELECT o_orderstatus, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY o_orderstatus),
      |t AS (SELECT SUM(rev) AS total_rev FROM per)
      |SELECT o_orderstatus, CAST(rev AS DOUBLE) AS revenue,
      |       CAST(rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS share
      |FROM per, t""".stripMargin

  /** Cohort retention: users grouped by first-seen week, counted per
    * activity-week offset — the product-analytics staple. Two aggregates
    * (first-seen per user; distinct user-weeks) joined on user_id, then one
    * count-distinct keyed on (cohort, offset); every shuffle is on user_id
    * or the small cohort grid. Week arithmetic is exact integer day-diffs
    * divided by 7 — both engines truncate Monday weeks. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val firstSeen = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    val active = ev.select($"user_id", date_trunc("week", $"ts").as("act_week"))
      .distinct()
    active.join(firstSeen, "user_id")
      .groupBy($"cohort_week",
        (datediff($"act_week", $"cohort_week") / 7).cast("int").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  private val cohortRetentionSql =
    """WITH f AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
      |  FROM events)
      |SELECT f.cohort_week,
      |       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS INTEGER) AS week_offset,
      |       count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  /** RANGE-frame moving window: trailing-7-day shipped quantity per
    * supplier — a frame defined by the ORDER-BY VALUE (days), not row
    * position, so gaps in the calendar shrink the frame (vs the rows-frame
    * running sum of `q_window_running`). Pre-aggregating to one row per
    * (supplier, day) first keeps the window input minimal; one shuffle on
    * suppkey. */
  def rangeFrameWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val daily = Tables.lineitem(s, dir)
      .groupBy($"l_suppkey",
        datediff(date_trunc("day", $"l_shipdate"),
          lit("2024-01-01").cast("date")).as("day_no"))
      .agg(sum($"l_quantity".cast(D2)).as("qty"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"day_no")
      .rangeBetween(-6, 0)
    daily.select($"l_suppkey", $"day_no",
      sum($"qty").over(w).cast("double").as("qty_7d"))
  }

  private val rangeFrameWindowSql =
    """WITH daily AS (
      |  SELECT l_suppkey,
      |         date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', l_shipdate) AS DATE)) AS day_no,
      |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_suppkey, CAST(day_no AS INTEGER) AS day_no,
      |       CAST(SUM(qty) OVER (PARTITION BY l_suppkey ORDER BY day_no
      |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_7d
      |FROM daily""".stripMargin

  /** Distribution window functions: quartile bucket (`ntile`), relative rank
    * (`percent_rank`), and cumulative distribution (`cume_dist`) of each
    * order inside its priority class. The ORDER BY includes the unique
    * orderkey so every row is its own peer group — both engines then compute
    * identical exact rationals. One shuffle on the partition key; per-group
    * state is a sort buffer, bounded by the largest priority class. */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir).select(
      $"o_orderkey",
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cdist"))
  }

  private val windowDistributionSql =
    """SELECT o_orderkey,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Wide→long melt (`unpivot`/`UNPIVOT`): a per-status metrics row becomes
    * one row per (status, metric). The wide input is already aggregated (9
    * rows), so the melt itself is row-local; averages are exact-decimal sums
    * divided once in double, bit-identical across engines. */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        (sum($"o_totalprice".cast(D2)).cast("double") / count(lit(1))).as("avg_price"),
        max($"o_totalprice").as("max_price"))
    wide.unpivot(
      Array($"o_orderstatus"),
      Array($"n_orders", $"avg_price", $"max_price"),
      "metric", "val")
  }

  private val unpivotMetricsSql =
    """WITH wide AS (
      |  SELECT o_orderstatus,
      |         CAST(count(*) AS DOUBLE) AS n_orders,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |         max(o_totalprice) AS max_price
      |  FROM orders GROUP BY o_orderstatus)
      |UNPIVOT wide ON n_orders, avg_price, max_price INTO NAME metric VALUE val""".stripMargin

  /** Conditional / selective aggregates: FILTER-style counting (`count_if`),
    * CASE-guarded sums, boolean any/all (`bool_or`/`bool_and`), and
    * value-at-argmax (`max_by` / `arg_max`) with a unique ordering key so the
    * argmax is deterministic in both engines.
    *
    * The argmax payload is carried as a LONG surrogate, not a string:
    * `max_by(string, key)` has an immutable (string-typed) aggregation
    * buffer, which disqualifies HashAggregate and forces SortAggregate — a
    * per-partition sort of all of lineitem for a 3-row result (measured 2×
    * slower). Encoding `key·256 + ascii(status)` keeps every buffer slot
    * primitive (the ascii low byte can't change which key wins), the plan
    * stays one HashAggregate with map-side partials, and the char is decoded
    * after the aggregate touches 3 rows. */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count_if($"l_discount" > 0.05).as("n_disc"),
        sum(when($"l_tax" > 0.04, $"l_quantity".cast(D2)).otherwise(lit(0).cast(D2)))
          .cast("double").as("taxed_qty"),
        bool_or($"l_quantity" > 49).as("any_max_qty"),
        bool_and($"l_quantity" > 0).as("all_pos"),
        max(($"l_orderkey" * 10 + $"l_linenumber") * 256
          + ascii($"l_linestatus")).as("__argmax_enc"))
      .withColumn("last_status", expr("char(__argmax_enc % 256)"))
      .drop("__argmax_enc")
  }

  private val conditionalAggSql =
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
      |  CAST(SUM(CASE WHEN l_tax > 0.04 THEN CAST(l_quantity AS DECIMAL(18,2))
      |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS taxed_qty,
      |  bool_or(l_quantity > 49) AS any_max_qty,
      |  bool_and(l_quantity > 0) AS all_pos,
      |  arg_max(l_linestatus, l_orderkey * 10 + l_linenumber) AS last_status
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Funnel analysis over the event stream: per user, the first view, the
    * first click AFTER that view, the first purchase AFTER that click —
    * ordered-sequence semantics, not mere per-type counts. Three stage
    * aggregates, each joined on user_id (same key → the shuffle partitioning
    * is reused across stages); output is the one-row stage-count summary. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val c = ev.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .agg(count(lit(1)).as("n_view"),
        count($"c_ts").as("n_click_after_view"),
        count($"p_ts").as("n_purchase_after_click"))
  }

  private val funnelSql =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
      |SELECT count(*) AS n_view,
      |       count(c_ts) AS n_click_after_view,
      |       count(p_ts) AS n_purchase_after_click
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2" -> ((s, d) => scd2(s, d)),
    "q_funnel" -> ((s, d) => funnel(s, d)),
    "q_cohort_retention" -> ((s, d) => cohortRetention(s, d)),
    "q_window_range_frame" -> ((s, d) => rangeFrameWindow(s, d)),
    "q_share_of_total" -> ((s, d) => shareOfTotal(s, d)),
    "q_event_transitions" -> ((s, d) => eventTransitions(s, d)),
    "q_key_skew" -> ((s, d) => keySkew(s, d)),
    "q_corr_stats" -> ((s, d) => corrStats(s, d)),
    "q_window_distribution" -> ((s, d) => windowDistribution(s, d)),
    "q_unpivot" -> ((s, d) => unpivotMetrics(s, d)),
    "q_conditional_agg" -> ((s, d) => conditionalAgg(s, d)),
    "q_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(D2)).cast("double").as("sum_qty"))
    }),
    "q_cube" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .cube(year($"o_orderdate").as("yr"), $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),
    // explicit GROUPING SETS with grouping_id — disambiguates a NULL group
    // value from a rollup-generated total row (SQL-only surface in Spark)
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql("""
        SELECT year(o_orderdate) AS yr, o_orderpriority,
               count(*) AS n,
               CAST(grouping_id(year(o_orderdate), o_orderpriority) AS INT) AS gid
        FROM graft_orders_gs
        GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                                (year(o_orderdate)), ())""")
    }),
    // Spark 4 VARIANT: parse once, extract typed fields lazily — the engine
    // answer to the reference's PARSE_JSON VARIANT column (SURVEY.md §1.2)
    "q_variant_get" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(variant_get(parse_json($"props"), "$.k", "int").as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
    }),
    // Variant SHREDDING — the 100 TB path for semi-structured columns:
    // `q_variant_get` still binary-decodes every variant per extraction; here
    // the variant is WRITTEN shredded (typed parquet subcolumns beside the
    // binary, `spark.sql.variant.writeShredding` + inferred shredding
    // schema) and the read pushes `variant_get` INTO the scan
    // (`pushVariantIntoScan`), so the query reads only the typed `$.k`
    // subcolumn — column pruning + min/max stats on JSON-born data, no
    // per-row decode. Plan-asserted in OlapSpec (scan schema shows the
    // shredded typed field, not a full variant decode); the oracle restates
    // the identity round trip from the raw events JSON.
    "q_variant_shredded" -> ((s, d) => variantShredded(s, d)),
    "q_date_arith" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).select(
        $"o_orderkey",
        add_months($"o_orderdate", 3).as("plus_3m"),
        date_add($"o_orderdate".cast("date"), 30).as("plus_30d"),
        last_day($"o_orderdate").as("month_end"),
        datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_98"))
    }),
    // HLL sketch distinct, oracle-backed via the bound-invariant pattern
    // (like q_sampled_estimate): the query emits the EXACT distinct count
    // plus a boolean asserting the HLL estimate (rsd 0.02 — a fixed
    // ~KB-sized mergeable sketch regardless of input size, the 100 TB path)
    // landed within 5% of it; the oracle recomputes the exact count and
    // expects TRUE. HLL is hash-deterministic, so the flag is stable across
    // runs/partitionings and a drifting sketch breaks the hash compare.
    // Dedupe-first shape: mixing countDistinct with a non-distinct aggregate
    // makes Catalyst plan an Expand that doubles every input row before the
    // shuffle. Grouping by (flag, orderkey) first lets the partial aggregate
    // collapse duplicates map-side, then both the exact count and the HLL run
    // over already-distinct keys — the HLL estimate is bit-identical either
    // way (registers are max(rho(hash(v))), duplicate-insensitive), and the
    // shuffle carries distinct pairs instead of 2× the table.
    "q_approx_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_orderkey").distinct()
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("exact_orders"),
          approx_count_distinct($"l_orderkey", 0.02).as("__approx"))
        .select($"l_returnflag", $"exact_orders",
          (abs($"__approx" - $"exact_orders").cast("double") /
            $"exact_orders" <= 0.05).as("hll_within_5pct"))
    }),
    // deterministic ~10% Bernoulli sample via an md5-prefix gate — the
    // scale-out replacement for limit(200k). Hash-gated (vs `.sample`'s
    // per-partition seeded RNG) so the selected set is invariant under file
    // splits, AQE repartitioning, and task retries — `.sample(seed)` changes
    // its answer whenever the partitioning does, which at 100 TB it will.
    // Gate: first 4 hex chars of md5(rowkey) < 0x1999 = 6553/65536 ≈ 9.999%.
    "q_sample" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter(substring(md5(concat_ws("_", $"l_orderkey", $"l_linenumber")), 1, 4) < "1999")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_scd2" -> scd2Sql,
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_window_range_frame" -> rangeFrameWindowSql,
    "q_share_of_total" -> shareOfTotalSql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_key_skew" -> keySkewSql,
    "q_corr_stats" -> corrStatsSql,
    "q_window_distribution" -> windowDistributionSql,
    "q_unpivot" -> unpivotMetricsSql,
    "q_conditional_agg" -> conditionalAggSql,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        |       count(*) AS n
        |FROM orders GROUP BY CUBE (yr, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """WITH o AS (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
        |                  o_orderpriority FROM orders)
        |SELECT yr, o_orderpriority, count(*) AS n,
        |       CAST(GROUPING(yr) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid
        |FROM o
        |GROUP BY GROUPING SETS ((yr, o_orderpriority), (yr), ())""".stripMargin,
    "q_variant_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    // shredded write → pushed read is an identity on $.k, so the oracle is
    // the same restatement from the raw JSON (the roundtrip-oracle pattern
    // of q_orc_roundtrip / q_dsv2_sink)
    "q_variant_shredded" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_date_arith" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
        |       CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98
        |FROM orders""".stripMargin,
    "q_sample" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE substr(md5(l_orderkey || '_' || l_linenumber), 1, 4) < '1999'
        |GROUP BY 1""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |       TRUE AS hll_within_5pct
        |FROM lineitem GROUP BY 1""".stripMargin,
  )
}
