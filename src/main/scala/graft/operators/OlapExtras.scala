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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_date_arith" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).select(
        $"o_orderkey",
        add_months($"o_orderdate", 3).as("plus_3m"),
        date_add($"o_orderdate".cast("date"), 30).as("plus_30d"),
        last_day($"o_orderdate").as("month_end"),
        datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_98"))
    }),
    // HLL sketch distinct — rows-only (sketch estimates are engine-specific);
    // accuracy asserted in ScalaTest against exact counts
    "q_approx_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey").as("approx_orders"))
    }),
    // seeded Bernoulli sample — the scale-out replacement for limit(200k);
    // rows-only (sampling RNG is engine-specific)
    "q_sample" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).sample(withReplacement = false, 0.1, seed = 42)
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    }),
  )

  val oracle: Map[String, String] = Map(
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
    "q_date_arith" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
        |       CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98
        |FROM orders""".stripMargin,
    // q_approx_distinct / q_sample: rows-only (engine-specific sketch / RNG)
  )
}
