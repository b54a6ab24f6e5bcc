package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-integrity operators: CDC merge (MERGE INTO semantics on plain
  * parquet), referential-integrity audit, and an A/B-test readout. All
  * single-pass aggregates or key-partitioned windows/joins — shapes that
  * hold at 100 TB.
  */
object IntegrityOps {

  private val D2 = DecimalType(18, 2)

  /** CDC apply: a base snapshot merged with an ordered change feed of
    * upserts and deletes — the MERGE INTO / compaction step of every
    * incremental pipeline, expressed engine-agnostically: union the base
    * (op I, seq 1) with updates (op U, seq 2) and deletes (op D, seq 3),
    * keep each key's LATEST change (one row_number window partitioned by
    * key — state bounded per key), drop deletes. The change feed is derived
    * deterministically from the fixture (keys %7 → price update of +10,
    * keys %11 → delete) so the oracle can rebuild it. Output: per-status
    * counts + money sums of the post-merge snapshot. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val base = o.select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
      lit("I").as("op"), lit(1).as("seq"))
    val upd = o.filter($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_orderstatus",
        ($"o_totalprice" + 10.0).as("o_totalprice"),
        lit("U").as("op"), lit(2).as("seq"))
    val del = o.filter($"o_orderkey" % 11 === 0)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        lit("D").as("op"), lit(3).as("seq"))
    val w = Window.partitionBy($"o_orderkey").orderBy($"seq".desc)
    base.unionAll(upd).unionAll(del)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"op" =!= "D")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(D2)).cast("double").as("sum_price"))
  }

  private val cdcApplySql =
    """WITH feed AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'I' AS op, 1 AS seq
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10.0, 'U', 2
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 3
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |                               ORDER BY seq DESC) AS rn
      |  FROM feed)
      |SELECT o_orderstatus, count(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM latest WHERE rn = 1 AND op <> 'D'
      |GROUP BY 1""".stripMargin

  /** Referential-integrity audit across the star schema: orphan counts for
    * every foreign key, in long form. Each check is one left-anti join
    * (dims broadcast by AQE); at 100 TB this is the pre-publish gate that
    * catches a bad partition swap. */
  def refIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    def orphans(name: String, d: DataFrame): DataFrame =
      d.groupBy().agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk"), $"n_orphans")
    orphans("lineitem.orderkey",
      li.join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey", "left_anti"))
      .unionAll(orphans("lineitem.partkey",
        li.join(Tables.part(s, dir), $"l_partkey" === $"p_partkey", "left_anti")))
      .unionAll(orphans("lineitem.suppkey",
        li.join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey", "left_anti")))
      .unionAll(orphans("orders.custkey",
        Tables.orders(s, dir).join(Tables.customer(s, dir),
          $"o_custkey" === $"c_custkey", "left_anti")))
  }

  private val refIntegritySql =
    """SELECT 'lineitem.orderkey' AS fk, count(*) AS n_orphans
      |FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'lineitem.partkey', count(*) FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |UNION ALL
      |SELECT 'lineitem.suppkey', count(*) FROM lineitem l WHERE NOT EXISTS
      |  (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      |UNION ALL
      |SELECT 'orders.custkey', count(*) FROM orders o WHERE NOT EXISTS
      |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin

  /** A/B-test readout: users hash-split into two arms (deterministic
    * `user_id % 2` — the same reproducibility argument as the train/test
    * split), conversion = ≥14 purchases (the fixture's median; every user
    * has ≥1, so a made-any-purchase cut would put the pooled rate at 1.0
    * and the z denominator at 0). One per-user aggregate, one conditional
    * global aggregate, then the two-proportion z statistic from exact
    * integer counts — identical doubles on both engines. */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(when(count(when($"event_type" === "purchase", 1)) >= 14, 1)
        .otherwise(0).as("converted"))
      .withColumn("arm", ($"user_id" % 2).cast("int"))
    val agg = perUser.groupBy().agg(
      count(when($"arm" === 0, 1)).as("n_a"),
      count(when($"arm" === 1, 1)).as("n_b"),
      sum(when($"arm" === 0, $"converted").otherwise(0)).as("conv_a"),
      sum(when($"arm" === 1, $"converted").otherwise(0)).as("conv_b"))
    // every quotient via explicit double casts: under ANSI (Spark 4
    // default) `/` on two integral columns is INTEGRAL division
    val rateA = $"conv_a".cast("double") / $"n_a".cast("double")
    val rateB = $"conv_b".cast("double") / $"n_b".cast("double")
    val pooled = ($"conv_a" + $"conv_b").cast("double") /
      ($"n_a" + $"n_b").cast("double")
    agg.select(
      $"n_a", $"n_b", $"conv_a", $"conv_b",
      round(rateA, 6).as("rate_a"),
      round(rateB, 6).as("rate_b"),
      round((rateA - rateB) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / $"n_a".cast("double") + lit(1.0) / $"n_b".cast("double"))),
        6).as("z"))
  }

  private val abTestSql =
    """WITH u AS (
      |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
      |         CASE WHEN count(*) FILTER (event_type = 'purchase') >= 14
      |              THEN 1 ELSE 0 END AS converted
      |  FROM events GROUP BY 1, 2),
      |a AS (SELECT
      |  count(*) FILTER (arm = 0) AS n_a,
      |  count(*) FILTER (arm = 1) AS n_b,
      |  CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |  CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM u)
      |SELECT n_a, n_b, conv_a, conv_b,
      |       round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
      |       round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
      |       round(((conv_a / CAST(n_a AS DOUBLE)) - (conv_b / CAST(n_b AS DOUBLE))) /
      |         sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
      |           (1.0e0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
      |           (1.0e0 / n_a + 1.0e0 / n_b)), 6) AS z
      |FROM a""".stripMargin

  /** Quantity-weighted mean price per return flag via the typed
    * `Aggregator` API (`functions/WeightedMeanAgg.scala`) — the third
    * custom-aggregation tier beside the `TypedImperativeAggregate`s. The
    * accumulator carries exact integer cents·weight, so partial merges are
    * order-independent and the result is engine-reproducible (a naive
    * `sum(p*q)/sum(q)` over doubles is not). */
  def weightedMeanPrice(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wm = udaf(graft.functions.WeightedMeanAgg.weightedMeanCents,
      org.apache.spark.sql.Encoders.product[(Long, Long)])
    Tables.lineitem(s, dir)
      .select($"l_returnflag",
        ($"l_extendedprice".cast(D2) * 100).cast("long").as("cents"),
        $"l_quantity".cast("long").as("w"))
      .groupBy($"l_returnflag")
      .agg(round(wm($"cents", $"w"), 6).as("wavg_price"))
  }

  private val weightedMeanSql =
    """SELECT l_returnflag,
      |       round(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |             / 100.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 6)
      |         AS wavg_price
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Snapshot diff — the INVERSE of `cdcApply`: given two table snapshots,
    * derive the change feed between them (what an incremental pipeline
    * publishes when the upstream can't emit CDC itself, and the audit that
    * proves a replicated table matches its source). Snapshot B is built
    * deterministically from the base: keys %11 removed, keys %7 repriced
    * +10, keys %13 inserted anew under key+30,000,000 — so the diff must
    * recover exactly those sets.
    *
    * Shape: one full-outer join on the key, row-local classification, one
    * aggregate. At 100 TB both sides shuffle once on the join key and
    * nothing else moves; with both snapshots bucketed on the key (the
    * `q_bucketed_join` layout) even that shuffle disappears. The money
    * delta runs in DECIMAL and casts the final sum to DOUBLE (oracle-parity
    * rule). */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val snap = o.filter($"o_orderkey" % 11 =!= 0)
      .select($"o_orderkey", $"o_orderstatus",
        when($"o_orderkey" % 7 === 0, $"o_totalprice" + 10.0)
          .otherwise($"o_totalprice").as("o_totalprice"))
      .unionAll(o.filter($"o_orderkey" % 13 === 0)
        .select(($"o_orderkey" + 30000000L).as("o_orderkey"),
          $"o_orderstatus", $"o_totalprice"))
    val b = o.as("b")
    val n = snap.as("n")
    b.join(n, $"b.o_orderkey" === $"n.o_orderkey", "full_outer")
      .select(
        when($"b.o_orderkey".isNull, "added")
          .when($"n.o_orderkey".isNull, "removed")
          .when($"b.o_totalprice" =!= $"n.o_totalprice" ||
            $"b.o_orderstatus" =!= $"n.o_orderstatus", "changed")
          .otherwise("unchanged").as("change"),
        (coalesce($"n.o_totalprice".cast(D2), lit(0).cast(D2)) -
          coalesce($"b.o_totalprice".cast(D2), lit(0).cast(D2))).as("delta"))
      .groupBy($"change")
      .agg(count(lit(1)).as("n_keys"),
        sum($"delta").cast("double").as("price_delta"))
  }

  private val snapshotDiffSql =
    """WITH snap AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
      |              ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 11 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 30000000, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 13 = 0)
      |SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |            WHEN n.o_orderkey IS NULL THEN 'removed'
      |            WHEN b.o_totalprice <> n.o_totalprice
      |              OR b.o_orderstatus <> n.o_orderstatus THEN 'changed'
      |            ELSE 'unchanged' END AS change,
      |       count(*) AS n_keys,
      |       CAST(SUM(COALESCE(CAST(n.o_totalprice AS DECIMAL(18,2)), 0)
      |              - COALESCE(CAST(b.o_totalprice AS DECIMAL(18,2)), 0)) AS DOUBLE)
      |         AS price_delta
      |FROM orders b FULL OUTER JOIN snap n ON b.o_orderkey = n.o_orderkey
      |GROUP BY 1""".stripMargin

  /** Order-independent, engine-neutral table checksum — the replication
    * audit primitive beside `snapshotDiff`: when two copies of a table live
    * on different engines, comparing per-group (count, xor-of-row-hashes,
    * modular hash sum) catches any divergence without moving a row. Row hash
    * = md5 of a canonical `|`-joined rendering (integers as decimal strings,
    * money at DECIMAL(18,2) scale — identical text on both engines); the
    * fold is `bit_xor` of 60-bit prefixes (order-independent, overflow-free,
    * but blind to duplicated-pair insertions) PLUS a modular 32-bit sum
    * (multiplicity-sensitive, and `% 1000003` keeps the ANSI-mode sum from
    * ever overflowing: ~1e6 per row → 9e12 rows before BIGINT wraps). All
    * map-side partial aggregation; the shuffle carries one row per group. */
  def tableChecksum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val repr = concat_ws("|", $"o_orderkey".cast("string"), $"o_orderstatus",
      $"o_totalprice".cast(D2).cast("string"))
    Tables.orders(s, dir)
      .select($"o_orderstatus",
        conv(substring(md5(repr), 1, 15), 16, 10).cast("long").as("h60"),
        (conv(substring(md5(repr), 1, 8), 16, 10).cast("long") % 1000003L).as("h32m"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h60)").as("xor60"),
        sum($"h32m").as("sum32m"))
  }

  private val tableChecksumSql =
    """WITH h AS (
      |  SELECT o_orderstatus,
      |         md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
      |                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR))) AS m
      |  FROM orders)
      |SELECT o_orderstatus, count(*) AS n_rows,
      |       bit_xor(CAST(CONCAT('0x', substr(m, 1, 15)) AS BIGINT)) AS xor60,
      |       CAST(sum(CAST(CONCAT('0x', substr(m, 1, 8)) AS BIGINT) % 1000003)
      |            AS BIGINT) AS sum32m
      |FROM h GROUP BY 1""".stripMargin

  /** Right-to-erasure cascade: given a subject set (customers with
    * `c_custkey % 101 = 0` — in production, the erasure-request batch),
    * propagate the delete down the FK chain customer → orders → lineitem
    * and report per-table deleted/surviving counts — the audit artifact a
    * compliance run must produce BEFORE rewriting anything.
    *
    * Scale posture: the subject set is small relative to the tables
    * (requests arrive in batches), so each hop is a semi-join against a
    * broadcastable and shrinking key set; the lineitem hop joins on
    * `l_orderkey` against the DELETED orders' keys only — the cascade moves
    * keys, never rows. Counts come from one conditional aggregate per table
    * (no second scan for survivors). */
  def cascadeDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val subjects = Tables.customer(s, dir)
      .filter($"c_custkey" % 101 === 0).select($"c_custkey")
    val custAgg = Tables.customer(s, dir)
      .join(broadcast(subjects), Seq("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_deleted"))
    val delOrders = Tables.orders(s, dir)
      .join(broadcast(subjects), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey")
    val orderAgg = delOrders.agg(count(lit(1)).as("n_deleted"))
    val liAgg = Tables.lineitem(s, dir)
      .join(broadcast(delOrders), $"l_orderkey" === $"o_orderkey", "left_semi")
      .agg(count(lit(1)).as("n_deleted"))
    val totals = Seq(
      "customer" -> Tables.customer(s, dir),
      "orders" -> Tables.orders(s, dir),
      "lineitem" -> Tables.lineitem(s, dir))
    totals.zip(Seq(custAgg, orderAgg, liAgg)).map { case ((name, full), del) =>
      full.agg(count(lit(1)).as("n_total")).crossJoin(del)
        .select(lit(name).as("table_name"), $"n_deleted",
          ($"n_total" - $"n_deleted").as("n_surviving"))
    }.reduce(_.unionAll(_))
  }

  private val cascadeDeleteSql =
    """WITH subj AS (SELECT c_custkey FROM customer WHERE c_custkey % 101 = 0),
      |del_o AS (SELECT o_orderkey FROM orders
      |          WHERE EXISTS (SELECT 1 FROM subj WHERE c_custkey = o_custkey))
      |SELECT 'customer' AS table_name,
      |       (SELECT count(*) FROM subj) AS n_deleted,
      |       (SELECT count(*) FROM customer) - (SELECT count(*) FROM subj) AS n_surviving
      |UNION ALL
      |SELECT 'orders', (SELECT count(*) FROM del_o),
      |       (SELECT count(*) FROM orders) - (SELECT count(*) FROM del_o)
      |UNION ALL
      |SELECT 'lineitem',
      |       (SELECT count(*) FROM lineitem
      |        WHERE EXISTS (SELECT 1 FROM del_o WHERE o_orderkey = l_orderkey)),
      |       (SELECT count(*) FROM lineitem) -
      |       (SELECT count(*) FROM lineitem
      |        WHERE EXISTS (SELECT 1 FROM del_o WHERE o_orderkey = l_orderkey))""".stripMargin

  /** Incremental materialized-view maintenance: refresh a per-nation order
    * aggregate from a delta batch WITHOUT touching the base data again.
    *
    * The MV stores commutative-monoid PARTIAL state per group — (count,
    * exact decimal sum) — never finished values: counts and sums merge by
    * addition, and the non-distributive aggregate (avg) is derived at read
    * time from the merged state (the classic algebraic-aggregate
    * decomposition). The refresh is `merge(partial(base), partial(delta))`
    * — only the delta is scanned, shuffled and aggregated; the base
    * contributes its already-materialized per-nation rows (25 here, always
    * |groups| not |facts|). At 100 TB this is the difference between a
    * nightly full recompute of the fact table and an append-sized job.
    *
    * The oracle is the FULL recompute over base+delta together — hashing
    * this query green IS the incremental-view consistency proof. Sums run
    * over decimal(18,2) (exact, order-independent — a double sum's value
    * depends on partition merge order and cannot hash stably); the one
    * IEEE division for `avg_price` happens after merging, identically in
    * both engines, under the repo's 6-dp absorption. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = "1999-01-01"
    val ords = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    // partial(batch): the per-group monoid state a stored MV would hold
    def partial(batch: DataFrame): DataFrame = batch
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
    val base = partial(ords.filter($"o_orderdate" < lit(cut).cast("timestamp")))
      .withColumn("gen", lit("base"))
    val delta = partial(ords.filter($"o_orderdate" >= lit(cut).cast("timestamp")))
      .withColumn("gen", lit("delta"))
    // merge: re-aggregate the UNION of partial states — |groups|-sized input
    base.unionByName(delta)
      .groupBy($"c_nationkey")
      .agg(
        sum(when($"gen" === "base", $"n").otherwise(0L)).as("n_base"),
        sum(when($"gen" === "delta", $"n").otherwise(0L)).as("n_delta"),
        sum($"n").as("n_orders"),
        sum($"rev").as("rev"))
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"n_name".as("nation"),
        $"n_base".cast("long").as("n_base"),
        $"n_delta".cast("long").as("n_delta"),
        $"n_orders".cast("long").as("n_orders"),
        $"rev".cast("double").as("revenue"),
        round($"rev".cast("double") / $"n_orders", 6).as("avg_price"))
  }

  private val incrementalAggSql =
    """WITH j AS (
      |  SELECT n.n_name AS nation, o.o_orderdate,
      |         CAST(o.o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey)
      |SELECT nation,
      |  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
      |  CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(p) AS DOUBLE) AS revenue,
      |  round(CAST(sum(p) AS DOUBLE) / count(*), 6) AS avg_price
      |FROM j GROUP BY nation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_agg" -> ((s, d) => incrementalAgg(s, d)),
    "q_weighted_mean" -> ((s, d) => weightedMeanPrice(s, d)),
    "q_snapshot_diff" -> ((s, d) => snapshotDiff(s, d)),
    "q_table_checksum" -> ((s, d) => tableChecksum(s, d)),
    "q_cascade_delete" -> ((s, d) => cascadeDelete(s, d)),
    "q_cdc_apply" -> ((s, d) => cdcApply(s, d)),
    "q_ref_integrity" -> ((s, d) => refIntegrity(s, d)),
    "q_ab_test" -> ((s, d) => abTest(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_incremental_agg" -> incrementalAggSql,
    "q_weighted_mean" -> weightedMeanSql,
    "q_snapshot_diff" -> snapshotDiffSql,
    "q_table_checksum" -> tableChecksumSql,
    "q_cascade_delete" -> cascadeDeleteSql,
    "q_cdc_apply" -> cdcApplySql,
    "q_ref_integrity" -> refIntegritySql,
    "q_ab_test" -> abTestSql,
  )
}
