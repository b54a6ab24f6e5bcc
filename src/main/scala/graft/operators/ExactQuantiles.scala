package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT interpolated quantiles (the `quantile_cont` /
  * Spark-`percentile` definition) without the unbounded aggregation state of
  * Spark's built-in `percentile`, whose ObjectHashAggregate buffers a
  * value→count map of the WHOLE input in one final buffer — on a mostly-
  * distinct column at 100 TB that buffer IS the dataset (executor OOM).
  *
  * Shape: distributed bucketed rank selection —
  *
  *  pass A  per-group `count/min/max` (plain HashAggregate, O(groups) state);
  *  pass B  fixed-width bucketing into `nBuckets` buckets → per-(group,bucket)
  *          `count/min/max` (HashAggregate, ≤ groups×nBuckets rows), then a
  *          cumulative count over the TINY bucket table locates which bucket
  *          holds each target global rank `k = floor((n-1)·p)` (and `k+1`);
  *  pass C  only the ≤ 2·|ps| hit buckets are re-scanned: `row_number()`
  *          partitioned BY BUCKET (each ~n/nBuckets rows, distributed,
  *          spillable) selects the exact values at the local ranks. Buckets
  *          where min = max skip pass C entirely — the all-ties /
  *          heavy-duplicate case costs nothing.
  *
  * Every aggregate along the way has fixed-size per-key state; the only
  * ordered work sorts single buckets. Interpolation replicates Spark's
  * `Percentile.getPercentile` arithmetic bit-for-bit
  * (`(hi−pos)·v_k + (pos−lo)·v_{k+1}`, with the `frac=0` and `v_k=v_{k+1}`
  * early-outs), so results are exchangeable with the built-in — the
  * `ExactQuantilesSpec` asserts bit-equality against `percentile` and the
  * DuckDB `quantile_cont` oracle stays the correctness gate.
  *
  * Skew note: a pathological distribution can still concentrate mass in one
  * bucket of DISTINCT values; pass C then sorts that bucket in one task
  * (spillable, not OOM). `nBuckets` trades bucket-table size against bucket
  * width; 4096 keeps pass-C partitions ≈ n/4096.
  */
object ExactQuantiles {

  /** Exact interpolated quantiles of `valueCol` per `groupCols` group
    * (global when `groupCols` is empty). `ps` = (output column, probability).
    * Returns one row per group with one double column per requested quantile.
    * Nulls in `valueCol` are ignored, matching `percentile`. */
  def quantileCont(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[(String, Double)], nBuckets: Int = 4096): DataFrame = {
    val gcols = if (groupCols.nonEmpty) groupCols else Seq("__g")
    val g: Seq[Column] = gcols.map(col)
    val keyed0 = if (groupCols.nonEmpty) df else df.withColumn("__g", lit(1))
    val keyed = keyed0
      .filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
    val v = col("__v")

    // Pass A: per-group extent. Tiny (one row per group) — localCheckpoint so
    // the broadcast side is materialized once, not re-derived per branch.
    val stats = keyed.groupBy(g: _*)
      .agg(count(v).as("__n"), min(v).as("__min"), max(v).as("__max"))
      .withColumn("__w",
        when(col("__max") > col("__min"),
          (col("__max") - col("__min")) / nBuckets).otherwise(lit(1.0)))
      .localCheckpoint()

    // Pass B: per-(group, bucket) count/min/max + cumulative count. The
    // window runs over ≤ groups×nBuckets rows — bounded by construction.
    val bucketed = keyed.join(broadcast(stats), gcols)
      .withColumn("__b",
        least(greatest(floor((v - col("__min")) / col("__w")).cast("int"),
          lit(0)), lit(nBuckets - 1)))
    val cumW = Window.partitionBy(g: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcum = bucketed.groupBy(g :+ col("__b"): _*)
      .agg(count(lit(1)).as("__cnt"), min(v).as("__bmin"), max(v).as("__bmax"))
      .withColumn("__cumBefore", coalesce(sum(col("__cnt")).over(cumW), lit(0L)))

    // Target global ranks: position = p·(n−1) exactly as Percentile computes
    // it; rank k always, k+1 only when the position is fractional (then
    // k+1 ≤ n−1 is guaranteed, since a fractional position is < n−1).
    val pArr = array(ps.map { case (a, p) =>
      struct(lit(a).as("alias"), lit(p).as("p")) }: _*)
    val ranks = stats
      .select(g :+ col("__n") :+ explode(pArr).as("__pp"): _*)
      .select(g :+ col("__pp.alias").as("__alias") :+
        (col("__pp.p") * (col("__n") - lit(1L)).cast("double")).as("__h"): _*)
      .withColumn("__k", floor(col("__h")).cast("long"))
      .withColumn("__frac", col("__h") - col("__k").cast("double"))
    val needs = ranks.select(g ++ Seq(col("__alias"), col("__h"), col("__k")) :+
      explode(when(col("__frac") > 0d, array(col("__k"), col("__k") + 1))
        .otherwise(array(col("__k")))).as("__r"): _*)

    // Locate each rank's bucket (tiny⨝tiny range predicate). Materialize:
    // both the easy and hard branches below reuse it.
    val located = needs.join(bcum, gcols)
      .filter(col("__r") >= col("__cumBefore") &&
        col("__r") < col("__cumBefore") + col("__cnt"))
      .select(g ++ Seq(col("__alias"), col("__h"), col("__k"), col("__r"),
        col("__b"), (col("__r") - col("__cumBefore")).as("__rn"),
        col("__bmin"), col("__bmax")): _*)
      .localCheckpoint()

    // Single-valued bucket → the rank's value is known without a sort.
    val easy = located.filter(col("__bmin") === col("__bmax"))
      .select(g ++ Seq(col("__alias"), col("__h"), col("__k"), col("__r"),
        col("__bmin").as("__v")): _*)

    // Pass C: sort ONLY the hit multi-valued buckets, pick the local ranks.
    val hard = located.filter(col("__bmin") =!= col("__bmax"))
    val hitBuckets = hard.select(g :+ col("__b"): _*).distinct()
    val selW = Window.partitionBy(g :+ col("__b"): _*).orderBy(v)
    val hardVals = bucketed.join(broadcast(hitBuckets), gcols :+ "__b")
      .withColumn("__rn", row_number().over(selW).cast("long") - 1L)
      .join(broadcast(hard.select(g ++ Seq(col("__alias"), col("__h"),
        col("__k"), col("__r"), col("__b"), col("__rn")): _*)),
        gcols ++ Seq("__b", "__rn"))
      .select(g ++ Seq(col("__alias"), col("__h"), col("__k"), col("__r"),
        v): _*)

    // Interpolate with Percentile.getPercentile's exact arithmetic.
    val per = easy.union(hardVals)
      .groupBy(g ++ Seq(col("__alias"), col("__h"), col("__k")): _*)
      .agg(max(when(col("__r") === col("__k"), v)).as("__vk"),
        max(when(col("__r") === col("__k") + 1, v)).as("__vk1"))
      .withColumn("__q",
        when(col("__h") === col("__k").cast("double") ||
          col("__vk1").isNull || col("__vk1") === col("__vk"), col("__vk"))
        .otherwise(
          ((col("__k") + 1L).cast("double") - col("__h")) * col("__vk") +
            (col("__h") - col("__k").cast("double")) * col("__vk1")))

    val out = per.groupBy(g: _*).agg(
      max(when(col("__alias") === ps.head._1, col("__q"))).as(ps.head._1),
      ps.tail.map { case (a, _) =>
        max(when(col("__alias") === a, col("__q"))).as(a) }: _*)
    if (groupCols.nonEmpty) out else out.drop("__g")
  }
}
