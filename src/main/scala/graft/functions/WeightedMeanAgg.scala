package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` tier (the third custom-aggregation API next to the
  * `TypedImperativeAggregate`s `top_k_by`/`bloom_build`): exact weighted
  * mean over (value, weight) pairs carried as integer cents·weight so the
  * accumulation is order-independent — the property that makes the result
  * reproducible across partitionings and engines. Buffer is two longs;
  * merge is addition — map-side partials compose exactly.
  */
object WeightedMeanAgg {
  /** (Σ value_cents·w, Σ w) */
  case class WSum(cents: Long, w: Long)

  /** Input: value already normalized to exact integer cents, plus an
    * integer weight. */
  val weightedMeanCents: Aggregator[(Long, Long), WSum, Double] =
    new Aggregator[(Long, Long), WSum, Double] {
      override def zero: WSum = WSum(0L, 0L)
      override def reduce(b: WSum, a: (Long, Long)): WSum =
        WSum(b.cents + a._1 * a._2, b.w + a._2)
      override def merge(x: WSum, y: WSum): WSum =
        WSum(x.cents + y.cents, x.w + y.w)
      override def finish(r: WSum): Double =
        if (r.w == 0) Double.NaN else r.cents.toDouble / 100.0 / r.w.toDouble
      override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
