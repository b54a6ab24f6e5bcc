package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the range/banding + sampling operators (RangeOps). */
class RangeSpec extends AnyFunSuite {
  import TestSpark._

  test("equi-depth histogram: buckets near-equal mass, ranges ordered and disjoint") {
    import spark.implicits._
    val rows = operators.RangeOps.equidepthHistogram(spark, sf).collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (0 to 7))
    val total = Tables.orders(spark, sf).count()
    // each octile holds total/8 ± the tie mass at its boundaries
    rows.foreach(r => assert(math.abs(r.getAs[Long]("n") - total / 8.0) < total * 0.05))
    // value ranges must be ordered and non-overlapping across buckets
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_price") <= b.getAs[Double]("min_price"))
    case _ => ()
    }
  }

  test("bucketed range join equals the naive inequality join") {
    import spark.implicits._
    val got = operators.RangeOps.rangeJoin(spark, sf).collect()
      .map(r => r.getAs[Int]("band_id") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("sum_price"))).toMap
    // naive O(n·m) reference plan — correct at test scale only
    val parts = Tables.part(spark, sf).select($"p_partkey", $"p_retailprice")
    val bands = spark.range(20).select(
      $"id".cast("int").as("band_id"),
      (lit(900.0) + $"id" * 5.0).as("lo"),
      (lit(910.0) + $"id" * 5.0).as("hi"))
    val naive = parts.crossJoin(bands)
      .filter($"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n"),
        sum($"p_retailprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("s"))
      .collect()
      .map(r => r.getAs[Int]("band_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("s"))).toMap
    assert(got == naive)
  }

  test("every part lands in at most 2 bands and bands overlap by half") {
    import spark.implicits._
    val perPart = operators.RangeOps.rangeJoin(spark, sf)
    // total matches = sum over bands; with width 10 / stride 5 over the full
    // price range, interior prices match exactly 2 bands
    val nParts = Tables.part(spark, sf).count()
    val matches = perPart.agg(sum($"n_parts")).first().getLong(0)
    assert(matches <= 2 * nParts && matches > nParts,
      s"matches=$matches nParts=$nParts")
  }

  test("histogram buckets partition all orders") {
    import spark.implicits._
    val h = operators.RangeOps.histogram(spark, sf).collect()
    val total = h.map(_.getAs[Long]("n")).sum
    assert(total == Tables.orders(spark, sf).count())
    h.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Double]("min_price") >= b * 50000.0)
      assert(r.getAs[Double]("max_price") < (b + 1) * 50000.0)
    }
  }

  test("stratified sample is deterministic and roughly honors fractions") {
    import spark.implicits._
    val s1 = operators.RangeOps.stratifiedSample(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val s2 = operators.RangeOps.stratifiedSample(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(s1 == s2, "hash-gated sample must be reproducible")
    val byLang = operators.RangeOps.stratifiedSample(spark, sf)
      .groupBy($"lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val totals = Tables.documents(spark, sf).groupBy($"lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val fr = Map("en" -> 0.5, "zh" -> 0.3, "es" -> 0.3, "de" -> 0.3, "fr" -> 0.3)
    byLang.foreach { case (lang, n) =>
      val expect = totals(lang) * fr(lang)
      // Bernoulli sampling at sf0.001 strata sizes: wide tolerance
      assert(n <= totals(lang) && math.abs(n - expect) < totals(lang) * 0.5 + 5,
        s"$lang: got $n expect ≈$expect of ${totals(lang)}")
    }
  }

  test("gap fill: dense hour scaffold, zero-filled gaps, non-null forward fill") {
    import spark.implicits._
    val g = operators.TimeJoins.gapFill(spark, sf)
    val perType = g.groupBy($"event_type")
      .agg(count(lit(1)).as("rows"),
        min($"hr").as("lo"), max($"hr").as("hi"),
        sum(when($"n" === 0, 1).otherwise(0)).as("gaps"),
        sum(when($"ffill_sum".isNull, 1).otherwise(0)).as("null_fills"))
      .collect()
    perType.foreach { r =>
      val hours = (r.getAs[java.sql.Timestamp]("hi").getTime -
        r.getAs[java.sql.Timestamp]("lo").getTime) / 3600000L + 1
      assert(r.getAs[Long]("rows") == hours, s"scaffold not dense: $r")
      assert(r.getAs[Long]("gaps") > 0, s"fixture should have hour gaps: $r")
      assert(r.getAs[Long]("null_fills") == 0, s"forward fill left nulls: $r")
    }
  }
}
