package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantiles.quantileCont must be bit-exchangeable with the built-in
  * `percentile` (same interpolation arithmetic) — that equivalence is what
  * lets q_equidepth_hist / q_percentiles keep their DuckDB quantile_cont
  * oracles after swapping off the unbounded ObjectHashAggregate. */
class ExactQuantilesSpec extends AnyFunSuite {
  import TestSpark._

  private val ps = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5,
    "p90" -> 0.9, "p95" -> 0.95)

  test("global quantiles bit-equal percentile() on orders.o_totalprice") {
    val o = Tables.orders(spark, sf).select(col("o_totalprice"))
    val got = operators.ExactQuantiles
      .quantileCont(o, Nil, "o_totalprice", ps).collect()(0)
    val want = o.agg(
      expr("percentile(o_totalprice, 0.1)"),
      expr("percentile(o_totalprice, 0.25)"),
      expr("percentile(o_totalprice, 0.5)"),
      expr("percentile(o_totalprice, 0.9)"),
      expr("percentile(o_totalprice, 0.95)")).collect()(0)
    ps.indices.foreach { i =>
      assert(got.getDouble(i) == want.getDouble(i),
        s"${ps(i)._1}: got ${got.getDouble(i)} want ${want.getDouble(i)}")
    }
  }

  test("grouped quantiles bit-equal percentile() per l_returnflag") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val got = operators.ExactQuantiles
      .quantileCont(li, Seq("l_returnflag"), "l_extendedprice", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.1)"),
      expr("percentile(l_extendedprice, 0.25)"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.9)"),
      expr("percentile(l_extendedprice, 0.95)"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      ps.indices.foreach { i =>
        assert(got(k).getDouble(i + 1) == w.getDouble(i + 1),
          s"group $k ${ps(i)._1}")
      }
    }
  }

  test("all-equal values resolve via the tie shortcut, no pass-C sort") {
    import spark.implicits._
    val df = Seq.fill(1000)(42.5).toDF("x")
    val got = operators.ExactQuantiles
      .quantileCont(df, Nil, "x", Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect()(0)
    assert(got.getDouble(0) == 42.5 && got.getDouble(1) == 42.5)
  }

  test("nulls ignored, single-row and two-row groups interpolate correctly") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(7.25)), ("b", None)).toDF("g", "x")
    val got = operators.ExactQuantiles
      .quantileCont(df, Seq("g"), "x", Seq("p50" -> 0.5, "p75" -> 0.75))
      .collect().map(r => r.getString(0) -> r).toMap
    // group a: sorted [1,3]; p50 pos=0.5 → 2.0; p75 pos=0.75 → 2.5
    assert(got("a").getDouble(1) == 2.0 && got("a").getDouble(2) == 2.5)
    // group b: single non-null value
    assert(got("b").getDouble(1) == 7.25 && got("b").getDouble(2) == 7.25)
  }

  test("property: bit-equal to percentile() on arbitrary data incl. heavy ties") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // values drawn from a SMALL pool so duplicates are common (ties cross
    // bucket boundaries), mixed with arbitrary doubles; group keys few so
    // groups get real mass
    val valGen = Gen.oneOf(
      Gen.chooseNum(-5.0, 5.0).map(v => math.rint(v * 4) / 4), // tie-heavy grid
      Gen.chooseNum(-1e6, 1e6))
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2"), valGen)
    val pGen = Gen.oneOf(0.01, 0.25, 0.5, 0.9, 0.99)
    val prop = forAll(Gen.nonEmptyListOf(rowGen), pGen) { (rows, p) =>
      val df = rows.toDF("g", "x")
      val got = operators.ExactQuantiles
        .quantileCont(df, Seq("g"), "x", Seq("q" -> p), nBuckets = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = df.groupBy($"g").agg(expr(s"percentile(x, $p)"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("tiny nBuckets still exact (many values per bucket exercise pass C)") {
    val o = Tables.orders(spark, sf).select(col("o_totalprice"))
    val got = operators.ExactQuantiles
      .quantileCont(o, Nil, "o_totalprice", Seq("p50" -> 0.5), nBuckets = 4)
      .collect()(0).getDouble(0)
    val want = o.agg(expr("percentile(o_totalprice, 0.5)"))
      .collect()(0).getDouble(0)
    assert(got == want)
  }
}
