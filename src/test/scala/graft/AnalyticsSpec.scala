package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the AnalyticsOps family (edit-distance blocking, mode,
  * Pareto, RFM, entropy, Markov, sliding distinct). */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("edit-distance pairs are brand-blocked, ordered, and within threshold") {
    import spark.implicits._
    val rows = operators.AnalyticsOps.editDistancePairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("key_a") < r.getAs[Long]("key_b"))
      assert(r.getAs[Int]("dist") <= 2)
    }
    // symmetric sanity: every pair's two keys share the blocking brand
    val keys = Tables.part(spark, sf)
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      assert(keys(r.getAs[Long]("key_a")) == r.getAs[String]("p_brand"))
      assert(keys(r.getAs[Long]("key_b")) == r.getAs[String]("p_brand"))
    }
  }

  test("mode per user: one row per active user, count matches a direct recount") {
    import spark.implicits._
    val m = operators.AnalyticsOps.modePerUser(spark, sf)
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(m.count() == nUsers)
    // the reported n really is the max count for that user
    val direct = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(max($"n").as("mx"))
      .as[(Long, Long)].collect().toMap
    m.collect().foreach { r =>
      assert(r.getAs[Long]("n") == direct(r.getAs[Long]("user_id")))
    }
  }

  test("pareto: top cohort share is in (0.8 - eps, 1] and n_top <= customers") {
    import spark.implicits._
    val p = operators.AnalyticsOps.paretoRevenue(spark, sf).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      val share = r.getAs[Double]("top_share")
      assert(share >= 0.8 - 1e-9 && share <= 1.0 + 1e-9, s"share=$share")
      assert(r.getAs[Long]("n_top") >= 1)
    }
  }

  test("rfm: quartiles are 1..4 and roughly balanced, segment echoes digits") {
    val rows = operators.AnalyticsOps.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r", "f", "m").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 4)
      }
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Int]("r")}${r.getAs[Int]("f")}${r.getAs[Int]("m")}")
    }
    // ntile balance: group sizes differ by at most 1
    val sizes = rows.groupBy(_.getAs[Int]("r")).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1)
  }

  test("token entropy is in [0, ln(n_toks)] and 0 for single-token docs") {
    val e = operators.AnalyticsOps.tokenEntropy(spark, sf).collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      val n = r.getAs[Long]("n_toks")
      val h = r.getAs[Double]("entropy")
      // entropy is rounded to 6 dp, so it may exceed ln(n) by up to 5e-7
      assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-6,
        s"doc=${r.getAs[Long]("doc_id")} h=$h n=$n")
    }
  }

  test("markov: probabilities are in (0,1] and sum to 1 per source state") {
    import spark.implicits._
    val m = operators.AnalyticsOps.markovTransitions(spark, sf)
    val sums = m.groupBy($"from_type").agg(sum($"prob").as("s"))
      .as[(String, Double)].collect()
    sums.foreach { case (t, sm) =>
      assert(math.abs(sm - 1.0) < 1e-9, s"$t sums to $sm")
    }
  }

  test("rolling distinct: 7-day count >= daily distinct and <= total users") {
    import spark.implicits._
    val roll = operators.AnalyticsOps.rollingDistinctUsers(spark, sf)
      .as[(java.sql.Date, Long)].collect().toMap
    val daily = Tables.events(spark, sf)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
      .groupBy($"day").agg(countDistinct($"user_id").as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    val totalUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(roll.keySet == daily.keySet)
    daily.foreach { case (d, n) =>
      assert(roll(d) >= n && roll(d) <= totalUsers, s"day=$d")
    }
  }

  test("ewma per user equals a local time-ordered fold") {
    import spark.implicits._
    val out = operators.AnalyticsOps.ewmaPerUser(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    val events = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    assert(out.keySet == events.map(_._1).toSet && out.nonEmpty)
    events.groupBy(_._1).foreach { case (uid, rows) =>
      val vals = rows.sortBy { case (_, ts, id, _) =>
        (ts.toInstant.getEpochSecond, ts.getNanos, id) }.map(_._4)
      val ewma = vals.tail.foldLeft(vals.head)((acc, x) => acc * 0.8 + x * 0.2)
      val want = BigDecimal(ewma).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(uid)._1 == rows.length.toLong)
      assert(out(uid)._2 == want, s"user $uid: ${out(uid)._2} != $want")
      // smoothing keeps the average inside the observed value range
      assert(out(uid)._2 >= vals.min - 1e-6 && out(uid)._2 <= vals.max + 1e-6)
    }
  }
}
