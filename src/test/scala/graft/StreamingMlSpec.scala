package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingMlSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly window equals batch demand-by-hour") {
    val stream = streaming.StreamingOps.hourlyWindow(spark, sf)
      .orderBy("hour_ts", "event_type").collect().toSeq
    val batch = operators.TimeJoins.demandByHour(spark, sf)
      .withColumnRenamed("hour_ts", "hour_ts")
      .orderBy("hour_ts", "event_type").collect().toSeq
    assert(stream == batch)
  }

  test("watermark drops late rows in append mode (§2.8 late-data semantics)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val agg = ms.toDF().toDF("secs", "k")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("graft_wm_test").start()
    try {
      ms.addData((600L, "a"), (660L, "a")) // window [600,900) : 2 rows
      q.processAllAvailable()
      ms.addData((4000L, "b")) // watermark -> 4000-600=3400 closes [600,900)
      q.processAllAvailable()
      ms.addData((610L, "a")) // late beyond watermark: must be dropped
      q.processAllAvailable()
      ms.addData((8000L, "b")) // push watermark past [3900,4200)
      q.processAllAvailable()
      val rows = spark.table("graft_wm_test")
        .collect().map(r => (r.getAs[java.sql.Timestamp]("ws").getTime / 1000, r.getString(1), r.getLong(2)))
      // the closed [600,900) window for "a" counts exactly the 2 on-time rows
      assert(rows.contains((600L, "a", 2L)), s"got ${rows.toSeq}")
      assert(!rows.exists { case (ws, k, n) => ws == 600L && k == "a" && n == 3L })
    } finally q.stop()
  }

  test("stream approx-distinct: every hour present, every HLL flag true") {
    val out = streaming.StreamingOps.streamApproxDistinct(spark, sf).collect()
    val nHours = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    assert(out.length.toLong == nHours && nHours > 0)
    out.foreach { r =>
      assert(r.getAs[Long]("exact_users") > 0)
      // a lost micro-batch or broken sketch merge shows up here
      assert(r.getAs[Boolean]("hll_ok"),
        s"hour ${r.get(0)}: estimate drifted beyond bound from ${r.get(1)}")
    }
  }

  test("streaming quarantine equals the batch quarantine row-for-row") {
    val batch = operators.Relational.quarantineRead(spark, sf).collect()
      .map(r => r.getAs[Int]("n_regionkey") -> r.getAs[Long]("n_rows")).toMap
    val stream = streaming.StreamingOps.streamQuarantine(spark, sf).collect()
      .map(r => r.getAs[Int]("n_regionkey") -> r.getAs[Long]("n_rows")).toMap
    assert(stream == batch)
    assert(stream(-1) > 0, "no rows were quarantined")
  }

  test("streaming dedup count equals distinct event count") {
    val n = streaming.StreamingOps.streamingDedupCount(spark, sf)
      .collect()(0).getLong(0)
    val expected = Tables.events(spark, sf).select("event_id").distinct().count()
    assert(n == expected)
  }

  test("fare regression recovers the revenue formula (R² ≈ 1)") {
    val row = ml.Forecast.fareRegression(spark, sf).collect()(0)
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0.999, s"r2=$r2")
  }

  test("CrossValidator selects a model and reports finite CV rmse") {
    val row = ml.Forecast.demandCrossVal(spark, sf).collect()(0)
    val rmse = row.getAs[Double]("cv_rmse")
    assert(rmse > 0 && rmse < 10 && !rmse.isNaN, s"cv_rmse=$rmse")
  }

  test("IVF ANN recall vs brute force is well above the random-probe floor") {
    val bf = operators.SimilarityOps.knnBruteForce(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = operators.SimilarityOps.knnIvf(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    // 8/16 probes over the near-isotropic fixture vectors: offline sweep
    // puts centroid-guided recall@5 at ~0.82 vs the 0.5 random-scan floor
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("string-indexer vocabulary ranks priorities by frequency desc") {
    val rows = ml.Forecast.featureEncode(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Int]("idx"),
        r.getAs[Long]("n")))
    assert(rows.map(_._2).sorted.toSeq == rows.indices.toSeq, "indices not dense")
    // higher count never gets a higher (worse) index
    for (a <- rows; b <- rows if a._3 > b._3)
      assert(a._2 < b._2, s"freq order violated: $a vs $b")
  }

  test("per-label centroids: one row per (label, pos), values in [-1, 1]") {
    import org.apache.spark.sql.functions._
    val c = operators.SimilarityOps.embedCentroids(spark, sf)
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(c.count() == labels * 64)
    assert(c.filter(abs(col("avg_val")) > lit(1.0)).isEmpty,
      "centroid component outside unit-vector bound")
  }

  test("checkpoint recovery: a restarted stream resumes offsets, no double counting") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val tmp = Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    val raw = graft.Tables.events(spark, sf)
      .withColumn("tsm", unix_micros(col("ts")))
    val cut = raw.stat.approxQuantile("tsm", Array(0.5), 0.0)(0).toLong
    val out = s"$tmp/out"

    def runOnce(): Unit = {
      val agg = graft.Tables.normalizeTs(
          spark.readStream.schema(graft.Tables.eventsRawSchema(spark, tmp))
            .parquet(s"$tmp/events.parquet"))
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("complete")
        .foreachBatch((b: DataFrame, _: Long) =>
          b.coalesce(1).write.mode("overwrite").parquet(out))
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // phase 1: only the first half exists; run to completion and stop
    raw.filter(col("tsm") <= cut).drop("tsm").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    runOnce()
    // phase 2: new data lands; a NEW query restarts from the SAME checkpoint
    // and must process only the unseen file while keeping the restored state
    raw.filter(col("tsm") > cut).drop("tsm").coalesce(1)
      .write.mode("append").parquet(s"$tmp/events.parquet")
    runOnce()

    val streamed = spark.read.parquet(out)
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.Tables.normalizeTs(spark.read.parquet(s"$tmp/events.parquet"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("h"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch) // double counting would inflate the overlap hour
  }

  test("DSv2 MicroBatchStream: rate-limited batches, offset recovery, no replay") {
    import java.nio.file.Files
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft_dsv2_stream").toFile.getAbsolutePath
    val out = s"$tmp/out"

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.JsonPointStreamSource")
        .option("payload", functions.Json.streamPayload)
        .option("linesPerBatch", "2").load()
        .writeStream.outputMode("append")
        .foreachBatch((b: DataFrame, _: Long) =>
          b.coalesce(1).write.mode("append").parquet(out))
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    val rows1 = spark.read.parquet(out).collect()
    assert(rows1.length == 6, s"expected all 6 observations, got ${rows1.length}")
    // linesPerBatch=2 over 6 lines ⇒ the offset log must show ≥3 batches
    val nBatches = new java.io.File(s"$tmp/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(nBatches >= 3, s"expected ≥3 rate-limited micro-batches, got $nBatches")

    // a NEW query on the SAME checkpoint restores the committed line offset
    // and must not replay anything (append output would grow on replay)
    runOnce()
    val rows2 = spark.read.parquet(out).collect()
    assert(rows2.length == 6, s"restart replayed data: ${rows2.length} rows")

    // strict null contract survives the streaming path: a degraded line
    // yields nulls, not coerced zeros
    val degraded = spark.readStream.format("graft.sources.JsonPointStreamSource")
      .option("payload", """{"name":"X","main":{"temp":"N/A"}}""").load()
    val q2 = degraded.writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, _: Long) =>
        b.coalesce(1).write.mode("overwrite").parquet(s"$tmp/deg"))
      .option("checkpointLocation", s"$tmp/ckpt2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val d = spark.read.parquet(s"$tmp/deg").collect()(0)
    assert(d.getAs[String]("city") == "X" && d.isNullAt(d.fieldIndex("temp_f")))
  }

  test("transformWithState user totals equal the batch groupBy row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = streaming.TransformWithStateOps.userTotals(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sv"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == want.size && got.nonEmpty)
    assert(got == want)
  }

  test("stream-stream left outer join equals the batch LEFT JOIN") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val streamed = streaming.StreamingOps.streamLeftOuterJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val e = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"event_id".as("error_id"), $"ts".as("e_ts"))
    val batch = p.join(e, p("user_id") === $"e_user" &&
        $"e_ts" >= p("p_ts") - expr("INTERVAL 1 HOUR") && $"e_ts" <= p("p_ts"),
      "left_outer")
      .select($"user_id", $"purchase_id", $"error_id")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed left-outer result differs from batch LEFT JOIN")
    assert(streamed.filter($"error_id".isNull).count() > 0,
      "expected at least one unmatched purchase (outer row)")
  }

  test("feature scaling: z-scores have ~zero mean and unit variance per group") {
    import org.apache.spark.sql.functions._
    val z = ml.Forecast.featureScale(spark, sf)
      .groupBy("l_returnflag")
      .agg(avg(col("z_score")).as("m"), stddev_samp(col("z_score")).as("sd"),
        min(col("minmax")).as("lo"), max(col("minmax")).as("hi"))
    z.collect().foreach { r =>
      // z-scores are rounded to 6 dp at the source (cross-engine ulp
      // absorption), so the group mean/sd carry up to ~5e-7 of rounding
      assert(math.abs(r.getAs[Double]("m")) < 1e-6)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-6)
      assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0)
    }
  }

  test("GBT demand forecast trains and predicts within sane bounds") {
    val row = ml.Forecast.demandForecast(spark, sf).collect()(0)
    val rmse = row.getAs[Double]("rmse")
    assert(row.getAs[Long]("n_train") > 0 && rmse > 0 && rmse < 10, s"rmse=$rmse")
  }
}
