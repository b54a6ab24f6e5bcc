package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the GraphOps / AuditOps / sparse-cosine families. */
class GraphAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("pagerank: one rank per nation, ranks positive, mass ≈ 1") {
    val r = operators.GraphOps.pageRank(spark, sf).collect()
    assert(r.length == 25)
    val ranks = r.map(_.getAs[Double]("pr"))
    assert(ranks.forall(_ > 0))
    // every nation has out-edges in this fixture, so no mass leaks
    val mass = ranks.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"mass=$mass")
  }

  test("pagerank: in-degree-heavy nations rank above the teleport floor") {
    import spark.implicits._
    val r = operators.GraphOps.pageRank(spark, sf)
      .as[(String, Double)].collect().toMap
    // a node with zero in-weight sits at exactly the 0.006 teleport floor
    // (happens at sf0.001's sparse graph); nobody may sit below it, and the
    // top nation must be meaningfully above it
    assert(r.values.forall(_ >= 0.006 - 1e-12))
    assert(r.values.max > 0.02)
  }

  test("recursive reachability: seed at hop 0, frontier grows monotonically") {
    import spark.implicits._
    val r = operators.GraphOps.reachability(spark, sf)
      .as[(String, Int)].collect().toMap
    assert(r.values.min == 0) // the seed nation itself
    assert(r.values.forall(h => h >= 0 && h <= 2))
  }

  test("lateral top-n: 2 rows per nation, descending within nation") {
    import spark.implicits._
    val rows = operators.GraphOps.lateralTop(spark, sf).collect()
    val byNation = rows.groupBy(_.getString(0))
    assert(byNation.values.forall(_.length <= 2))
    byNation.values.foreach { g =>
      val bals = g.map(_.getDouble(2))
      assert(bals.sorted.reverse.sameElements(bals))
    }
  }

  test("attribution: channels partition all purchases, channel set is sane") {
    import spark.implicits._
    val a = operators.GraphOps.lastTouchAttribution(spark, sf)
    val totalAttr = a.agg(sum($"n_purchases")).as[Long].head()
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(totalAttr == purchases)
    val channels = a.select($"channel").as[String].collect().toSet
    assert(!channels.contains("purchase"))
  }

  test("k-anonymity: reported groups really are below k") {
    val g = operators.AuditOps.kAnonymity(spark, sf, k = 5).collect()
    assert(g.nonEmpty)
    assert(g.forall(_.getAs[Long]("n") < 5))
  }

  test("iqr outliers: counts bounded by group size, quartiles ordered") {
    val r = operators.AuditOps.iqrOutliers(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_out") <= row.getAs[Long]("n"))
      assert(row.getAs[Double]("q1") <= row.getAs[Double]("q3"))
    }
  }

  test("zorder: every z-range covers a bounded size×band rectangle") {
    val r = operators.AuditOps.zorderLayout(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      // 6 low bits dropped → each range spans at most 8 values per dim
      assert(row.getAs[Int]("max_size") - row.getAs[Int]("min_size") <= 8)
      assert(row.getAs[Int]("max_band") - row.getAs[Int]("min_band") <= 8)
    }
  }

  test("bloom sketch: no false negatives, low fp rate, merge = union") {
    import spark.implicits._
    functions.BloomOps.register(spark)
    val keys = (0L until 2000L).map(_ * 7919L)
    val sketch = keys.toDF("h").repartition(8) // force map-side partials + merge
      .agg(functions.BloomOps.bloomBuild($"h", 1 << 16, 5).as("b"))
      .select($"b").as[Array[Byte]].head()
    // no false negatives — every inserted key must probe true
    assert(keys.forall(functions.BloomSketch.contains(sketch, _)))
    // false-positive rate on 10k absent keys stays near theory (<2%)
    val absent = (1L to 10000L).map(_ * 7919L + 3L)
    val fp = absent.count(functions.BloomSketch.contains(sketch, _))
    assert(fp < 200, s"fp=$fp")
  }

  test("bloom decontaminate matches the exact decontaminate row-for-row") {
    val exact = operators.CurationOps.decontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val bloom = operators.CurationOps.bloomDecontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(exact.nonEmpty)
    assert(bloom.toSeq == exact.toSeq)
  }

  test("dsv2 point source: pruning reaches the scan, lines parallelize, nulls tolerated") {
    val payload =
      """{"name":"A","main":{"temp":1.5,"humidity":10},"weather":[{"description":"x"}]}
        |{"name":"B","main":{"temp":2.5}}""".stripMargin
    val df = spark.read.format("graft.sources.JsonPointSource")
      .option("payload", payload).load()
    // column pruning is honored: a city-only projection scans ONE column
    val pruned = df.select("city")
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.output.map(_.name) == Seq("city"))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("A", "B"))
    // one InputPartition per observation line; absent fields surface as null
    assert(df.rdd.getNumPartitions == 2)
    val b = df.collect().find(_.getString(0) == "B").get
    assert(b.isNullAt(2) && b.isNullAt(3) && b.getDouble(1) == 2.5)
    // degraded-feed values ("N/A") must surface as null, not Jackson's 0
    val degraded = spark.read.format("graft.sources.JsonPointSource")
      .option("payload", """{"name":"C","main":{"temp":"N/A","humidity":"--"}}""")
      .load().collect()(0)
    assert(degraded.isNullAt(1) && degraded.isNullAt(3))
    // option keys are case-insensitive like every other DSv2 source
    val cased = spark.read.format("graft.sources.JsonPointSource")
      .option("PAYLOAD", """{"name":"D"}""").load().collect()(0)
    assert(cased.getString(0) == "D")
  }

  test("dsv2 sink: staged files published atomically, overwrite truncates") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sink_spec_" +
      java.lang.ProcessHandle.current().pid()
    val nation = Tables.nation(spark, sf)
    nation.write.format("graft.sources.JsonLineSink")
      .option("path", tmp).mode("overwrite").save()
    nation.write.format("graft.sources.JsonLineSink")
      .option("path", tmp).mode("overwrite").save() // truncate, not append
    val files = Files.list(Paths.get(tmp)).iterator().asScala
      .map(_.getFileName.toString).toList
    assert(files.nonEmpty)
    // commit renamed every staged file — none may remain visible
    assert(!files.exists(_.startsWith("_staged_")), files.toString)
    val back = spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT").json(tmp)
    assert(back.count() == nation.count())
  }

  test("weighted mean equals direct sum(p*q)/sum(q) within 1e-6") {
    import spark.implicits._
    val got = operators.IntegrityOps.weightedMeanPrice(spark, sf)
      .as[(String, Double)].collect().toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg((sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity")).as("w"))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-4, k) }
  }

  test("sampled estimate: scaled counts land near exact, error column honest") {
    val rows = operators.ScaleOps.sampledEstimate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))
      val err = r.getAs[Double]("rel_err")
      // scaled-estimator sd ≈ 4·√exact (binomial p=1/16, scale 16); 5σ bound
      assert(math.abs(est - exact) < 20 * math.sqrt(exact.toDouble) + 16,
        s"est=$est exact=$exact")
      assert(math.abs(err - math.abs(est - exact).toDouble / exact) < 1e-5)
    }
  }

  test("sequence packing: windows full except the tail, mass conserved") {
    import spark.implicits._
    val rows = operators.CurationOps.packWindows(spark, sf)
      .orderBy($"window_id").collect()
    assert(rows.nonEmpty)
    val totalTok = Tables.documents(spark, sf)
      .select(sum(size(split(trim($"text"), "\\s+")))).as[Long].head()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTok)
    // every window but the last is exactly full
    rows.init.foreach(r => assert(r.getAs[Long]("n_tokens") == 512L))
    assert(rows.last.getAs[Long]("n_tokens") <= 512L)
    // window ids are the contiguous prefix 0..n-1
    assert(rows.map(_.getAs[Long]("window_id")).toSeq == (0L until rows.length))
  }

  test("cdc apply: deletes gone, updates applied, inserts kept") {
    import spark.implicits._
    val snap = operators.IntegrityOps.cdcApply(spark, sf)
      .agg(sum($"n")).as[Long].head()
    val o = Tables.orders(spark, sf)
    val total = o.count()
    val deleted = o.filter($"o_orderkey" % 11 === 0).count()
    assert(snap == total - deleted)
  }

  test("snapshot diff recovers exactly the constructed change sets") {
    import spark.implicits._
    val diff = operators.IntegrityOps.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("change") ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("price_delta"))).toMap
    val o = Tables.orders(spark, sf)
    val added = o.filter($"o_orderkey" % 13 === 0).count()
    val removed = o.filter($"o_orderkey" % 11 === 0).count()
    val changed = o.filter($"o_orderkey" % 7 === 0 && $"o_orderkey" % 11 =!= 0).count()
    assert(diff("added")._1 == added)
    assert(diff("removed")._1 == removed)
    assert(diff("changed")._1 == changed)
    assert(diff.values.map(_._1).sum == o.count() + added)
    // repriced rows move exactly +10 each; removed rows subtract their price
    assert(math.abs(diff("changed")._2 - 10.0 * changed) < 1e-6)
    assert(diff("removed")._2 <= 0.0 && diff("unchanged")._2 == 0.0)
  }

  test("table checksum: re-shard-stable, and a one-row change flips it") {
    import spark.implicits._
    val base = operators.IntegrityOps.tableChecksum(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60"), r.getAs[Long]("sum32m"))).toMap
    // identical math over a differently-sharded copy of the same rows
    val dir2 = s"${System.getProperty("java.io.tmpdir")}/graft_cksum_reshard_" +
      java.lang.ProcessHandle.current().pid()
    Tables.orders(spark, sf).repartition(13).write.mode("overwrite")
      .parquet(s"$dir2/orders.parquet")
    val reshard = operators.IntegrityOps.tableChecksum(spark, dir2).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60"), r.getAs[Long]("sum32m"))).toMap
    assert(reshard == base, "checksum depends on physical row order")
    // flip one row's price by a cent: that group's xor and sum must move
    val dir3 = s"${System.getProperty("java.io.tmpdir")}/graft_cksum_flip_" +
      java.lang.ProcessHandle.current().pid()
    val minKey = Tables.orders(spark, sf).agg(min($"o_orderkey")).head().getLong(0)
    Tables.orders(spark, sf)
      .withColumn("o_totalprice", when($"o_orderkey" === minKey,
        $"o_totalprice" + 0.01).otherwise($"o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir3/orders.parquet")
    val flipped = operators.IntegrityOps.tableChecksum(spark, dir3).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("xor60"), r.getAs[Long]("sum32m"))).toMap
    assert(flipped != base, "a one-row change went undetected")
    assert(flipped.count { case (k, v) => base(k) != v } == 1,
      "exactly one group should diverge")
  }

  test("referential integrity: the star schema fixture has zero orphans") {
    val rows = operators.IntegrityOps.refIntegrity(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getAs[Long]("n_orphans") == 0L,
      r.getAs[String]("fk")))
  }

  test("a/b test: counts partition users, z finite, rates in [0,1]") {
    import spark.implicits._
    val r = operators.IntegrityOps.abTest(spark, sf).collect()(0)
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    val (ra, rb) = (r.getAs[Double]("rate_a"), r.getAs[Double]("rate_b"))
    assert(ra >= 0 && ra <= 1 && rb >= 0 && rb <= 1)
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
  }

  test("approx quantiles: sketch lands within 1% of the exact median") {
    val rows = operators.Composition.approxQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("sketch_within_1pct"),
      r.getString(0)))
  }

  test("pq ann: recall vs exact top-k far above the random floor") {
    import spark.implicits._
    val pq = operators.SimilarityOps.knnPq(spark, sf)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = operators.SimilarityOps.knnBruteForce(spark, sf)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.keySet == exact.keySet && pq.nonEmpty)
    val recalls = pq.keys.toSeq.map(q =>
      (pq(q) intersect exact(q)).size.toDouble / exact(q).size)
    val avg = recalls.sum / recalls.size
    // random top-5 of ~2000 candidates recalls ~0.0025; 8×16 codebooks on
    // structureless vectors should still land a large multiple of that
    assert(avg >= 0.3, s"avg recall $avg")
  }

  test("ivf×pq ann: composed recall at least matches the IVF-only floor") {
    import spark.implicits._
    val got = operators.SimilarityOps.knnIvfPq(spark, sf)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = operators.SimilarityOps.knnBruteForce(spark, sf)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    got.foreach { case (_, cands) => assert(cands.size == 5) }
    val recalls = got.keys.toSeq.map(q =>
      (got(q) intersect exact(q)).size.toDouble / exact(q).size)
    val avg = recalls.sum / recalls.size
    // the probed cells bound recall at the IVF level (~0.87 at 10/16
    // probes); residual-PQ ADC + k*32 shortlist + exact re-rank should lose
    // almost nothing inside the probed set — hold the same 0.8 floor as the
    // IVF-only spec
    assert(avg >= 0.8, s"avg recall $avg")
  }

  test("sparse cosine: pairs ordered, cosine in range, dups found") {
    val r = operators.SimilarityOps.sparseCosinePairs(spark, sf).collect()
    assert(r.nonEmpty) // the fixture corpus contains near-duplicates
    r.foreach { row =>
      assert(row.getAs[Long]("doc_a") < row.getAs[Long]("doc_b"))
      val c = row.getAs[Double]("cos_sim")
      assert(c >= 0.6 && c <= 1.000001)
    }
  }
}
