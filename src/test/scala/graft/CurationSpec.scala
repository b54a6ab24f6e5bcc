package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-3 curation operators (CurationOps). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("train/test split partitions every doc exactly once, ~80/20") {
    import spark.implicits._
    val agg = operators.CurationOps.trainTestSplit(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    val bySplit = agg.groupBy($"split").agg(sum($"n_docs").as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    assert(bySplit.values.sum == nDocs, s"split lost/duplicated docs: $bySplit")
    val trainFrac = bySplit("train").toDouble / nDocs
    // md5 is uniform: expected 205/256 ≈ 0.80, generous tolerance at sf0.001
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
  }

  test("split is deterministic: same assignment on repeated runs") {
    val a = operators.CurationOps.trainTestSplit(spark, sf).collect().toSet
    val b = operators.CurationOps.trainTestSplit(spark, sf).collect().toSet
    assert(a == b)
  }

  test("decontamination never flags benchmark docs and counts are positive") {
    val rows = operators.CurationOps.decontaminate(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 97 != 0, s"benchmark doc $id flagged as contaminated")
      assert(r.getAs[Long]("n_shared") >= 1)
    }
  }

  test("streaming decontamination equals the batch operator row-for-row") {
    val batch = operators.CurationOps.decontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    val stream = operators.CurationOps.streamingDecontaminate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    assert(stream == batch)
  }

  test("bm25 scores are positive, finite, and only for docs containing a term") {
    import spark.implicits._
    val scored = operators.CurationOps.bm25Search(spark, sf)
    val rows = scored.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("bm25")
      assert(s > 0 && !s.isNaN && !s.isInfinite, s"bm25=$s")
    }
    // every scored doc really contains ≥1 query term
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.documents(spark, sf)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("t"))
      .filter(Seq("spark", "vector", "merge", "window")
        .map(t => array_contains($"t", t)).reduce(_ || _))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == withTerm)
  }

  test("bm25 index: bucket-pruned, term-pushed postings scan equals the corpus-scan ranking") {
    val idx = operators.CurationOps.bm25IndexSearch(spark, sf)
    val plan = idx.queryExecution.executedPlan.toString
    // the postings scan must prune at the directory level (partition
    // filter on the term-hash bucket) AND push the term predicate into
    // the surviving files — per-query cost ∝ the query terms' postings
    assert(plan.contains("PartitionFilters: [") && plan.contains("p#"),
      "postings scan must carry a partition filter on the hash bucket")
    assert(plan.contains("In(term") || plan.contains("in(term"),
      "term membership must be pushed into the parquet scan")
    // identical ranking to the corpus scan, bit-for-bit at 6 dp
    val got = idx.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val want = operators.CurationOps.bm25Search(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got == want && got.nonEmpty,
      "the index path must never change the answer")
  }

  test("dedup clusters: labels are component minima and respect the pair graph") {
    import spark.implicits._
    val labels = operators.CurationOps.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val pairs = operators.DedupOps.ngramJaccard(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.nonEmpty)
    // every endpoint is labeled; endpoints of an edge share a cluster
    pairs.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b), s"unlabeled endpoint ($a,$b)")
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
    // a cluster's label is the min member id
    labels.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min == label, s"cluster $label min is ${members.keys.min}")
    }
  }

  test("repetition ratios live in [0,1) and rules verdict is the conjunction") {
    val rep = operators.TextAnalysis.repetition(spark, sf).collect()
    rep.foreach { r =>
      val d2 = r.getAs[Double]("dup_2gram_ratio")
      val d3 = r.getAs[Double]("dup_3gram_ratio")
      assert(d2 >= 0.0 && d2 < 1.0 && d3 >= 0.0 && d3 < 1.0, r.toString)
    }
    val rules = operators.TextAnalysis.qualityRules(spark, sf).collect()
    rules.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("len_ok") && r.getAs[Boolean]("stop_ok")
          && r.getAs[Boolean]("rep_ok")), r.toString)
    }
    assert(rules.exists(_.getAs[Boolean]("keep")), "no doc survives the rules")
  }

  test("profile reports one row per orders column with sane stats") {
    val rows = operators.CurationOps.profile(spark, sf).collect()
    val nRows = Tables.orders(spark, sf).count()
    assert(rows.length == Tables.orders(spark, sf).columns.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("n_nulls") >= 0)
      val nd = r.getAs[Long]("n_distinct")
      assert(nd >= 1 && nd <= nRows, s"${r.getAs[String]("col_name")}: $nd")
    }
  }

  test("scd2: every updated customer has exactly one open interval") {
    import spark.implicits._
    val scd = operators.OlapExtras.scd2(spark, sf)
    val byKey = scd.groupBy($"c_custkey")
      .agg(count(lit(1)).as("versions"),
        sum(when($"is_current", 1).otherwise(0)).as("open"))
      .collect()
    byKey.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      assert(r.getAs[Long]("open") == 1, s"customer $k open intervals != 1")
      val expected = if (k % 7 == 0) 2L else 1L
      assert(r.getAs[Long]("versions") == expected, s"customer $k versions")
    }
  }

  test("funnel stage counts are monotone non-increasing") {
    val r = operators.OlapExtras.funnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_click_after_view"), r.getAs[Long]("n_purchase_after_click"))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0)
  }

  test("window distribution: quartiles 1..4, pct_rank/cdist in [0,1]") {
    import spark.implicits._
    val df = operators.OlapExtras.windowDistribution(spark, sf)
    val bad = df.filter($"quartile" < 1 || $"quartile" > 4 ||
      $"pct_rank" < 0 || $"pct_rank" > 1 || $"cdist" <= 0 || $"cdist" > 1)
    assert(bad.count() == 0)
    assert(df.select("quartile").distinct().count() == 4)
  }

  test("unpivot melts 3 status rows into 9 (status, metric) rows") {
    import spark.implicits._
    val df = operators.OlapExtras.unpivotMetrics(spark, sf)
    assert(df.count() == 9)
    assert(df.select($"metric").distinct().count() == 3)
  }

  test("conditional agg: filtered count never exceeds group count") {
    import spark.implicits._
    val per = Tables.lineitem(spark, sf).groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    operators.OlapExtras.conditionalAgg(spark, sf).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("n_disc") <= per(flag))
      assert(r.getAs[Boolean]("all_pos"))
    }
  }

  test("normalize_text: no doubled spaces, no uppercase, trimmed") {
    import spark.implicits._
    val df = operators.TextAnalysis.normalizeText(spark, sf)
    val bad = df.filter($"norm_text".contains("  ") ||
      $"norm_text" =!= lower($"norm_text") || $"norm_text" =!= trim($"norm_text"))
    assert(bad.count() == 0)
  }

  test("pmi bigrams: every surviving pair meets the frequency floor; pmi finite") {
    import spark.implicits._
    // sf0.001's 50-doc corpus is too small for the default floor — lower it
    val df = operators.TextAnalysis.pmiBigrams(spark, sf, minCount = 5)
    assert(df.count() > 0)
    val bad = df.filter($"n_pair" < 5 || isnan($"pmi") || $"pmi".isNull)
    assert(bad.count() == 0)
  }

  test("token-budget mix: two-phase bucket selection equals the naive global cumsum") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = operators.CurationOps.tokenBudgetMix(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toMap
    // independent naive form: per-source global window cumsum (the oracle's
    // shape) — the two-phase bucketed selection must pick the SAME docs
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    val naive = Tables.documents(spark, sf)
      .select($"doc_id", $"source",
        md5($"doc_id".cast("string")).as("h"),
        size(split(trim($"text"), "\\s+")).cast("long").as("tokens"))
      .filter($"tokens" > 0)
      .withColumn("before", sum($"tokens").over(w) - $"tokens")
      .filter($"before" < lit(300L) + substring($"source", 4, 9).cast("long") * 25L)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("sum_tokens"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"))).toMap
    assert(got == naive)
    // greedy-prefix invariant: each source stops at the boundary doc — the
    // selected total either covers the whole source or first crosses budget
    val totals = Tables.documents(spark, sf)
      .select($"source", size(split(trim($"text"), "\\s+")).cast("long").as("t"))
      .filter($"t" > 0).groupBy($"source").agg(sum($"t").as("tot")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("tot")).toMap
    got.foreach { case (src, (_, sumTok)) =>
      val budget = 300L + src.drop(3).toLong * 25L
      assert(sumTok == totals(src) || sumTok >= budget,
        s"$src selected $sumTok of ${totals(src)} under budget $budget")
    }
  }

  test("contamination fraction: deciles bounded, doc counts complete, zero-overlap kept") {
    import spark.implicits._
    val rows = operators.CurationOps.contamFraction(spark, sf).collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0 && d <= 10, s"decile $d out of range")
      assert(r.getAs[Long]("sum_shared") <= r.getAs[Long]("sum_total"))
    }
    // every non-benchmark doc with >=3 tokens appears in exactly one decile
    val expected = Tables.documents(spark, sf)
      .filter($"doc_id" % 97 =!= 0 &&
        size(split(trim($"text"), "\\s+")) >= 3).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
    // the inner-join op only sees overlapping docs; this one must also keep
    // the zero-overlap mass (decile 0 n_docs > flagged-doc count difference)
    val flagged = operators.CurationOps.decontaminate(spark, sf).count()
    val zeroDocs = rows.filter(_.getAs[Long]("decile") == 0)
      .map(_.getAs[Long]("n_docs")).sum
    assert(zeroDocs >= expected - flagged,
      s"decile 0 ($zeroDocs) must cover the ${expected - flagged} unflagged docs")
  }

  test("vocab/oov: rates in [0,1], oov tokens really absent from the fitted vocab") {
    import spark.implicits._
    val rows = operators.CurationOps.vocabOov(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, rate) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Double]("oov_rate"))
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-6)
    }
    // test-side token mass must cover the whole test split
    val expected = Tables.documents(spark, sf)
      .filter(substring(md5($"doc_id".cast("string")), 1, 2) >= "cd")
      .select(explode(split(trim($"text"), "\\s+"))).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == expected)
  }

  test("cascade delete: FK math consistent, subjects' data fully covered") {
    import spark.implicits._
    val rows = operators.IntegrityOps.cascadeDelete(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_deleted"), r.getAs[Long]("n_surviving"))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    assert(rows("customer")._1 ==
      Tables.customer(spark, sf).filter($"c_custkey" % 101 === 0).count())
    // totals reconcile per table
    assert(rows("orders")._1 + rows("orders")._2 == Tables.orders(spark, sf).count())
    assert(rows("lineitem")._1 + rows("lineitem")._2 == Tables.lineitem(spark, sf).count())
    // no surviving order may belong to an erased customer
    val leak = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).filter($"c_custkey" % 101 === 0),
        $"o_custkey" === $"c_custkey", "left_semi").count()
    assert(leak == rows("orders")._1, "cascade missed orders of erased subjects")
  }

  test("orc roundtrip preserves the aggregate computed on the source") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val viaOrc = operators.CurationOps.orcRoundtrip(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("sum_price"))).toMap
    val direct = Tables.orders(spark, sf).filter($"o_totalprice" > 1000.0)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("s"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n"), r.getAs[Double]("s"))).toMap
    assert(viaOrc == direct)
  }

  test("source filter: covers every source, verdict follows the floor rule") {
    val out = operators.CurationOps.sourceFilter(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.length.toLong == nSources)
    out.foreach { r =>
      val (n, q, v) = (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_quality"),
        r.getAs[String]("verdict"))
      assert(q >= 0.0 && q <= 1.0)
      assert(v == (if (n >= 5 && q >= 0.25) "keep" else "drop"))
    }
  }

  test("ingest report: dispositions partition the batch, tokens conserved") {
    import spark.implicits._
    val out = operators.CurationOps.ingestReport(spark, sf).collect()
    val statuses = out.map(_.getAs[String]("final_status")).toSet
    assert(statuses.subsetOf(Set("accept", "drop_source", "drop_exact", "drop_near")))
    val mx = Tables.documents(spark, sf).agg(max($"doc_id")).as[Long].head()
    val batch = Tables.documents(spark, sf)
      .filter($"doc_id" >= (mx + 1) * 4 / 5)
      .select(size(split(trim($"text"), "\\s+")).as("n"))
      .agg(count(lit(1)), sum($"n".cast("long"))).as[(Long, Long)].head()
    assert(out.map(_.getAs[Long]("n_docs")).sum == batch._1)
    assert(out.map(_.getAs[Long]("n_tokens")).sum == batch._2)
  }

  test("streaming ingest report equals the batch report exactly") {
    val streamed = operators.CurationOps.streamIngestReport(spark, sf)
      .orderBy("final_status").collect().toSeq
    val batch = operators.CurationOps.ingestReport(spark, sf)
      .orderBy("final_status").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("duplicated n-gram fraction: bounded, and exact for a hand-checked doc") {
    import spark.implicits._
    val out = operators.CurationOps.dupNgramFraction(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, d, f) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"),
        r.getAs[Double]("dup_frac"))
      assert(d >= 0 && d <= n && math.abs(f - d.toDouble / n) < 1e-15)
    }
    // independent recount for one doc: its shingles' doc frequencies
    val id = out.head.getAs[Long]("doc_id")
    def sh(text: String): Set[String] = {
      val t = text.trim.split("\\s+")
      (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }
    val all = Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect().filter(_._2.trim.split("\\s+").length >= 3)
    val dfByShingle = all.flatMap { case (i, t) => sh(t).map(_ -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val mine = sh(all.find(_._1 == id).get._2)
    val wantDup = mine.count(g => dfByShingle(g) >= 5).toLong
    val got = out.find(_.getAs[Long]("doc_id") == id).get
    assert(got.getAs[Long]("n_shingles") == mine.size.toLong)
    assert(got.getAs[Long]("n_dup") == wantDup)
  }

  test("length buckets: partition the corpus, non-negative exact padding waste") {
    val out = operators.CurationOps.lengthBuckets(spark, sf).collect()
    val valid = Set(16, 32, 64, 128, 256, 512)
    assert(out.map(_.getAs[Int]("bucket")).forall(valid))
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (b, nd, nt, w) = (r.getAs[Int]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("padding_waste"))
      assert(w >= 0)
      // waste never exceeds the bucket capacity times the doc count
      assert(w <= b.toLong * nd)
      assert(nt > 0 && nd > 0)
    }
  }

  test("temperature mix: weights match a local alpha-power recompute exactly") {
    val out = operators.CurationOps.temperatureMix(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("weight"), r.getAs[Double]("alloc_tokens"),
        r.getAs[Double]("epochs"))).sortBy(_._1)
    // local reference: same per-source counts, pow, and SAME source-ordered
    // running sum (float addition order is part of the contract)
    val nTok = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getString(1).trim.split("\\s+").length.toLong).sum)
      .toMap
    assert(out.map(_._1).toSet == nTok.keySet)
    val pw = nTok.toSeq.sortBy(_._1).map { case (src, n) => src -> math.pow(n.toDouble, 0.7) }
    val tot = pw.map(_._2).foldLeft(0.0)(_ + _) // sequential, source order
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r3(x: Double) = BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.zip(pw).foreach { case ((src, n, w, alloc, ep), (src2, p)) =>
      assert(src == src2 && n == nTok(src))
      assert(w == r6(p / tot), s"$src weight")
      assert(alloc == r3(p / tot * 1000000L), s"$src alloc")
      assert(ep == r6(p / tot * 1000000L / n), s"$src epochs")
    }
    // alpha < 1 flattens: the weight/token-share ratio must be HIGHER for
    // smaller sources (upsampling) and lower for larger ones
    val totTok = nTok.values.sum.toDouble
    val ratios = out.map { case (src, n, w, _, _) => (n, w / (n / totTok)) }
    val sorted = ratios.sortBy(_._1)
    assert(sorted.head._2 >= sorted.last._2)
    // weights sum to ~1 and allocations to ~the budget
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_._4).sum - 1000000.0) < 1.0)
  }

  test("score calibration: exact per-source percent_rank, bottom quartile dropped") {
    val out = operators.CurationOps.scoreCalibrate(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("raw_score"), r.getAs[Double]("pct"), r.getAs[Boolean]("keep")))
    assert(out.length.toLong == Tables.documents(spark, sf).count())
    out.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.length
      // exact (rank-1)/(n-1) percentiles under the deterministic
      // (raw_score, doc_id) ordering — distinct keys, no tie ambiguity
      val ranked = rows.sortBy { case (id, _, sc, _, _) => (sc, id) }.zipWithIndex
      ranked.foreach { case ((_, _, _, pct, keep), i) =>
        val want = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(pct == want)
        assert(keep == (pct >= 0.25))
      }
      // "drop the bottom quartile of EVERY source": each source keeps ~75%
      val kept = rows.count(_._5)
      assert(kept >= (n * 3) / 4 - 1 && kept <= n)
    }
  }

  test("cluster cap: accounting consistent with the cluster assignment") {
    import org.apache.spark.sql.functions._
    val row = operators.CurationOps.clusterCap(spark, sf).collect()(0)
    val nDocs = row.getAs[Long]("n_docs")
    val nClustered = row.getAs[Long]("n_clustered")
    val nRemoved = row.getAs[Long]("n_removed")
    val nKept = row.getAs[Long]("n_kept")
    assert(nDocs == Tables.documents(spark, sf).count())
    assert(nKept == nDocs - nRemoved)
    assert(nRemoved >= 0 && nRemoved <= nClustered)
    // n_clustered equals the component assignment's row count, and the
    // removals equal the per-cluster overflow beyond the cap of 2
    val sizes = operators.CurationOps.dedupClusters(spark, sf)
      .groupBy(col("cluster_id")).count().collect().map(_.getLong(1))
    assert(nClustered == sizes.sum)
    assert(nRemoved == sizes.map(s => math.max(0L, s - 2)).sum)
    // capping is weaker than keep-best: it never removes more than
    // keep-best's winner-only policy would
    assert(nRemoved <= sizes.map(s => math.max(0L, s - 1)).sum)
  }

  test("star contraction equals min-label propagation; handles a long chain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same fixture graph, two algorithms, identical labeling
    val prop = operators.CurationOps.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = operators.CurationOps.dedupClustersStar(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop && star.nonEmpty)
    // the shape propagation is worst at: one 60-edge chain (diameter 60,
    // beyond the propagation's 20-round cap) plus a separate triangle —
    // star contraction's O(log d) rounds resolve it easily
    val chain = (0L until 60L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val edges = (chain ++ tri).toDF("a", "b")
    val comp = operators.CurationOps.starComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 60L).forall(comp(_) == 0L), "whole chain must label 0")
    assert(Seq(100L, 101L, 102L).forall(comp(_) == 100L))
    assert(comp.size == 64)
  }

  test("curriculum: best band first, deterministic, head selected without a global window") {
    val rows = operators.CurationOps.curriculumOrder(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    // band order is non-increasing (highest-quality quartile leads)
    val bands = rows.map(_.getAs[Int]("band")).toSeq
    assert(bands == bands.sorted.reverse)
    assert(bands.head == 3)
    // deterministic: a second run reproduces the exact order
    val again = operators.CurationOps.curriculumOrder(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSeq)
    // the head selection is a distributed bounded reduction, not a global
    // rank window: TakeOrderedAndProject in the plan, and the only Window
    // sits above the ≤20-row limit
    val plan = operators.CurationOps.curriculumOrder(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
