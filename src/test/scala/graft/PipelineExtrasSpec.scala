package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions: Aho–Corasick blocklist screening, incremental
  * materialized-view maintenance, and mergeable HLL sketch union. */
class PipelineExtrasSpec extends AnyFunSuite {
  import TestSpark._

  // ---- blocklist / Aho–Corasick ----

  private def naiveMatches(text: String, phrases: Seq[String]): String = {
    val framed = " " + text + " "
    phrases.filter(p => framed.contains(" " + p + " ")).sorted.mkString(",")
  }

  test("blocklist: automaton equals naive contains on every fixture doc") {
    val bl = operators.TextAnalysis.Blocklist
    val rows = operators.TextAnalysis.blocklistFilter(spark, sf).collect()
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == texts.size)
    var nBlockedDocs = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val got = r.getAs[String]("blocked")
      val want = naiveMatches(texts(id), bl)
      assert(got == want, s"doc $id: got '$got' want '$want'")
      val n = r.getAs[Int]("n_blocked")
      assert(n == (if (want.isEmpty) 0 else want.count(_ == ',') + 1))
      assert(r.getAs[String]("verdict") == (if (n > 0) "drop" else "keep"))
      if (n > 0) nBlockedDocs += 1
    }
    // the fixture corpus must actually exercise both verdicts
    assert(nBlockedDocs > 0 && nBlockedDocs < rows.length)
  }

  test("blocklist: overlapping patterns both report; boundaries respected") {
    val aho = new functions.AhoCorasick(Array(
      "table scan", "slow table scan", "scan", "able"))
    def m(t: String): String = aho.matchedCsv(UTF8String.fromString(t)).toString
    // nested phrase: the inner "table scan" and "scan" occur inside the outer
    assert(m("a slow table scan here") == "scan,slow table scan,table scan")
    // token boundaries: "able" never matches inside "table"
    assert(m("the table is able") == "able")
    // edges of the string count as boundaries
    assert(m("scan") == "scan")
    assert(m("table scan") == "scan,table scan")
    // substrings across token boundaries do not match
    assert(m("tables can") == "")
    assert(m("") == "")
  }

  test("blocklist: automaton equals naive on random texts (fuzz)") {
    val vocab = Array("slow", "table", "scan", "fast", "merge", "a", "the",
      "scans", "tab", "slowtable")
    val phrases = Array("slow table", "table scan", "scan", "fast merge",
      "slow table scan", "the a the")
    val aho = new functions.AhoCorasick(phrases)
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val text = Array.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
      val got = aho.matchedCsv(UTF8String.fromString(text)).toString
      val want = naiveMatches(text, phrases.toSeq)
      assert(got == want, s"text '$text': got '$got' want '$want'")
    }
  }

  // ---- incremental materialized-view maintenance ----

  test("incremental agg: merged partials equal full recompute, exactly") {
    import spark.implicits._
    val out = operators.IntegrityOps.incrementalAgg(spark, sf).collect()
    assert(out.nonEmpty)
    // base + delta partition the facts
    out.foreach { r =>
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") ==
        r.getAs[Long]("n_orders"))
    }
    // both generations must be non-trivially populated at this cut
    assert(out.map(_.getAs[Long]("n_base")).sum > 0)
    assert(out.map(_.getAs[Long]("n_delta")).sum > 0)
    // the merged view equals a direct one-shot aggregate of all facts
    val full = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("rev"))
      .collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n"), r.getAs[Double]("rev"))).toMap
    assert(out.length == full.size)
    out.foreach { r =>
      val (n, rev) = full(r.getAs[String]("nation"))
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("revenue") == rev) // decimal sums: bit-exact
      assert(math.abs(r.getAs[Double]("avg_price") - rev / n) <= 5e-7)
    }
  }

  test("blocklist: a 1000-phrase automaton stays correct (scale fuzz)") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho", "sigma")
    def phrase(): String =
      Array.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val phrases = Iterator.continually(phrase()).distinct.take(1000).toArray
    val aho = new functions.AhoCorasick(phrases)
    (1 to 50).foreach { _ =>
      val text = Array.fill(40 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
      val got = aho.matchedCsv(UTF8String.fromString(text)).toString
      val want = naiveMatches(text, phrases.toSeq)
      assert(got == want, s"1000-phrase mismatch on '$text'")
    }
  }

  // ---- split-leakage audit ----

  test("split leakage: exactly the straddling subset of the minhash pairs") {
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(1).map("%02x".format(_)).mkString
      if (hex < "cd") "train" else "test"
    }
    val leaks = operators.DedupOps.splitLeakage(spark, sf).collect()
    val pairs = operators.DedupOps.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = pairs.filter { case (a, b) => splitOf(a) != splitOf(b) }
    assert(leaks.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet == expected)
    leaks.foreach { r =>
      assert(r.getAs[String]("split_a") != r.getAs[String]("split_b"))
      assert(r.getAs[Double]("jacc") > 0.3)
    }
  }

  // ---- observe() quality gate ----

  test("observe metrics: counters equal direct aggregates, zero extra scan") {
    import spark.implicits._
    val r = operators.AuditOps.observeMetrics(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val li = Tables.lineitem(spark, sf)
    assert(row.getAs[Long]("rows_in") == li.count())
    assert(row.getAs[Long]("n_high_discount") ==
      li.filter($"l_discount" > 0.05).count())
    assert(row.getAs[Long]("n_bulk") == li.filter($"l_quantity" >= 30).count())
    // the screen partitions the input
    assert(row.getAs[Long]("rows_out") + row.getAs[Long]("n_high_discount") ==
      row.getAs[Long]("rows_in"))
    // both rule counters must actually fire on the fixture
    assert(row.getAs[Long]("n_high_discount") > 0 && row.getAs[Long]("n_bulk") > 0)
  }

  // ---- runtime bloom-filter join pruning ----

  test("runtime filter: might_contain injected into the fact side, answer unchanged") {
    import spark.implicits._
    val (df, out) = operators.ScaleOps.runtimeFilterPlan(spark, sf)
    // executedPlan was memoized while the runtime-filter confs were set
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in plan:\n${plan.take(3000)}")
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  // ---- mergeable HLL sketch union ----

  test("sketch union: exact counts verified, estimate within bound") {
    import spark.implicits._
    val r = operators.ScaleOps.sketchUnion(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val dayUser = Tables.events(spark, sf)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    assert(row.getAs[Long]("n_days") ==
      dayUser.select("d").distinct().count())
    assert(row.getAs[Long]("sum_daily") == dayUser.count())
    assert(row.getAs[Long]("exact_users") ==
      dayUser.select("user_id").distinct().count())
    // summing daily distincts must overcount returning users — the
    // motivation for the sketch union — and the union must stay in bound
    assert(row.getAs[Long]("sum_daily") > row.getAs[Long]("exact_users"))
    assert(row.getAs[Boolean]("union_within_5pct"))
  }

  // ---- distribution drift (PSI + KS) ----

  test("psi drift: PSI non-negative, KS in [0,1], verdict matches threshold") {
    val row = operators.AnalyticsOps.psiDrift(spark, sf).collect()(0)
    val psi = row.getAs[Double]("psi")
    val ks = row.getAs[Double]("ks")
    // every PSI term (a-b)·ln(a/b) is ≥ 0, so the sum must be too
    assert(psi >= 0.0)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(row.getAs[Boolean]("drift") == (psi > 0.1))
    assert(row.getAs[Long]("n_ref") + row.getAs[Long]("n_cur") ==
      Tables.events(spark, sf).count())
    // identical slices must show zero drift: compare a slice against itself
    // by construction (same predicate both sides) via the ks/psi formulas —
    // here approximated by the fixture's two halves being near-identical
    // distributions, so psi should be far below the 0.1 alarm line
    assert(!row.getAs[Boolean]("drift"),
      s"fixture halves are iid draws; psi=$psi should not alarm")
  }

  // ---- retrieval evaluation (nDCG / MRR / P@k) ----

  test("retrieval eval: metric bounds and internal consistency per query") {
    val rows = operators.SimilarityOps.retrievalEval(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_at_k")
      val rr = r.getAs[Double]("rr")
      val ndcg = r.getAs[Double]("ndcg")
      val hits = r.getAs[Long]("n_rel_at_k")
      assert(p >= 0.0 && p <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(hits >= 0 && hits <= 5)
      assert(math.abs(p - hits / 5.0) < 1e-9)
      // any hit in the top-k implies a positive reciprocal rank and nDCG
      assert((hits > 0) == (rr > 0.0))
      assert((hits > 0) == (ndcg > 0.0))
      // rr is 1/rank of the first hit: bounded by 1 and at least 1/k
      if (hits > 0) assert(rr >= 1.0 / 5.0 - 1e-9 && rr <= 1.0)
    }
  }

  // ---- asymmetric containment ----

  test("containment: directed, threshold honored, matches a brute-force recompute") {
    import spark.implicits._
    val got = operators.DedupOps.containmentPairs(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.nonEmpty)
    got.foreach { case (inner, outer, cov) =>
      assert(inner != outer)
      assert(cov >= 0.9 - 1e-12 && cov <= 1.0 + 1e-12)
    }
    // brute-force recompute on the small fixture (test-only O(n²) shape)
    val sh = Tables.documents(spark, sf).collect().flatMap { r =>
      val t = r.getAs[String]("text").trim.split("\\s+")
      if (t.length < 3) None
      else Some((r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        t.sliding(3).map(_.mkString(" ")).toSet))
    }
    val want = (for {
      (ia, la, sa) <- sh; (ib, lb, sb) <- sh
      if la == lb && sa.size < sb.size && (sa & sb).size * 10 >= 9 * sa.size
    } yield (ia, ib, (sa & sb).size.toDouble / sa.size)).toSet
    assert(got == want)
  }

  // ---- TTL dedup (dropDuplicatesWithinWatermark) ----

  test("stream ttl dedup: redelivered ids with shifted timestamps are dropped") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val distinctIds = ev.select($"event_id").distinct().count()
    val redelivered = ev.filter($"event_id" % 10 === 0).count()
    assert(redelivered > 0, "the redelivery construction must add duplicates")
    // the raw union carries the duplicates; the TTL dedup must remove them
    val got = streaming.StreamingOps.streamDedupTtl(spark, sf)
      .collect()(0).getLong(0)
    assert(got == distinctIds,
      s"expected $distinctIds distinct ids, got $got (union had ${distinctIds + redelivered})")
  }

  // ---- streaming point-in-time features ----

  test("stream pit: stateful stream equals the batch point-in-time join exactly") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"),
        Option(r.getAs[Double]("last_click_value")),
        Option(r.getAs[Double]("last_view_value")),
        r.getAs[Long]("n_clicks_so_far"))
    val streamed = streaming.TransformWithStateOps.streamPitFeatures(spark, sf)
      .collect().map(key).toSet
    val batch = operators.TimeJoins.pitFeatures(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty,
      "the serving-path stream and the training-path batch PIT must agree")
  }

  // ---- streaming PIT across micro-batch boundaries ----

  test("stream pit: state carries across time-ordered micro-batches") {
    import spark.implicits._
    import sources.ManifestTable
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pitmb_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(dir)
    val ev = Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "click", "view"))
      .select($"event_id", $"user_id", $"ts".cast("timestamp").as("ts"),
        $"event_type", $"value")
    // three TIME-ORDERED commits: each later commit holds strictly later
    // events, so per-user arrival across batches respects event time —
    // the ordering contract under which cross-batch PIT is exact
    val cut1 = java.sql.Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
    ManifestTable.merge(spark, dir, ev.filter($"ts" < cut1), Seq("event_id"))
    ManifestTable.merge(spark, dir,
      ev.filter($"ts" >= cut1 && $"ts" < cut2), Seq("event_id"))
    ManifestTable.merge(spark, dir, ev.filter($"ts" >= cut2), Seq("event_id"))
    assert(ManifestTable.currentVersion(dir) == 2)
    // one commit per micro-batch: three batches, state must carry across
    val stream = spark.readStream.format("graft.sources.ManifestStreamSource")
      .option("path", dir).option("versionsPerBatch", 1).load()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"),
        Option(r.getAs[Double]("last_click_value")),
        Option(r.getAs[Double]("last_view_value")),
        r.getAs[Long]("n_clicks_so_far"))
    val streamed = streaming.TransformWithStateOps.runPit(spark, stream)
      .collect().map(key).toSet
    val batch = operators.TimeJoins.pitFeatures(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty,
      "a three-batch replay must still compute the exact batch PIT answer")
  }

  // ---- language-ID evaluation ----

  test("langid eval: internally consistent; kappa exposes the at-chance component") {
    val row = operators.TextAnalysis.langIdEval(spark, sf).collect()(0)
    val n = row.getAs[Long]("n_eval")
    val correct = row.getAs[Long]("n_correct")
    val acc = row.getAs[Double]("accuracy")
    val pe = row.getAs[Double]("pe")
    val kappa = row.getAs[Double]("kappa")
    assert(n == Tables.documents(spark, sf).count())
    assert(math.abs(acc - correct.toDouble / n) < 1e-9)
    assert(kappa >= -1.0 && kappa <= 1.0 && kappa <= acc + 1e-9)
    // the measurement's payoff on THIS fixture: the lang label is
    // independent of the (jargon) text, so the keyword heuristic scores
    // ~40% raw accuracy — which LOOKS non-trivial — while kappa lands at
    // ~0, correctly exposing an uninformative component. This is exactly
    // the at-chance trap the chance correction exists to catch.
    assert(math.abs(kappa) < 0.1, s"label-independent fixture, got kappa=$kappa")
    assert(math.abs(acc - pe) < 0.1)
  }

  // ---- tokenizer fertility ----

  test("tokenizer fertility: per-language ratios bounded and internally consistent") {
    val rows = operators.TokenizerOps.tokenizerFertility(spark, sf).collect()
    assert(rows.length == 5) // the fixture's five languages
    rows.foreach { r =>
      val tpw = r.getAs[Double]("tokens_per_word")
      val tpc = r.getAs[Double]("tokens_per_char")
      val nTok = r.getAs[Long]("n_tokens")
      val nWords = r.getAs[Long]("n_words")
      // every word is at least one BPE token; no word exceeds its char count
      assert(tpw >= 1.0 - 1e-9)
      assert(tpc <= 1.0 + 1e-9 && tpc > 0.0)
      assert(nTok >= nWords)
      assert(math.abs(tpw - nTok.toDouble / nWords) < 1e-6)
    }
  }

  // ---- point-in-time feature join ----

  test("pit features: no future leakage, matches an independent recomputation") {
    import spark.implicits._
    val got = operators.TimeJoins.pitFeatures(spark, sf)
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".as("label_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"value".as("cv"))
    // brute-force recomputation: inequality join + max-by-ts (test-only
    // O(n·m)-per-user shape — the operator's single-window plan is the
    // point; this just cross-checks it)
    val expect = p.join(c, $"user_id" === $"cu" && $"cts" <= $"label_ts", "left")
      .groupBy($"event_id")
      .agg(max(struct($"cts", $"cv")).getField("cv").as("exp_click_value"),
        count($"cts").as("exp_n_clicks"))
    val joined = got.join(expect, Seq("event_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(Option(r.getAs[Double]("last_click_value")) ==
        Option(r.getAs[Double]("exp_click_value")))
      assert(r.getAs[Long]("n_clicks_so_far") == r.getAs[Long]("exp_n_clicks"))
    }
  }

  // ---- kNN classifier eval (accuracy + Cohen's kappa) ----

  test("knn classifier: kappa bounds, chance correction on a near-random fixture") {
    val row = operators.SimilarityOps.knnClassifierEval(spark, sf).collect()(0)
    val n = row.getAs[Long]("n_eval")
    val correct = row.getAs[Long]("n_correct")
    val acc = row.getAs[Double]("accuracy")
    val pe = row.getAs[Double]("pe")
    val kappa = row.getAs[Double]("kappa")
    assert(n == 50 && correct >= 0 && correct <= n)
    assert(math.abs(acc - correct.toDouble / n) < 1e-9)
    assert(pe > 0.0 && pe < 1.0)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // kappa never exceeds raw accuracy (it subtracts the chance floor)
    assert(kappa <= acc + 1e-9)
    // fixture labels are ~independent of the embedding geometry, so the
    // chance-corrected agreement must sit near zero even though raw
    // accuracy can look "non-zero" — the statistic's whole purpose
    assert(math.abs(kappa) < 0.3, s"near-chance fixture, got kappa=$kappa")
  }
}
