package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-3 training-data curation operators: deterministic train/test
  * splitting, benchmark decontamination, BM25 retrieval scoring, dataset
  * profiling, near-dup cluster assignment (connected components), and an
  * ORC sink/scan round-trip.
  *
  * These extend the reference's pipeline surface (clean → dedup → load,
  * `/root/reference/dags/etl_spark_historical.py:178-207,302-333`) with the
  * ops a 100 TB LLM-corpus pipeline needs between "deduped" and "training":
  * held-out splitting, eval-set decontamination, retrieval scoring, and
  * profiling gates.
  */
object CurationOps {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** n-token shingle set (distinct). Guarded for short docs: with <n tokens
    * `sequence(0, size-n)` descends and slice() throws — mirror the oracle's
    * `len(t) >= n` with an empty set. */
  private def shingles(c: Column, n: Int): Column = {
    val t = toks(c)
    when(size(t) >= n,
      array_distinct(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** DSIR-STYLE IMPORTANCE-WEIGHTED DATA SELECTION (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how target-domain-like its hashed
    * unigram features are, and keep the positively-scored ones. Features
    * are 256 md5-prefix buckets (the portable engine-agnostic hash this
    * repo already splits with); the per-feature direction is the SIGN of
    * the Laplace-smoothed log-likelihood ratio, decided by exact integer
    * cross-multiplication — (c_t+1)(T_r+256) > (c_r+1)(T_t+256) ⟺
    * p_target(f) > p_raw(f) — so a document's score (the sum of its
    * tokens' votes) is an INTEGER and the selection boundary is
    * float-free on both engines (full real-valued LLR weights would rank
    * identically in expectation but make the oracle hash hostage to
    * summation order). Target stand-in: doc_id % 7 = 0 (in production,
    * the in-domain sample).
    *
    * Scale posture: one explode pass builds the cached (doc, feature)
    * projection; the feature statistics are ≤256 rows (broadcast), the
    * totals one row, and the per-doc score is a map-side join + hash
    * aggregate — nothing shuffles the text, nothing is all-pairs, and
    * the expensive tokenize runs once. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"lang", explode(toks($"text")).as("tok"))
      .where($"tok" =!= "")
      .select($"doc_id", $"lang", substring(md5($"tok"), 1, 2).as("f"))
      .persist()
    val stat = feats.groupBy($"f").agg(
      count(lit(1)).as("cr"),
      count(when($"doc_id" % 7 === 0, 1)).as("ct"))
    // corpus totals fold from the ≤256 feature rows — no second pass
    // over the exploded tokens
    val tot = stat.agg(
      sum($"cr").as("tr"), sum($"ct").as("tt"))
    // the cross-multiplication runs in DECIMAL(38,0): both factors are
    // < 2^63, so the product (< 8.5e37) stays EXACT where a Long would
    // silently wrap past ~3e9 tokens (the oracle widens to HUGEINT for
    // the same reason — both engines stay exact at corpus scale)
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val dirn = stat.crossJoin(broadcast(tot))
      .select($"f",
        when(d($"ct" + 1) * d($"tr" + 256L) > d($"cr" + 1) * d($"tt" + 256L),
          lit(1L)).otherwise(lit(-1L)).as("vote"))
    val scores = feats.join(broadcast(dirn), Seq("f"))
      .groupBy($"doc_id", $"lang").agg(sum($"vote").as("score"))
    // report the full per-language score distribution (selected =
    // positive LLR votes): on this synthetic fixture the stand-in
    // target's unigram distribution matches raw, so n_selected is
    // honestly ~0 — the oracle still bites on every doc's exact
    // integer score through the sums and extrema. The eager
    // localCheckpoint EXECUTES the plan while the token cache is live
    // (the sibling ops' pattern); a finally-unpersist would evict it
    // before the caller ever ran the lazy plan.
    val out = scores.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"score" > 0, 1)).as("n_selected"),
        sum($"score").as("sum_score"),
        min($"score").as("min_score"),
        max($"score").as("max_score"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  private val dsirSelectSql =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS f
      |  FROM toks WHERE tok <> ''),
      |tot AS (
      |  SELECT count(*) AS tr,
      |         count(*) FILTER (WHERE doc_id % 7 = 0) AS tt FROM feats),
      |stat AS (
      |  SELECT f, count(*) AS cr,
      |         count(*) FILTER (WHERE doc_id % 7 = 0) AS ct
      |  FROM feats GROUP BY f),
      |dirn AS (
      |  SELECT f, CASE WHEN CAST(ct + 1 AS HUGEINT) * CAST(tr + 256 AS HUGEINT)
      |                    > CAST(cr + 1 AS HUGEINT) * CAST(tt + 256 AS HUGEINT)
      |                 THEN 1 ELSE -1 END AS vote
      |  FROM stat, tot),
      |scores AS (
      |  SELECT doc_id, lang, CAST(sum(vote) AS BIGINT) AS score
      |  FROM feats JOIN dirn USING (f)
      |  GROUP BY doc_id, lang)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(count(*) FILTER (WHERE score > 0) AS BIGINT) AS n_selected,
      |       CAST(sum(score) AS BIGINT) AS sum_score,
      |       min(score) AS min_score, max(score) AS max_score
      |FROM scores GROUP BY lang""".stripMargin

  /** DSIR END-TO-END (round 15): parameterized-target scoring composed
    * into the paper's actual OUTPUT — an importance-SAMPLED selection at
    * a per-source token budget. Closes `dsirSelect`'s two declared
    * stand-ins: the target is a real in-domain document set (default:
    * the `doc_id % 97 = 0` benchmark slice the decontamination family
    * already defines — any predicate parameterizes it), and the integer
    * LLR score feeds an Efraimidis–Spirakis draw (`weightedSample`'s
    * hash-gated u, priority ln(u)/w with w = exp(score/n_tokens) — the
    * per-token average bounds w in [1/e, e], so no overflow at any
    * corpus size) whose per-source prefix under the token budget is the
    * selected corpus. Selection probability rises with target-likeness
    * but keeps diversity — exactly why the paper resamples instead of
    * taking top-k.
    *
    * Scale posture: scoring is the `dsirSelect` plan (one cached explode
    * pass, ≤256-row broadcast direction table, map-side join); the
    * budget prefix is the `tokenBudgetMix` two-phase prefix sum, but
    * bucketed by ⌊−priority⌋ (contiguous priority ranges, so bucket
    * order IS selection order): per-(source,bucket) totals make a tiny
    * cumsum table, fully-funded buckets are taken whole with no window,
    * only the one boundary bucket per source pays an exact within-bucket
    * window — no global sort, no per-source serialization. The oracle
    * states the plain global per-source cumsum semantics. */
  def dsirSample(s: SparkSession, dir: String,
      target: Column = col("doc_id") % 97 === 0): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val feats = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", explode(toks($"text")).as("tok"))
      .where($"tok" =!= "")
      .select($"doc_id", $"source", substring(md5($"tok"), 1, 2).as("f"))
      .persist()
    val stat = feats.groupBy($"f").agg(
      count(when(!target, 1)).as("cr"),
      count(when(target, 1)).as("ct"))
    val tot = stat.agg(sum($"cr").as("tr"), sum($"ct").as("tt"))
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val dirn = stat.crossJoin(broadcast(tot))
      .select($"f",
        when(d($"ct" + 1) * d($"tr" + 256L) > d($"cr" + 1) * d($"tt" + 256L),
          lit(1L)).otherwise(lit(-1L)).as("vote"))
    // integer importance score over RAW docs only (the target slice is
    // the domain sample, never a selection candidate); n_tokens doubles
    // as the feature count — one feature per non-empty token
    val scores = feats.where(!target)
      .join(broadcast(dirn), Seq("f"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"vote").as("score"), count(lit(1)).as("n_tokens"))
    val u = (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5d) / 4294967296.0d
    // the Efraimidis–Spirakis priority is transcendental (ln·exp), so it is
    // QUANTIZED to a 2^-20 grid before ANY ordering: every downstream
    // comparison — bucket assignment, within-bucket order, the oracle's
    // global cumsum order — then compares exact integers, and a 1-ulp libm
    // difference between engines can only matter in the measure-zero case
    // where the double lands within an ulp of a grid line (vs: any pair of
    // near-equal priorities or any bucket boundary before). |pri| ≤ ~61
    // (|ln u| ≤ 22.2, weight ≤ e), so pri·2^20 < 2^27 — floor and the /2^20
    // bucket division below are exact double arithmetic in both engines.
    val pri = floor(log(u) *
      exp(-($"score".cast("double") / $"n_tokens".cast("double"))) *
      1048576.0).cast("long")
    val budget = lit(400L) + substring($"source", 4, 9).cast("long") * 30L
    val ranked = scores.withColumn("pri", pri)
      .withColumn("bkt", floor((-$"pri").cast("double") / 1048576.0).cast("int"))
    val bucketW = Window.partitionBy($"source").orderBy($"bkt")
    val cum = ranked.groupBy($"source", $"bkt")
      .agg(sum($"n_tokens").as("btok"))
      .withColumn("cum_before", coalesce(
        sum($"btok").over(bucketW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val joined = ranked.join(broadcast(cum), Seq("source", "bkt"))
    val full = joined.filter($"cum_before" + $"btok" <= budget)
    val withinW = Window.partitionBy($"source", $"bkt")
      .orderBy($"pri".desc, $"doc_id")
    val boundary = joined
      .filter($"cum_before" < budget && $"cum_before" + $"btok" > budget)
      .withColumn("before",
        $"cum_before" + sum($"n_tokens").over(withinW) - $"n_tokens")
      .filter($"before" < budget)
    // eager: the plan must execute while the token cache is live (the
    // dsirSelect pattern — a finally-unpersist would evict it first)
    val out = full.select($"source", $"n_tokens", $"score")
      .union(boundary.select($"source", $"n_tokens", $"score"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        sum($"score").as("sum_score"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  private val dsirSampleSql =
    """WITH toksq AS (
      |  SELECT doc_id, source,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, source, substr(md5(tok), 1, 2) AS f
      |  FROM toksq WHERE tok <> ''),
      |stat AS (
      |  SELECT f, count(*) FILTER (WHERE doc_id % 97 <> 0) AS cr,
      |         count(*) FILTER (WHERE doc_id % 97 = 0) AS ct
      |  FROM feats GROUP BY f),
      |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM stat),
      |dirn AS (
      |  SELECT f, CASE WHEN CAST(ct + 1 AS HUGEINT) * CAST(tr + 256 AS HUGEINT)
      |                    > CAST(cr + 1 AS HUGEINT) * CAST(tt + 256 AS HUGEINT)
      |                 THEN 1 ELSE -1 END AS vote
      |  FROM stat, tot),
      |scores AS (
      |  SELECT doc_id, source, CAST(sum(vote) AS BIGINT) AS score,
      |         count(*) AS n_tokens
      |  FROM feats JOIN dirn USING (f)
      |  WHERE doc_id % 97 <> 0 GROUP BY doc_id, source),
      |pri AS (
      |  SELECT source, score, n_tokens,
      |         CAST(floor(ln((CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
      |                       / 4294967296.0)
      |                    * exp(-(CAST(score AS DOUBLE) / n_tokens))
      |                    * 1048576.0) AS BIGINT) AS pri,
      |         doc_id
      |  FROM scores),
      |sel AS (
      |  SELECT source, score, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY source ORDER BY pri DESC, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS before
      |  FROM pri)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |       CAST(sum(score) AS BIGINT) AS sum_score
      |FROM sel WHERE before < 400 + 30 * CAST(substr(source, 4) AS BIGINT)
      |GROUP BY source""".stripMargin

  /** Deterministic hash-based train/test split: a doc lands in `train` iff
    * the first two hex chars of md5(doc_id) sort below "cd" (205/256 ≈ 80%).
    * Hash-splitting (vs random) is reproducible across runs, engines, and
    * re-shards — the property a training pipeline actually needs: adding new
    * docs never reassigns old ones. Row-local (no shuffle except the final
    * small aggregate); the split column itself is free at any scale. */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", $"n_chars",
        when(substring(md5($"doc_id".cast("string")), 1, 2) < "cd", "train")
          .otherwise("test").as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"))
  }

  private val trainTestSplitSql =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
      |            THEN 'train' ELSE 'test' END AS split,
      |       lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** Benchmark decontamination: flag corpus documents sharing any 3-token
    * shingle with the "benchmark" set (deterministic stand-in: doc_id % 97 =
    * 0, ~1% of docs — in production this is the eval-suite text). The
    * classic training-data hygiene op (n-gram overlap decontamination à la
    * GPT-3 appendix C / The Pile — those use 8-13-grams over natural text;
    * the synthetic fixture's short random-word docs share almost no 5-grams,
    * so 3 keeps the op observable at test scale).
    *
    * Scale posture: the benchmark side is genuinely small (eval suites are
    * MBs, not TBs) — `broadcast()` is the correct plan, not a compromise.
    * The corpus side explodes to (doc, shingle-hash) pairs and map-side
    * joins against the broadcast set; no shuffle of corpus text, and the
    * aggregate carries only surviving (doc_id, hash) pairs. Pairwise work
    * happens on 64-bit hashes, never strings (collisions ~|sh|²/2⁶⁴,
    * negligible; the oracle checks the string semantics agree). */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist the hashed-shingle projection: both branches consume it, and
    // without materialization InferFiltersFromGenerate pushes size(sh)>0 /
    // isnotnull(sh) predicates below the explode — re-evaluating the whole
    // tokenize→shingle→hash pipeline 3× per row (measured 7.6 s → 1.5 s at
    // sf0.1). Cache holds only (doc_id, 64-bit hashes) — tiny vs the text.
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id",
        transform(shingles($"text", 3), x => xxhash64(x)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = docs.filter($"doc_id" % 97 === 0)
      .select(explode($"sh").as("h")).distinct()
    val out = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode($"sh").as("h"))
      .join(broadcast(bench), "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .localCheckpoint(true)
    docs.unpersist(false)
    out
  }

  /** Streaming decontamination: the corpus arrives as a document STREAM
    * (file source, `AvailableNow` replay = scheduled catch-up micro-batches)
    * and is flagged incrementally against the same static benchmark shingle
    * set. The per-batch work is a stateless broadcast stream-static join;
    * only the per-doc counts are stateful (complete-mode agg, state =
    * O(flagged docs) — a production deployment would watermark on ingest
    * time; the bounded replay keeps it exact here). Same oracle as the batch
    * op: streaming must not change the answer. */
  def streamingDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    // static side: benchmark shingle hashes — PERSISTED, because the static
    // side of a stream-static join is re-evaluated every micro-batch
    val bench = Tables.documents(s, dir)
      .filter($"doc_id" % 97 === 0 && size(toks($"text")) >= 3)
      .select(explode(transform(shingles($"text", 3), x => xxhash64(x))).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.functions.ShingleGen.register(s)
    val stream = s.readStream.schema(docSchema)
      .parquet(s"$dir/[d]ocuments.parquet")
      .filter($"doc_id" % 97 =!= 0 && size(toks($"text")) >= 3)
      // the fixture file is ONE split: without a shuffle the whole
      // tokenize→shingle→hash pipeline runs on a single task per batch
      // (the streaming twin of Tables.documentsSpread)
      .repartition(8)
      // custom Generator: one tight loop per doc, no intermediate arrays —
      // bit-identical hashes to the declarative pipeline (PropertySpec)
      .select($"doc_id",
        graft.functions.ShingleGen.explodeShingles($"text", 3).as("h"))
      .join(broadcast(bench), "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
    val out = graft.streaming.StreamingOps.runToParquet(s, stream, "graft_decont")
    bench.unpersist(false)
    out
  }

  private val decontaminateSql =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
      |  WHERE len(t) >= 3),
      |b AS (SELECT DISTINCT unnest(sh) AS g FROM d WHERE doc_id % 97 = 0),
      |c AS (SELECT doc_id, unnest(sh) AS g FROM d WHERE doc_id % 97 <> 0)
      |SELECT c.doc_id, count(*) AS n_shared
      |FROM c JOIN b USING (g) GROUP BY c.doc_id""".stripMargin

  private val Bm25Terms = Seq("spark", "vector", "merge", "window")
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 retrieval scoring of every document against a fixed query-term
    * set — the scoring half of a corpus search/decontamination stack.
    * Corpus statistics (N, avg doc length, per-term document frequency) come
    * from ONE aggregate pass, cross-joined back as a broadcast singleton; the
    * score itself is row-local. Per-term contributions are summed in fixed
    * textual order (not via an order-nondeterministic aggregate) so Spark
    * and DuckDB evaluate the identical float expression; the only remaining
    * engine divergence is libm `ln` (≤1 ulp), absorbed by round(…, 6). */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documentsSpread(s, dir)
      .select($"doc_id", toks(lower($"text")).as("t"))
      .withColumn("dl", size($"t").cast("double"))
    val dfCols = Bm25Terms.map(t =>
      sum(when(array_contains($"t", t), 1).otherwise(0)).cast("double").as(s"df_$t"))
    // doc lengths are small exact integers: their double-sum is exact, so
    // distributed summation order cannot change the value
    val statAggs = count(lit(1)).cast("double").as("n_docs") +:
      sum($"dl").as("sum_dl") +: dfCols
    val stats = docs.agg(statAggs.head, statAggs.tail: _*)
    val joined = docs.join(broadcast(stats))
    val avgdl = $"sum_dl" / $"n_docs"
    def contrib(term: String): Column = {
      val tf = size(filter($"t", x => x === lit(term))).cast("double")
      val idf = log(lit(1.0) +
        ($"n_docs" - col(s"df_$term") + 0.5) / (col(s"df_$term") + 0.5))
      when(tf > 0,
        idf * (tf * lit(K1 + 1.0)) /
          (tf + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / avgdl)))
        .otherwise(lit(0.0))
    }
    val score = Bm25Terms.map(contrib).reduce(_ + _)
    joined
      .filter(Bm25Terms.map(t => array_contains($"t", t)).reduce(_ || _))
      .select($"doc_id", round(score, 6).as("bm25"))
  }

  /** INVERTED-INDEX-served BM25 — the same ranking as [[bm25Search]], but
    * answered from a persisted index instead of a corpus scan. The index
    * is the classic IR layout, Spark-shaped:
    *
    *  - `postings/`: one row per (term, doc) with the term frequency AND
    *    the document length denormalized in (search engines store norms in
    *    the posting for exactly this reason — scoring then never joins a
    *    doc table), PARTITIONED by `p = pmod(xxhash64(term), 64)` so a
    *    query's terms prune to their hash buckets at the directory level,
    *    with `term IN (...)` pushed into the parquet scan below that;
    *  - `docmeta/`: (doc_id, dl) — only for the global constants
    *    (n_docs, avgdl), a 2-column aggregate, broadcast as one row.
    *
    * Per-query cost is ∝ postings of the QUERY terms (bucket-pruned,
    * predicate-pushed), not corpus size — the build pays one explode +
    * one (term, doc) aggregate, amortized over every search after it.
    * df(term) comes from the pruned postings themselves (one tiny
    * aggregate, broadcast back on term). Scoring is term-contribution
    * summation per doc — identical arithmetic to the scan path, so the
    * oracle is [[bm25Sql]] VERBATIM: the index may change the plan, never
    * the answer. */
  def bm25IndexSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_invidx_" +
      java.lang.ProcessHandle.current().pid()
    // BUILD (the amortized step; rebuilt per run because the fixture may
    // have changed — a production index lives in a manifest table)
    val docs = Tables.documentsSpread(s, dir)
      .select($"doc_id", toks(lower($"text")).as("t"))
      .withColumn("dl", size($"t").cast("double"))
    docs.select($"doc_id", $"dl", explode($"t").as("term"))
      .groupBy($"term", $"doc_id", $"dl")
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("p", pmod(xxhash64($"term"), lit(64)))
      .write.mode("overwrite").partitionBy("p").parquet(s"$root/postings")
    docs.select($"doc_id", $"dl")
      .write.mode("overwrite").parquet(s"$root/docmeta")

    // QUERY: prune to the terms' hash buckets at the directory level
    // (PartitionFilters on p), push `term IN` into the surviving files
    val post = s.read.parquet(s"$root/postings")
      .filter($"p".isin(Bm25Terms.map(pmodHash64(_).toInt).distinct: _*))
      .filter($"term".isin(Bm25Terms: _*))
    val stats = s.read.parquet(s"$root/docmeta")
      .agg(count(lit(1)).cast("double").as("n_docs"), sum($"dl").as("sum_dl"))
    val dfs = post.groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
    val avgdl = $"sum_dl" / $"n_docs"
    val idf = log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5))
    val contrib = idf * ($"tf" * lit(K1 + 1.0)) /
      ($"tf" + lit(K1) * (lit(1.0 - B) + lit(B) * $"dl" / avgdl))
    post
      .join(broadcast(dfs), "term")
      .join(broadcast(stats))
      .withColumn("c", contrib)
      .groupBy($"doc_id")
      .agg(round(sum($"c"), 6).as("bm25"))
  }

  /** The partition value `pmod(xxhash64(term), 64)` for a literal term —
    * computed through the engine's own expression so the query-side bucket
    * list can never drift from what the writer computed. */
  private def pmodHash64(term: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    Pmod(new XxHash64(Seq(Literal(term))), Literal(64L)).eval(null)
      .asInstanceOf[Long]
  }

  private[operators] val bm25Sql = {
    val terms = Bm25Terms
    val dfSelects = terms.map(t =>
      s"CAST(sum(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(",\n               ")
    val contribs = terms.map { t =>
      val tf = s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE)"
      s"""(CASE WHEN $tf > 0 THEN
         |  ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5))
         |  * ($tf * ${K1 + 1.0}) / ($tf + $K1 * (1.0 - $B + $B * dl / (sum_dl / n_docs)))
         |  ELSE 0.0 END)""".stripMargin
    }.mkString(" + ")
    val anyTerm = terms.map(t => s"list_contains(t, '$t')").mkString(" OR ")
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |d2 AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM d),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) AS sum_dl,
       |               $dfSelects
       |       FROM d2)
       |SELECT doc_id, round($contribs, 6) AS bm25
       |FROM d2, st
       |WHERE $anyTerm""".stripMargin
  }

  /** Near-duplicate cluster assignment: connected components over the
    * verified n-gram-Jaccard pair graph, labels = min doc_id per component.
    * Iterative min-label propagation (the dataframe form of large-star/
    * small-star): each round joins current labels across edges and takes the
    * min; converges in O(component diameter) rounds — near-dup components
    * are shallow, so a handful of shuffles, each carrying only (id, label)
    * pairs. `localCheckpoint` cuts lineage so the plan doesn't grow per
    * round. This is the op that turns pairwise dedup output into the
    * "keep one per cluster" decision a real pipeline executes. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.ngramJaccard(s, dir).select($"doc_a", $"doc_b")
    labelPropagationWithRounds(s, pairs)._1
  }

  /** The SCALE route made oracle-visible (round 13): the same min-label
    * fixpoint over the MinHash-LSH pair graph — banded candidates +
    * verified Jaccard, never all-pairs — so the pipeline that actually
    * runs at 100 TB (LSH pairs → components → keep-one) is hash-checked
    * end to end, not just measured. `q_dedup_clusters` keeps the exact
    * all-pairs baseline as the semantics oracle; this is the plan you
    * deploy. */
  def dedupClustersLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.minhashLsh(s, dir).select($"doc_a", $"doc_b")
    labelPropagationWithRounds(s, pairs)._1
  }

  /** The min-label-propagation core over an arbitrary undirected pair
    * table (columns = two long ids), returning the labeling AND the round
    * count it converged in — shared by the fixture query and the
    * multi-scale fixpoint measurement (`graft.IterBench` / SF1.md). */
  private[graft] def labelPropagationWithRounds(s: SparkSession,
      pairTable: DataFrame): (DataFrame, Int) = {
    import s.implicits._
    val cols = pairTable.columns
    val pairs = pairTable
      .select(col(cols(0)).as("doc_a"), col(cols(1)).as("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("label", $"id").localCheckpoint(true)
    // labels only ever decrease, so Σlabel strictly decreases until the
    // fixpoint — an O(1)-row aggregate is the whole convergence check (no
    // join-compare job). Exact: doc_id sums stay far below Long range.
    def labelSum(df: DataFrame): Long =
      df.agg(sum($"label")).first().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select($"dst".as("id"), $"label")
      val next = labels.union(prop).groupBy($"id").agg(min($"label").as("label"))
        .localCheckpoint(true)
      val s2 = labelSum(next)
      converged = s2 == prevSum
      prevSum = s2
      labels = next
      iter += 1
    }
    pairs.unpersist(false)
    edges.unpersist(false)
    // the scale-governing number for an iterative op: each round is a
    // full shuffle, so round count IS the cost model (SF1.md measures it)
    System.err.println(s"[rounds] dedup_clusters_labelprop rounds=$iter")
    (labels.select($"id".as("doc_id"), $"label".as("cluster_id")), iter)
  }

  /** Oracle: transitive closure by recursive CTE over the same pair graph
    * (small at fixture scale), component label = min reachable id. */
  private val dedupClustersSql = {
    val shingleSql =
      """list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])"""
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, lang, $shingleSql AS sh
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
       |  WHERE len(t) >= 3),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.sh, b.sh))) > 0.3),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |      UNION SELECT doc_b, doc_a FROM p),
       |r(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM r JOIN e ON r.dst = e.src)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM r GROUP BY src""".stripMargin
  }

  /** Oracle for the LSH-fed clustering: DuckDB connected components
    * (recursive CTE, min reachable id) over EXACTLY the restated MinHash
    * pair list `q_minhash_pairs` is hash-checked against — so the scale
    * route's labeling is verified over the same verified edge set. */
  private val dedupClustersLshSql =
    s"""WITH RECURSIVE ${DedupOps.minhashPairsCte.stripPrefix("WITH ")},
       |p AS (SELECT doc_a, doc_b FROM j WHERE jacc > 0.3),
       |eg AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |       UNION SELECT doc_b, doc_a FROM p),
       |r(src, dst) AS (
       |  SELECT src, dst FROM eg
       |  UNION
       |  SELECT r.src, eg.dst FROM r JOIN eg ON r.dst = eg.src)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM r GROUP BY src""".stripMargin

  /** The dedup DECISION: for each near-dup cluster keep the highest-quality
    * member (quality-score argmax, doc_id-desc tiebreak) — composing
    * connected components with the quality scorer into the row a pipeline
    * actually acts on. The per-cluster argmax is a tiny window over the
    * cluster assignment (clusters ≪ corpus); the quality score is
    * IEEE-exact, so both engines pick identical winners. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val labels = dedupClusters(s, dir)
    val quality = TextAnalysis.qualityScore(s, dir)
      .select($"doc_id", $"quality_score")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"quality_score".desc, $"doc_id".desc)
    labels.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy($"cluster_id")))
      .filter($"rn" === 1)
      .select($"cluster_id", $"doc_id".as("keep_doc"),
        $"n_members".cast("bigint").as("n_members"), $"quality_score")
  }

  private val dedupKeepBestSql = {
    // clusters CTE chain reused from dedupClustersSql; quality expr mirrors
    // TextAnalysis.qualityScore
    val base = dedupClustersSql.stripSuffix(
      "SELECT src AS doc_id, least(src, min(dst)) AS cluster_id\nFROM r GROUP BY src")
    require(base != dedupClustersSql, "clusters SQL tail changed; fix the reuse")
    s"""${base.trim},
       |labels AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM r GROUP BY src),
       |q AS (
       |  SELECT doc_id,
       |    (1.0 - CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(toks))
       |          * least(CAST(len(toks) AS DOUBLE), 200.0) / 200.0 AS quality_score
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)),
       |j AS (
       |  SELECT l.cluster_id, l.doc_id, q.quality_score,
       |         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
       |                            ORDER BY q.quality_score DESC, l.doc_id DESC) AS rn,
       |         count(*) OVER (PARTITION BY l.cluster_id) AS n_members
       |  FROM labels l JOIN q ON l.doc_id = q.doc_id)
       |SELECT cluster_id, doc_id AS keep_doc, n_members, quality_score
       |FROM j WHERE rn = 1""".stripMargin
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the O(log n)-round alternative to [[dedupClusters]]'s
    * min-label propagation, whose round count is O(graph diameter): on a
    * chain-shaped near-dup cluster of length d the propagation needs ~d
    * rounds while star contraction needs ~log d, and at 100 TB each round
    * is a full shuffle, so round count IS the cost. Each round: large-star
    * hangs every strictly-larger neighbor of u onto min(Γ(u) ∪ {u});
    * small-star hangs the smaller-or-equal ones. The edge set contracts
    * toward a star forest whose centers are the component minima — the
    * SAME (doc_id, cluster_id) labeling as the propagation, so the SAME
    * recursive-CTE oracle hash-checks both (one algorithm validates the
    * other end-to-end). Convergence = the edge multiset hash stops
    * changing (an O(1)-row aggregate per round, no join-compare job). */
  def dedupClustersStar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.ngramJaccard(s, dir).select($"doc_a", $"doc_b")
    starComponents(s, pairs)
  }

  /** The star-contraction core over an arbitrary undirected pair table
    * (columns = two long ids) — shared by the fixture query and the
    * synthetic-graph specs (chain diameter, equivalence). */
  private[graft] def starComponents(s: SparkSession, pairTable: DataFrame): DataFrame =
    starComponentsWithRounds(s, pairTable)._1

  /** [[starComponents]] + the ROUND COUNT it converged in — the number
    * the O(log n) claim is about (each round is one full shuffle, so at
    * 100 TB round count IS the cost); measured across growing synthetic
    * chains by the spec and across fixture scales by SF1.md. */
  private[graft] def starComponentsWithRounds(s: SparkSession,
      pairTable: DataFrame): (DataFrame, Int) = {
    import s.implicits._
    val cols = pairTable.columns
    val pairs = pairTable.select(col(cols(0)).as("doc_a"), col(cols(1)).as("doc_b"))
    var edges = pairs.union(pairs.select($"doc_b", $"doc_a")).toDF("u", "v")
      .distinct().localCheckpoint(true)
    def edgeSig(df: DataFrame): (Long, Long) = {
      // order-independent multiset signature: XOR-fold of edge hashes
      // (overflow-free under ANSI, unlike a sum) plus the edge count
      val r = df.agg(expr("bit_xor(xxhash64(u, v))"), count(lit(1))).first()
      (r.getLong(0), r.getLong(1))
    }
    def star(df: DataFrame, large: Boolean): DataFrame = {
      // m(u) = min of u's closed neighborhood. Large-star hangs every
      // strictly-larger neighbor onto m; small-star hangs the ≤ neighbors
      // AND u itself (the paper's {u} ∪ {v ≤ u} — without the self link
      // the converged stars would dissolve). Self-loops drop; duplicates
      // collapse; output is re-symmetrized for the next round.
      val m = df.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val hangNeighbors = df.join(m, "u")
        .filter(if (large) $"v" > $"u" else $"v" <= $"u")
        .select($"v".as("a"), $"m".as("b"))
      val hang = (if (large) hangNeighbors
        else hangNeighbors.union(m.select($"u".as("a"), $"m".as("b"))))
        .filter($"a" =!= $"b")
      hang.select($"a".as("u"), $"b".as("v"))
        .union(hang.select($"b".as("u"), $"a".as("v")))
        .distinct()
    }
    var sig = edgeSig(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < 30) {
      val next = star(star(edges, large = true), large = false)
        .localCheckpoint(true)
      val s2 = edgeSig(next)
      converged = s2 == sig
      sig = s2
      edges = next
      iter += 1
    }
    require(converged, s"star contraction did not converge in $iter rounds")
    // round count is the claim under test: ~log(component size), each
    // round one shuffle (SF1.md's multi-scale measurement reads this line)
    System.err.println(s"[rounds] star_components rounds=$iter")
    // converged: a star forest — every non-center points at its component
    // min, and centers are their own min
    (edges.filter($"v" < $"u").select($"u".as("doc_id"), $"v".as("cluster_id"))
      .union(edges.select(least($"u", $"v").as("doc_id"))
        .distinct().withColumn("cluster_id", $"doc_id"))
      .distinct(), iter)
  }

  /** Diversity cap (the SemDeDup-style decision, Abbas et al. 2023): every
    * near-dup cluster is capped at `cap` members — best quality first, the
    * rest removed — while singletons (docs in no cluster) pass untouched;
    * the output is the corpus-level accounting a pipeline reports after
    * the cut. Unlike [[dedupKeepBest]] (which picks ONE winner per cluster
    * for the dedup decision), the cap keeps bounded intra-cluster
    * redundancy — the knob used when some duplication is signal (popular
    * content) but unbounded duplication is noise. Same scale shape: the
    * ranking window runs over cluster assignments (clusters ≪ corpus),
    * totals are O(1)-row aggregates. */
  def clusterCap(s: SparkSession, dir: String, cap: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val labels = dedupClusters(s, dir)
    val quality = TextAnalysis.qualityScore(s, dir)
      .select($"doc_id", $"quality_score")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"quality_score".desc, $"doc_id".desc)
    val ranked = labels.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
    val totals = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val cl = ranked.agg(count(lit(1)).cast("long").as("n_clustered"),
      sum(when($"rn" > cap, 1L).otherwise(0L)).as("n_removed"))
    totals.crossJoin(cl) // two broadcast singletons
      .select($"n_docs".cast("long").as("n_docs"), $"n_clustered", $"n_removed",
        ($"n_docs" - $"n_removed").cast("long").as("n_kept"))
  }

  private val clusterCapSql = {
    val base = dedupKeepBestSql.stripSuffix(
      "SELECT cluster_id, doc_id AS keep_doc, n_members, quality_score\nFROM j WHERE rn = 1")
    require(base != dedupKeepBestSql, "keep-best SQL tail changed; fix the reuse")
    s"""${base.trim}
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_clustered,
       |       CAST(sum(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST((SELECT count(*) FROM documents)
       |            - sum(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM j""".stripMargin
  }

  /** Quality-CURRICULUM export: the corpus ordered for curriculum training
    * — highest-quality quartile first, deterministically shuffled WITHIN
    * each quality band (hash order, so the "shuffle" is reproducible and
    * restatable), emitting the head of the training order. Banding uses
    * broadcast QUARTILE BOUNDARIES (one exact-percentile aggregate → a
    * 1-row broadcast → a row-local CASE), not a global rank window — the
    * single-partition-window trap this table's size would spring at 100 TB;
    * the head selection is `TakeOrderedAndProject`, a distributed bounded
    * reduction, and only the ≤`take` surviving rows ever see a window (the
    * rank numbering). The shuffle key is the repo's md5-derived 32-bit
    * hash, restated verbatim in DuckDB. */
  def curriculumOrder(s: SparkSession, dir: String, take: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val q = TextAnalysis.qualityScore(s, dir).select($"doc_id", $"quality_score")
    val cuts = q.agg(
      expr("percentile(quality_score, array(0.25d, 0.5d, 0.75d))").as("c"))
    val banded = q.crossJoin(broadcast(cuts)) // 1-row boundaries singleton
      .withColumn("band",
        when($"quality_score" <= element_at($"c", 1), 0)
          .when($"quality_score" <= element_at($"c", 2), 1)
          .when($"quality_score" <= element_at($"c", 3), 2)
          .otherwise(3))
      .withColumn("shuffle_key",
        conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10).cast("long"))
    val head = banded
      .orderBy($"band".desc, $"shuffle_key", $"doc_id")
      .select($"doc_id", $"band", $"quality_score", $"shuffle_key")
      .limit(take)
    val w = Window.orderBy($"band".desc, $"shuffle_key", $"doc_id")
    head.withColumn("rank", row_number().over(w)) // ≤take rows only
      .select($"rank", $"doc_id", $"band",
        round($"quality_score", 6).as("quality_score"))
  }

  private val curriculumSql =
    """WITH q AS (
      |  SELECT doc_id,
      |    (1.0 - CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(toks))
      |          * least(CAST(len(toks) AS DOUBLE), 200.0) / 200.0 AS quality_score
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)),
      |cuts AS (SELECT quantile_cont(quality_score, 0.25) AS c1,
      |                quantile_cont(quality_score, 0.5)  AS c2,
      |                quantile_cont(quality_score, 0.75) AS c3 FROM q),
      |b AS (
      |  SELECT doc_id, quality_score,
      |         CASE WHEN quality_score <= c1 THEN 0
      |              WHEN quality_score <= c2 THEN 1
      |              WHEN quality_score <= c3 THEN 2 ELSE 3 END AS band,
      |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS shuffle_key
      |  FROM q, cuts)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY band DESC, shuffle_key, doc_id) AS INT) AS rank,
      |       doc_id, band, round(quality_score, 6) AS quality_score
      |FROM b ORDER BY band DESC, shuffle_key, doc_id LIMIT 20""".stripMargin

  /** The END of the curation pipeline: the corpus that actually ships to
    * training — benchmark docs excluded, contaminated docs anti-joined away,
    * only quality-rule survivors kept — summarized per language. The anti/
    * semi joins carry only doc_id sets (never text); every shuffle is keyed
    * on doc_id. */
  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // lazy twin of decontaminate(): the anti join needs only the doc_id set,
    // so skip the eager checkpoint (which would run the full decontamination
    // job at plan-construction time). The persist guards the shingle
    // projection from InferFiltersFromGenerate re-evaluation; it
    // materializes once inside the single final action.
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id",
        transform(shingles($"text", 3), x => xxhash64(x)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = docs.filter($"doc_id" % 97 === 0)
      .select(explode($"sh").as("h")).distinct()
    val contaminated = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode($"sh").as("h"))
      .join(broadcast(bench), "h")
      .select($"doc_id").distinct()
    // persist BELOW the keep-filter = optimizer barrier: with the filter in
    // the same plan as the rules projection, predicate pushdown substitutes
    // the flag aliases and re-inlines the tokenizer into every rule (tokens
    // recomputed ~6× per row — measured ~6.7 s for the composition vs
    // ~0.5 s for the rules alone). Cached: the tiny (doc_id, flags) table;
    // the filter then runs against cached rows.
    val keepers = TextAnalysis.qualityRules(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .filter($"keep").select($"doc_id")
    Tables.documents(s, dir)
      .filter($"doc_id" % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(keepers, Seq("doc_id"), "left_semi")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"))
  }

  private def cleanCorpusSql(rulesSql: String): String =
    s"""SELECT lang, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents d
       |WHERE d.doc_id % 97 <> 0
       |  AND d.doc_id NOT IN (SELECT doc_id FROM ($decontaminateSql))
       |  AND d.doc_id IN (SELECT doc_id FROM ($rulesSql) WHERE keep)
       |GROUP BY lang""".stripMargin

  /** Dataset profiling: per-column null count + exact distinct count over
    * `orders`, in ONE aggregate pass (a single expand + hash-agg; the
    * approx_count_distinct variant for 100 TB is `q_approx_distinct`). The
    * wide one-row result is unpivoted to long form with an inline explode —
    * no second scan. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val cols = o.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1).otherwise(0)).cast("bigint").as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val row = o.agg(count(lit(1)).as("n_rows"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"nn_$c").as("n_nulls"),
      col(s"nd_$c").as("n_distinct"),
      col("n_rows").as("n_rows"))): _*)).as("p"))
      .select("p.*")
  }

  private val profileSql = {
    val o = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    o.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  count(*) AS n_rows
         |FROM orders""".stripMargin).mkString("\nUNION ALL\n")
  }

  /** ORC sink → scan round-trip (Spark's built-in columnar alternative to
    * parquet): filtered orders out to ORC, read back, aggregate. Exercises
    * predicate/schema preservation through the format; the aggregate result
    * must equal computing directly on the source (which is what the oracle
    * does). Money sums in DECIMAL, final output cast to DOUBLE (driver-hash
    * parity — see BASELINE.md). */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_orc_roundtrip_" +
      java.lang.ProcessHandle.current().pid()
    Tables.orders(s, dir).filter($"o_totalprice" > 1000.0)
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast(DecimalType(18, 2))).cast("double").as("sum_price"))
  }

  private val orcRoundtripSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_totalprice > 1000.0 GROUP BY o_orderstatus""".stripMargin

  /** Bloom-prefiltered decontamination — identical output to
    * `decontaminate`, different (better) scale shape: the benchmark shingle
    * set is folded into a fixed-size bit sketch by the distributed
    * `bloom_build` aggregate (map-side partials OR-merged; no driver
    * collect), broadcast as one row, and probed by the codegen'd
    * `bloom_contains` BEFORE the exact join. At 100 TB the broadcast of the
    * raw benchmark set is the first thing to die — the sketch stays
    * kilobytes no matter how many eval benchmarks pile up, and the exact
    * verify join only sees sketch survivors (false positives get dropped
    * there, so the oracle is the same SQL as `q_decontaminate`). */
  def bloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.BloomOps.register(s)
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id",
        transform(shingles($"text", 3), x => xxhash64(x)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = docs.filter($"doc_id" % 97 === 0)
      .select(explode($"sh").as("h")).distinct()
    val sketch = bench.agg(
      graft.functions.BloomOps.bloomBuild($"h", 1 << 18, 5).as("bloom"))
    val out = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode($"sh").as("h"))
      .join(broadcast(sketch)) // 1-row sketch, cross-broadcast
      .filter(graft.functions.BloomOps.bloomContains($"bloom", $"h"))
      .select($"doc_id", $"h")
      .join(broadcast(bench), "h") // exact verify on sketch survivors
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .localCheckpoint(true)
    docs.unpersist(false)
    out
  }

  /** Sequence packing — the GPT-style training-data step that concatenates
    * the token stream in doc_id order and chunks it into fixed windows
    * (here 512 tokens), reporting how many documents and tokens land in
    * each window. The global running token offset is computed as a
    * DISTRIBUTED two-phase prefix sum: within-block cumsum (window
    * partitioned by a dense doc_id block — bounded partitions), plus block
    * offsets from a window over the tiny per-block totals table. A naive
    * `sum() OVER (ORDER BY doc_id)` would pull the whole corpus through
    * one partition; this shape scales, and the DuckDB oracle's global
    * cumsum computes the same math. Docs spanning a boundary are split
    * across windows (the overlap arithmetic), exactly like training
    * pipelines that pack without padding. */
  def packWindows(s: SparkSession, dir: String, window: Int = 512,
      block: Long = 100L): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documentsSpread(s, dir)
      .select($"doc_id", size(toks($"text")).cast("long").as("n_tok"))
      .filter($"n_tok" > 0)
      .withColumn("blk", expr(s"doc_id div $block"))
    val withinW = Window.partitionBy($"blk").orderBy($"doc_id")
    val within = d.withColumn("within_cum", sum($"n_tok").over(withinW))
    // block total = max of the within-block cumsum: derives the tiny table
    // from the `within` branch instead of re-running the scan+tokenize
    val blockTotals = within.groupBy($"blk")
      .agg(max($"within_cum").as("bs"))
    // tiny table (one row per block): a global window here is bounded
    val offW = Window.orderBy($"blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockTotals
      .withColumn("off", coalesce(sum($"bs").over(offW), lit(0L)))
      .select($"blk", $"off")
    within.join(offsets, "blk")
      .withColumn("cum_end", $"off" + $"within_cum")
      .withColumn("start", $"cum_end" - $"n_tok")
      .select($"start", $"cum_end",
        explode(sequence(expr(s"start div $window"),
          expr(s"(cum_end - 1) div $window"))).as("window_id"))
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least($"cum_end", ($"window_id" + 1) * window) -
          greatest($"start", $"window_id" * window)).as("n_tokens"))
  }

  private val packWindowsSql =
    """WITH d AS (
      |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (SELECT doc_id, n_tok,
      |             sum(n_tok) OVER (ORDER BY doc_id) AS cum_end
      |      FROM d WHERE n_tok > 0),
      |e AS (SELECT doc_id, cum_end - n_tok AS start, cum_end,
      |             unnest(range(CAST((cum_end - n_tok) // 512 AS BIGINT),
      |                          CAST((cum_end - 1) // 512 + 1 AS BIGINT))) AS w
      |      FROM c)
      |SELECT CAST(w AS BIGINT) AS window_id, count(*) AS n_docs,
      |       CAST(sum(least(cum_end, (w + 1) * 512)
      |                - greatest(start, w * 512)) AS BIGINT) AS n_tokens
      |FROM e GROUP BY 1""".stripMargin

  /** Data mixing to a per-source token budget: the mixture-weighting step of
    * corpus assembly (choose how much of each source to keep, expressed as a
    * token budget per source, not a sampling rate). Selection is the greedy
    * deterministic prefix: order each source's docs by md5(doc_id), take docs
    * while the running token total BEFORE the doc is under the source's
    * budget (so the doc crossing the boundary is included). Hash ordering
    * makes the selected set a pure function of the rows — stable across
    * re-shards, retries, and engines, and monotone under corpus growth in
    * the same sense as the hash train/test split.
    *
    * Scale posture: the naive form is a per-source window cumsum — one
    * partition per source, and a single giant source serializes. Instead,
    * a two-phase prefix sum (the `packWindows` idiom): docs hash into 16
    * buckets by their first hex char; per-(source,bucket) token totals make
    * a tiny (sources×16) table whose cumsum runs in one bounded window;
    * buckets that fit entirely under the budget are taken whole with NO
    * window at all, the single boundary bucket per source gets an exact
    * within-bucket cumsum (1/16 of a source, and the fan-out constant is
    * tunable), and later buckets are dropped before any sort. The DuckDB
    * oracle states the plain global-cumsum semantics. */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame =
    tokenBudgetMixOn(s, Tables.documents(s, dir))

  /** Core of the mix on any (doc_id, source, text) frame — separated so the
    * randomized property test can drive it over synthetic corpora (empty
    * sources, budgets past the total, single-doc boundary buckets). */
  def tokenBudgetMixOn(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // budget = 300 + 25 * source index ("src7" -> 475): distinct per-source
    // budgets keep the mixing visible in the output
    val budget = lit(300L) + substring($"source", 4, 9).cast("long") * 25L
    val d = docsDf
      .select($"doc_id", $"source",
        md5($"doc_id".cast("string")).as("h"),
        size(toks($"text")).cast("long").as("tokens"))
      .filter($"tokens" > 0)
      .withColumn("bkt", conv(substring($"h", 1, 1), 16, 10).cast("int"))
    // tiny table: sources × 16 rows — the only cross-bucket state
    val bucketW = Window.partitionBy($"source").orderBy($"bkt")
    val cum = d.groupBy($"source", $"bkt")
      .agg(sum($"tokens").as("btok"))
      .withColumn("cum_before", coalesce(
        sum($"btok").over(bucketW.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val joined = d.join(broadcast(cum), Seq("source", "bkt"))
    // fully-selected buckets: every doc's running-before is < budget
    // (tokens >= 1, so cum_before + btok <= budget bounds it strictly)
    val full = joined.filter($"cum_before" + $"btok" <= budget)
    // the one partial bucket per source: exact cumsum within (source, bkt)
    val withinW = Window.partitionBy($"source", $"bkt")
      .orderBy($"h", $"doc_id")
    val boundary = joined
      .filter($"cum_before" < budget && $"cum_before" + $"btok" > budget)
      .withColumn("before",
        $"cum_before" + sum($"tokens").over(withinW) - $"tokens")
      .filter($"before" < budget)
    full.select($"source", $"tokens")
      .union(boundary.select($"source", $"tokens"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"tokens").as("sum_tokens"))
  }

  private val tokenBudgetMixSql =
    """WITH d AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
      |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens
      |  FROM documents),
      |c AS (SELECT source, tokens,
      |             sum(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS before
      |      FROM d WHERE tokens > 0)
      |SELECT source, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS sum_tokens
      |FROM c
      |WHERE before < 300 + 25 * CAST(substr(source, 4) AS BIGINT)
      |GROUP BY source""".stripMargin

  /** Fractional n-gram contamination scoring — the soft generalization of
    * `decontaminate`: instead of flagging docs sharing ANY benchmark shingle,
    * score each doc by the FRACTION of its distinct 3-gram shingles found in
    * the benchmark set (the GPT-3 appendix-C / Pile contamination metric;
    * thresholds like "drop if >20% overlap" come from this number, and the
    * decile distribution is the report a curation run actually produces).
    * Unlike `decontaminate`'s inner join, zero-overlap docs are kept (decile
    * 0) via a left join back to the per-doc totals. The decile is integer
    * arithmetic — `(10 * n_shared) div n_total` — so both engines bucket
    * identically with no float rounding at bucket edges.
    *
    * Scale posture: identical to `decontaminate` — benchmark shingles are
    * genuinely small (eval suites), so broadcast; the corpus side shuffles
    * only (doc_id, count) pairs; the persisted projection holds 64-bit
    * hashes, never text. The left join adds one shuffle of (doc_id, n_total)
    * pairs — 16 bytes a row regardless of document size. */
  def contamFraction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id",
        transform(shingles($"text", 3), x => xxhash64(x)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench = docs.filter($"doc_id" % 97 === 0)
      .select(explode($"sh").as("h")).distinct()
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val shared = corpus.select($"doc_id", explode($"sh").as("h"))
      .join(broadcast(bench), "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"))
    val out = corpus.select($"doc_id", size($"sh").cast("long").as("n_total"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce($"n_shared", lit(0L)))
      .groupBy(expr("(10 * n_shared) div n_total").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_shared").as("sum_shared"),
        sum($"n_total").as("sum_total"))
      .localCheckpoint(true)
    docs.unpersist(false)
    out
  }

  private val contamFractionSql =
    """WITH s AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
      |  WHERE len(t) >= 3),
      |b AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0),
      |e AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 97 <> 0),
      |m AS (SELECT e.doc_id, count(*) AS n_shared FROM e JOIN b USING (g) GROUP BY 1),
      |f AS (SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_total,
      |             CAST(COALESCE(m.n_shared, 0) AS BIGINT) AS n_shared
      |      FROM s LEFT JOIN m USING (doc_id) WHERE s.doc_id % 97 <> 0)
      |SELECT (10 * n_shared) // n_total AS decile, count(*) AS n_docs,
      |       CAST(sum(n_shared) AS BIGINT) AS sum_shared,
      |       CAST(sum(n_total) AS BIGINT) AS sum_total
      |FROM f GROUP BY 1""".stripMargin

  /** Vocabulary build + out-of-vocabulary rate: fit a top-N token vocabulary
    * on the train split (the hash split of `trainTestSplit`), then measure
    * what fraction of TEST tokens falls outside it, per language — the
    * tokenizer-coverage number that decides whether a vocab ships. Ties at
    * the vocab boundary break deterministically on (count desc, token asc),
    * so both engines fit the identical vocabulary.
    *
    * Scale posture: the vocab fit is one token-count aggregate + a bounded
    * top-N (`TakeOrderedAndProject` — O(N) per partition, no global sort);
    * the N-row vocabulary broadcasts to the test-side scan, so the OOV
    * probe is map-side and the only shuffle after the counts is the
    * per-language aggregate. */
  def vocabOov(s: SparkSession, dir: String, vocabSize: Int = 500): DataFrame = {
    import s.implicits._
    val docs = Tables.documentsSpread(s, dir)
      .select($"lang",
        when(substring(md5($"doc_id".cast("string")), 1, 2) < "cd", "train")
          .otherwise("test").as("split"),
        explode(toks($"text")).as("tok"))
    val vocab = docs.filter($"split" === "train")
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(vocabSize)
      .select($"tok", lit(1).as("in_v"))
    docs.filter($"split" === "test")
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_tokens"),
        count(when($"in_v".isNull, 1)).as("n_oov"))
      .select($"lang", $"n_tokens", $"n_oov",
        round($"n_oov".cast("double") / $"n_tokens".cast("double"), 6).as("oov_rate"))
  }

  private val vocabOovSql =
    """WITH t AS (
      |  SELECT lang,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
      |              THEN 'train' ELSE 'test' END AS split,
      |         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |v AS (SELECT tok FROM t WHERE split = 'train' GROUP BY tok
      |      ORDER BY count(*) DESC, tok LIMIT 500)
      |SELECT lang, count(*) AS n_tokens,
      |       count(*) FILTER (tok NOT IN (SELECT tok FROM v)) AS n_oov,
      |       round(count(*) FILTER (tok NOT IN (SELECT tok FROM v))
      |             / CAST(count(*) AS DOUBLE), 6) AS oov_rate
      |FROM t WHERE split = 'test' GROUP BY lang""".stripMargin

  /** Source-level filtering (the C4/RefinedWeb "drop the bad domain" stage):
    * per `source`, document count and mean quality score — the same per-doc
    * score as `q_text_quality`, averaged — plus a keep/drop verdict under a
    * fixed floor. One scan + one |sources|-sized aggregate: at 100 TB the
    * decision table stays tiny and broadcasts back onto the corpus for the
    * actual drop, so source filtering costs one shuffle of (source, partial
    * sums), never a second corpus pass. The mean is rounded to 6 dp AFTER
    * the aggregate (same convention as `q_embed_centroids`) so per-engine
    * float summation order cannot flip the hash. */
  def sourceFilter(s: SparkSession, dir: String,
      minMeanQuality: Double = 0.25, minDocs: Long = 5L): DataFrame = {
    import s.implicits._
    val toks = split(trim($"text"), "\\s+")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(TextAnalysis.StopWords: _*))).cast("double")
    val q = (lit(1.0) - nStop / nTok) * least(nTok, lit(200.0)) / 200.0
    Tables.documents(s, dir)
      .select($"source", q.as("q"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), round(avg($"q"), 6).as("mean_quality"))
      .withColumn("verdict",
        when($"n_docs" >= minDocs && $"mean_quality" >= minMeanQuality, "keep")
          .otherwise("drop"))
  }

  private val sourceFilterSql = {
    val stop = TextAnalysis.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT source,
       |         (1.0 - len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                                t -> t IN ($stop)))
       |                / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE))
       |         * least(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE),
       |                 200.0) / 200.0 AS q
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, round(avg(q), 6) AS mean_quality,
       |       CASE WHEN count(*) >= 5 AND round(avg(q), 6) >= 0.25
       |            THEN 'keep' ELSE 'drop' END AS verdict
       |FROM d GROUP BY source""".stripMargin
  }

  /** Length-bucketed batching prep (fairseq/T5-style): each document goes to
    * the smallest power-of-two token-length bucket that holds it (capped),
    * and the per-bucket padding waste — the tokens a padded batch would
    * carry beyond the real ones — is summed exactly. All integer
    * arithmetic, one scan + one ≤|buckets| aggregate; the bucket table is
    * what a batch scheduler consumes. */
  def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nTok = size(split(trim($"text"), "\\s+"))
    val bucket = when(nTok <= 16, 16).when(nTok <= 32, 32).when(nTok <= 64, 64)
      .when(nTok <= 128, 128).when(nTok <= 256, 256).otherwise(512)
    Tables.documents(s, dir)
      .select(nTok.as("n_tok"), bucket.as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok".cast("long")).as("n_tokens"),
        // docs beyond the top bucket get chunked upstream — clamp at 0 so an
        // over-long straggler can't report negative waste
        sum(greatest($"bucket".cast("long") - $"n_tok", lit(0L)))
          .as("padding_waste"))
  }

  private val lengthBucketsSql =
    """WITH d AS (
      |  SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      |  FROM documents),
      |b AS (
      |  SELECT n_tok,
      |         CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
      |              WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
      |              WHEN n_tok <= 256 THEN 256 ELSE 512 END AS bucket
      |  FROM d)
      |SELECT bucket, count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       CAST(sum(greatest(bucket - n_tok, 0)) AS BIGINT) AS padding_waste
      |FROM b GROUP BY bucket""".stripMargin

  /** Temperature-based mixture reweighting (the mT5 / Pile recipe): source
    * `i` is sampled proportionally to `n_tokens_i^alpha` — alpha < 1 flattens
    * the natural distribution, upsampling small high-value corpora without
    * letting any one giant source dominate the token budget. Emits, per
    * source, the normalized sampling weight, the token allocation out of
    * `budget`, and the implied epoch count over that source (alloc /
    * n_tokens — how many times the source repeats; > 1 means upsampling).
    *
    * Scale: the corpus-sized work is ONE per-source token-count aggregate;
    * everything after runs on the per-source table, which is bounded (a
    * mixture has tens of corpora, not millions), so the single-partition
    * windows below hold O(|sources|) rows — the same bounded-singleton
    * discipline as the stats broadcasts. The `pow` sum is accumulated as a
    * running window ORDER BY source on BOTH engines: float addition is
    * order-sensitive, and a nondeterministic aggregate order could flip the
    * last ulp under a rounding boundary. */
  def temperatureMix(s: SparkSession, dir: String, alpha: Double = 0.7,
      budget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val run = Window.orderBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documentsSpread(s, dir)
      .select($"source", size(toks($"text")).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .withColumn("pw", pow($"n_tokens".cast("double"), alpha))
      .withColumn("runsum", sum($"pw").over(run))
      .withColumn("tot", max($"runsum").over(all))
      .select($"source", $"n_docs", $"n_tokens",
        round($"pw" / $"tot", 6).as("weight"),
        round($"pw" / $"tot" * budget, 3).as("alloc_tokens"),
        round($"pw" / $"tot" * budget / $"n_tokens", 6).as("epochs"))
  }

  private val temperatureMixSql =
    """WITH d AS (
      |  SELECT source, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      |  FROM documents),
      |per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |  FROM d GROUP BY 1),
      |p2 AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.7) AS pw FROM per),
      |p3 AS (SELECT *, sum(pw) OVER (ORDER BY source
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runsum
      |       FROM p2),
      |p4 AS (SELECT *, max(runsum) OVER () AS tot FROM p3)
      |SELECT source, n_docs, n_tokens,
      |       round(pw / tot, 6) AS weight,
      |       round(pw / tot * 1000000, 3) AS alloc_tokens,
      |       round(pw / tot * 1000000 / n_tokens, 6) AS epochs
      |FROM p4""".stripMargin

  /** Cross-source quality-score calibration: raw quality scores are not
    * comparable across sources (different models, different length
    * distributions), so production filters normalize each document's score
    * to its PERCENTILE WITHIN ITS SOURCE and threshold on that — "drop the
    * bottom 25% of every source" instead of one global cut that empties
    * one source and passes all of another. Raw score here is the exact
    * integer (n_tokens − n_stopwords); the percentile is
    * `percent_rank()` over (source, (score, doc_id)) — distinct ordering
    * keys make it the exact rational (rank−1)/(n−1), bit-identical across
    * engines with no rounding step. One shuffle keyed on source; the
    * per-source sort is the standard partition-keyed window shape. */
  def scoreCalibrate(s: SparkSession, dir: String, cut: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val t = toks(lower($"text"))
    val raw = (size(t) -
      size(filter(t, x => x.isin(TextAnalysis.StopWords: _*)))).cast("long")
    val w = Window.partitionBy($"source").orderBy($"raw_score", $"doc_id")
    Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", raw.as("raw_score"))
      .withColumn("pct", percent_rank().over(w))
      .withColumn("keep", $"pct" >= cut)
  }

  private val scoreCalibrateSql =
    """WITH t AS (
      |  SELECT doc_id, source,
      |         regexp_split_to_array(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, source,
      |         CAST(len(tk) - len(list_filter(tk, x -> x IN
      |           ('the','a','of','and','to','in','is','on','for','with')))
      |           AS BIGINT) AS raw_score
      |  FROM t)
      |SELECT doc_id, source, raw_score,
      |       percent_rank() OVER (PARTITION BY source
      |                            ORDER BY raw_score, doc_id) AS pct,
      |       percent_rank() OVER (PARTITION BY source
      |                            ORDER BY raw_score, doc_id) >= 0.25 AS keep
      |FROM sc""".stripMargin

  /** End-to-end ingest report for the newest batch: compose the round-6
    * stages the way the pipeline runs them — source-level filtering first
    * (cheapest, a broadcast of the tiny per-source decision table), then
    * per-doc dedup verdicts — and account tokens per final disposition.
    * The report is the |dispositions|-row summary an ingest job emits; each
    * stage keeps its own scale shape (nothing here adds a corpus-sized
    * shuffle beyond what the composed stages already do). */
  def ingestReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mx = Tables.documents(s, dir)
      .agg(expr("((max(doc_id) + 1) * 4) div 5").as("cut"))
    val batch = Tables.documents(s, dir).join(broadcast(mx))
      .filter($"doc_id" >= $"cut")
      .select($"doc_id", $"source",
        size(split(trim($"text"), "\\s+")).as("n_tok"))
    val srcVerdicts = sourceFilter(s, dir)
      .select($"source", $"verdict".as("src_verdict"))
    val dupVerdicts = DedupOps.incrementalDedup(s, dir)
      .select($"doc_id", $"verdict".as("dup_verdict"))
    batch
      .join(broadcast(srcVerdicts), "source")
      .join(dupVerdicts, "doc_id")
      .select($"n_tok",
        when($"src_verdict" === "drop", "drop_source")
          .when($"dup_verdict" === "exact_dup", "drop_exact")
          .when($"dup_verdict" === "near_dup", "drop_near")
          .otherwise("accept").as("final_status"))
      .groupBy($"final_status")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok".cast("long")).as("n_tokens"))
  }

  private def ingestReportSql(srcSql: String, dupSql: String): String =
    s"""SELECT final_status, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT CASE WHEN sf.verdict = 'drop' THEN 'drop_source'
       |              WHEN dd.verdict = 'exact_dup' THEN 'drop_exact'
       |              WHEN dd.verdict = 'near_dup' THEN 'drop_near'
       |              ELSE 'accept' END AS final_status,
       |         len(regexp_split_to_array(trim(n.text), '\\s+')) AS n_tok
       |  FROM (SELECT d.* FROM documents d,
       |          (SELECT ((max(doc_id) + 1) * 4) // 5 AS cut FROM documents) m
       |        WHERE d.doc_id >= m.cut) n
       |  JOIN ($srcSql) sf ON sf.source = n.source
       |  JOIN ($dupSql) dd ON dd.doc_id = n.doc_id)
       |GROUP BY 1""".stripMargin

  /** Streaming twin of [[ingestReport]]: the new batch arrives as a document
    * STREAM and the expensive stage — the per-doc near-dup candidate count
    * against the corpus — runs incrementally as a stateless stream-static
    * equi-join on (lang, corpus-block) with a row-local Jaccard verify and
    * ONE stateful per-doc count (complete mode; chaining the status rollup
    * into the same stream would be a second stateful aggregate, which
    * micro-batch complete mode cannot stack). The drained per-doc counts
    * then compose batch-side with the cheap stages (md5 exact join, the
    * broadcast source-verdict table) into the same report. Same oracle as
    * the batch op: streaming must not change the answer.
    *
    * Static sides are persisted — the static side of a stream-static join
    * re-evaluates per micro-batch — and carry only (lang, block, hashes),
    * never text. The G-way block explode replicates only the streamed
    * batch, reproducing the batch operator's shuffle shape. */
  def streamIngestReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.ArrayOps.register(s)
    val G = 8
    val threshold = 0.3
    val docSchema = Tables.documents(s, dir).schema
    // batch boundary: O(1) row to the driver (same bounded pattern as the
    // label-propagation convergence checks)
    val cut = Tables.documents(s, dir)
      .agg(expr("((max(doc_id) + 1) * 4) div 5")).as[Long].head()
    def hsh(c: Column): Column =
      array_sort(array_distinct(transform(shingles(c, 3), x => xxhash64(x))))
    val corpus = Tables.documents(s, dir).filter($"doc_id" < cut)
    // spread the corpus shingle/hash/sort work across the session's
    // shuffle width BEFORE it is computed and persisted — the fixture is a
    // single parquet split, so uncached-spread the whole corpus-side
    // pipeline ran in ONE task (guide §2.5 input skew; same recipe as
    // Tables.documentsSpread)
    val sp = s.sessionState.conf.numShufflePartitions
    val corpusSh = corpus.filter(size(toks($"text")) >= 3)
      .repartition(sp)
      .select($"lang", hsh($"text").as("sh_b"),
        pmod(xxhash64($"doc_id"), lit(G)).as("gb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val stream = s.readStream.schema(docSchema)
      .parquet(s"$dir/[d]ocuments.parquet")
      .filter($"doc_id" >= cut && size(toks($"text")) >= 3)
      .repartition(sp) // single-split fixture: spread the shingle work
                       // across the session's width (was a fixed 8)
      .select($"doc_id", $"lang", hsh($"text").as("sh_a"))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
      .join(corpusSh, Seq("lang", "gb"))
      .filter(least(size($"sh_a"), size($"sh_b")).cast("double")
        >= lit(threshold) * greatest(size($"sh_a"), size($"sh_b")))
      .filter({
        val inter = graft.functions.ArrayOps
          .sortedIntersectCount($"sh_a", $"sh_b").cast("double")
        inter / (size($"sh_a") + size($"sh_b") - inter) > threshold
      })
      .groupBy($"doc_id").agg(count(lit(1)).as("n_near"))
    val nearCounts = graft.streaming.StreamingOps
      .runToParquet(s, stream, "graft_ingest")
      .select($"doc_id", $"n_near")
    corpusSh.unpersist(false)

    // cheap stages compose batch-side around the drained counts
    val batch = Tables.documents(s, dir).filter($"doc_id" >= cut)
      .select($"doc_id", $"source", md5($"text").as("h"),
        size(split(trim($"text"), "\\s+")).as("n_tok"))
    val exact = batch.select($"doc_id", $"h")
      .join(corpus.select(md5($"text").as("h")), Seq("h"))
      .select($"doc_id").distinct().withColumn("is_exact", lit(true))
    val srcVerdicts = sourceFilter(s, dir)
      .select($"source", $"verdict".as("src_verdict"))
    batch
      .join(broadcast(srcVerdicts), "source")
      .join(exact, Seq("doc_id"), "left")
      .join(nearCounts, Seq("doc_id"), "left")
      .select($"n_tok",
        when($"src_verdict" === "drop", "drop_source")
          .when(coalesce($"is_exact", lit(false)), "drop_exact")
          .when(coalesce($"n_near", lit(0L)) > 0, "drop_near")
          .otherwise("accept").as("final_status"))
      .groupBy($"final_status")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok".cast("long")).as("n_tokens"))
  }

  /** Duplicated-n-gram fraction: per document, the share of its distinct
    * 3-token shingles that are corpus-common (appearing in ≥ `minDf` docs,
    * self included) — the inter-document memorization signal
    * quality-filtering pipelines use beside intra-doc repetition
    * (`q_repetition`). The inverted-index shape: explode to (hash, doc)
    * pairs, one hash-partitioned doc-frequency aggregate (map-side partials
    * apply — shingles are distinct per doc by construction), an equi-join
    * back on the hash, and a per-doc count aggregate. Nothing broadcasts;
    * both shuffles key on the shingle hash, which Zipf skews mildly but
    * bounded (a shingle's row count = its doc frequency). The fraction is a
    * division of exact small integers — bit-identical across engines. */
  def dupNgramFraction(s: SparkSession, dir: String, minDf: Int = 5): DataFrame = {
    import s.implicits._
    val d = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id",
        explode(transform(shingles($"text", 3), x => xxhash64(x))).as("h"))
    val freq = d.groupBy($"h").agg(count(lit(1)).as("df"))
    d.join(freq, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"df" >= minDf, 1L).otherwise(0L)).as("n_dup"))
      .select($"doc_id", $"n_shingles", $"n_dup",
        ($"n_dup".cast("double") / $"n_shingles").as("dup_frac"))
  }

  private val dupNgramFractionSql =
    """WITH d AS (
      |  SELECT doc_id, unnest(
      |    list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])) AS g
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
      |  WHERE len(t) >= 3),
      |f AS (SELECT g, count(*) AS df FROM d GROUP BY g)
      |SELECT doc_id, count(*) AS n_shingles,
      |       CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |       CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
      |         / CAST(count(*) AS DOUBLE) AS dup_frac
      |FROM d JOIN f USING (g) GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_filter" -> ((s, d) => sourceFilter(s, d)),
    "q_length_buckets" -> ((s, d) => lengthBuckets(s, d)),
    "q_temperature_mix" -> ((s, d) => temperatureMix(s, d)),
    "q_score_calibrate" -> ((s, d) => scoreCalibrate(s, d)),
    "q_ingest_report" -> ((s, d) => ingestReport(s, d)),
    "q_stream_ingest_report" -> ((s, d) => streamIngestReport(s, d)),
    "q_dup_ngram_frac" -> ((s, d) => dupNgramFraction(s, d)),
    "q_pack_windows" -> ((s, d) => packWindows(s, d)),
    "q_split_traintest" -> ((s, d) => trainTestSplit(s, d)),
    "q_dsir_select" -> ((s, d) => dsirSelect(s, d)),
    "q_dsir_sample" -> ((s, d) => dsirSample(s, d)),
    "q_decontaminate" -> ((s, d) => decontaminate(s, d)),
    "q_bloom_decontaminate" -> ((s, d) => bloomDecontaminate(s, d)),
    "q_stream_decontaminate" -> ((s, d) => streamingDecontaminate(s, d)),
    "q_bm25_search" -> ((s, d) => bm25Search(s, d)),
    "q_bm25_index" -> ((s, d) => bm25IndexSearch(s, d)),
    "q_dedup_clusters" -> ((s, d) => dedupClusters(s, d)),
    "q_dedup_clusters_star" -> ((s, d) => dedupClustersStar(s, d)),
    "q_dedup_clusters_lsh" -> ((s, d) => dedupClustersLsh(s, d)),
    "q_dedup_keep_best" -> ((s, d) => dedupKeepBest(s, d)),
    "q_cluster_cap" -> ((s, d) => clusterCap(s, d)),
    "q_curriculum" -> ((s, d) => curriculumOrder(s, d)),
    "q_clean_corpus" -> ((s, d) => cleanCorpus(s, d)),
    "q_profile" -> ((s, d) => profile(s, d)),
    "q_orc_roundtrip" -> ((s, d) => orcRoundtrip(s, d)),
    "q_token_budget_mix" -> ((s, d) => tokenBudgetMix(s, d)),
    "q_contam_fraction" -> ((s, d) => contamFraction(s, d)),
    "q_vocab_oov" -> ((s, d) => vocabOov(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_source_filter" -> sourceFilterSql,
    "q_length_buckets" -> lengthBucketsSql,
    "q_temperature_mix" -> temperatureMixSql,
    "q_score_calibrate" -> scoreCalibrateSql,
    "q_ingest_report" -> ingestReportSql(sourceFilterSql, DedupOps.incrementalDedupSql),
    // same SQL: running the near-dup stage as a stream must not change the report
    "q_stream_ingest_report" -> ingestReportSql(sourceFilterSql, DedupOps.incrementalDedupSql),
    "q_dup_ngram_frac" -> dupNgramFractionSql,
    "q_split_traintest" -> trainTestSplitSql,
    "q_dsir_select" -> dsirSelectSql,
    "q_dsir_sample" -> dsirSampleSql,
    "q_pack_windows" -> packWindowsSql,
    "q_decontaminate" -> decontaminateSql,
    // same SQL: the bloom prefilter must not change the answer
    "q_bloom_decontaminate" -> decontaminateSql,
    "q_stream_decontaminate" -> decontaminateSql,
    "q_bm25_search" -> bm25Sql,
    // the index path must return the scan path's ranking EXACTLY
    "q_bm25_index" -> bm25Sql,
    "q_dedup_clusters" -> dedupClustersSql,
    // one algorithm validates the other: same labeling, same oracle
    "q_dedup_clusters_star" -> dedupClustersSql,
    // connected components over the RESTATED LSH pair list — the scale
    // route's own oracle, independent of the exact all-pairs baseline
    "q_dedup_clusters_lsh" -> dedupClustersLshSql,
    "q_dedup_keep_best" -> dedupKeepBestSql,
    "q_cluster_cap" -> clusterCapSql,
    "q_curriculum" -> curriculumSql,
    "q_clean_corpus" -> cleanCorpusSql(TextAnalysis.qualityRulesSql),
    "q_profile" -> profileSql,
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_token_budget_mix" -> tokenBudgetMixSql,
    "q_contam_fraction" -> contamFractionSql,
    "q_vocab_oov" -> vocabOovSql,
  )
}
