package graft.operators

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (driver mandate;
  * SURVEY.md §7 Phase 6): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale posture: every near-dup variant avoids the O(n²) all-pairs join —
  * MinHash banding and SimHash banding turn it into equi-joins on band keys
  * (shuffle-partitionable, skew-safe because band values are hashes); the
  * brute-force Jaccard variant exists as the oracle-checkable baseline and is
  * blocked by `lang` to bound the pair count.
  */
object DedupOps {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** 3-token shingle set per document (distinct, order-insensitive).
    * Guarded for short documents: with <3 tokens `sequence(0, size-3)`
    * descends (e.g. sequence(0,-1) = [0,-1]) and the slice throws — mirror
    * the oracle's `len(t) >= 3` predicate with an empty set instead. */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    when(size(t) >= 3,
      array_distinct(transform(
        sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", slice(t, i + 1, lit(3))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Sorted distinct 64-bit hashes of the shingle set. Pairwise work happens
    * on these, never on strings: hashing is done once per document, and the
    * per-pair intersection is the zero-allocation `sorted_intersect_count`
    * merge scan. Hash collisions (~|sh|²/2⁶⁴) are negligible, so Jaccard on
    * hashes equals Jaccard on the strings — which is what the oracle checks. */
  private def hashedShingles(c: Column): Column =
    array_sort(array_distinct(transform(shingles(c), x => xxhash64(x))))

  /** Sorted distinct 32-bit md5-derived hashes of the shingle set — the
    * oracle-expressible twin of `hashedShingles` (DuckDB reproduces each
    * element as `CAST('0x' || substr(md5(shingle),1,8) AS BIGINT)`).
    * Collisions ~|sh|²/2³² are shared by both sides, so comparisons stay
    * exact. */
  private def md5Shingles(c: Column): Column =
    array_sort(array_distinct(transform(shingles(c),
      x => conv(substring(md5(x), 1, 8), 16, 10).cast("long"))))

  /** |A∩B| / (|A|+|B|-|A∩B|) over sorted hashed shingle arrays. */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.ArrayOps.sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact dedup by content hash: one hash-groupBy, no joins. Groups on the
    * 128-bit md5 rather than the raw text so the shuffle carries 32 bytes +
    * doc_id per row instead of the whole document — at 100 TB that is the
    * difference between shuffling hashes and shuffling the corpus. (md5
    * collision would merge two distinct documents; ~n²/2¹²⁸ — negligible at
    * any feasible corpus size, and the oracle's GROUP BY text agrees
    * whenever no collision exists.) */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(md5($"text").as("text_hash"), $"doc_id")
      .groupBy($"text_hash")
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_id"))
  }

  /** Brute-force n-gram Jaccard near-dup, blocked by language: the
    * oracle-checkable baseline. At real scale the MinHash variant below
    * replaces it.
    *
    * Scale-safe all-pairs plan: a shuffled equi-join on (lang, block-pair)
    * instead of broadcasting an unbounded side. Each doc gets a deterministic
    * block g ∈ [0, G); blocks are paired TRIANGULARLY — side A replicates to
    * (g, gb) for gb ≥ g, side B to (ga, g) for ga ≤ g — so each unordered
    * block pair meets exactly once and the join emits each unordered doc pair
    * once (off-diagonal) or twice (diagonal, halved by the id filter).
    * Versus the naive G× full replication this halves both the shuffle and
    * the join output. No task holds more than (n_lang/G)² candidates and
    * nothing unbounded is broadcast (AQE may still broadcast at fixture
    * scale — the correct adaptive choice, not a plan property). */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    graft.functions.ArrayOps.register(s)
    val G = 8
    val docs = Tables.documentsSpread(s, dir)
      // cheap precondition (= the oracle's len(t)>=3): filtering on size(sh)
      // would evaluate the whole shingle pipeline a second time
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id", $"lang", hashedShingles($"text").as("sh"))
      .withColumn("g", pmod(xxhash64($"doc_id"), lit(G)))
    val a = docs.select($"lang", $"doc_id".as("doc_a"), $"sh".as("sh_a"), $"g".as("ga"))
      .withColumn("gb", explode(sequence($"ga", lit(G - 1))))
    val b = docs.select($"lang", $"doc_id".as("doc_b"), $"sh".as("sh_b"), $"g".as("gb"))
      .withColumn("ga", explode(sequence(lit(0), $"gb")))
    // SHUFFLE_HASH: spread the O(pairs) probe work across the
    // lang × G(G+1)/2 block keys. A broadcast join here (AQE's pick at
    // fixture scale, where the single-split probe side is one task) serializes
    // the whole pair scan; at 100 TB neither side is broadcastable anyway.
    a.join(b.hint("SHUFFLE_HASH"), Seq("lang", "ga", "gb"))
      // diagonal blocks see both orientations and self-pairs: keep one
      .filter($"ga" =!= $"gb" || $"doc_a" < $"doc_b")
      // size-ratio upper bound: jaccard <= min(|A|,|B|)/max(|A|,|B|) — prunes
      // hopeless pairs before the O(n) intersect; never removes a true pair
      .filter(least(size($"sh_a"), size($"sh_b")).cast("double")
        >= lit(threshold) * greatest(size($"sh_a"), size($"sh_b")))
      // the jaccard is an exact-integer ratio — bit-identical across engines,
      // so neither the filter nor the output rounds it (rounding would
      // introduce half-ulp tie mismatches). Jaccard is symmetric, so
      // off-diagonal pairs (arbitrary orientation) just canonicalize the id
      // order on output.
      .select($"lang",
        least($"doc_a", $"doc_b").as("doc_a"),
        greatest($"doc_a", $"doc_b").as("doc_b"),
        jaccard($"sh_a", $"sh_b").as("jacc"))
      .filter($"jacc" > threshold)
  }

  /** ASYMMETRIC containment detection — the doc-inside-doc case the
    * symmetric Jaccard misses: a short document quoted or embedded whole
    * inside a longer one scores low Jaccard (the union is large) but its
    * own shingles are ≥90% covered by the host. Emits directed pairs
    * (inner ⊂ outer, strict smaller-into-larger) with the exact coverage
    * ratio |inner∩outer| / |inner| — the curation signal for dropping
    * quoted duplicates while keeping the host. Same lang × G-grid blocked
    * SHUFFLE_HASH shape as [[ngramJaccard]] (no all-pairs join); both
    * directions of each unordered pair are evaluated from the ONE joined
    * row. The threshold compare is pure-integer (`inter·10 ≥ 9·|inner|`),
    * so no float boundary can flip membership across engines. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.ArrayOps.register(s)
    val G = 8
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id", $"lang", hashedShingles($"text").as("sh"))
      .withColumn("g", pmod(xxhash64($"doc_id"), lit(G)))
    val a = docs.select($"lang", $"doc_id".as("doc_a"), $"sh".as("sh_a"), $"g".as("ga"))
      .withColumn("gb", explode(sequence($"ga", lit(G - 1))))
    val b = docs.select($"lang", $"doc_id".as("doc_b"), $"sh".as("sh_b"), $"g".as("gb"))
      .withColumn("ga", explode(sequence(lit(0), $"gb")))
    val inter = graft.functions.ArrayOps.sortedIntersectCount($"sh_a", $"sh_b")
    a.join(b.hint("SHUFFLE_HASH"), Seq("lang", "ga", "gb"))
      .filter($"ga" =!= $"gb" || $"doc_a" < $"doc_b")
      // strict smaller-into-larger: equal-size pairs are the exact-dup
      // detector's job, not containment's
      .filter(size($"sh_a") =!= size($"sh_b"))
      .withColumn("inter", inter)
      // the smaller side of the one joined row is the inner candidate
      .select($"lang",
        when(size($"sh_a") < size($"sh_b"), $"doc_a").otherwise($"doc_b").as("inner_doc"),
        when(size($"sh_a") < size($"sh_b"), $"doc_b").otherwise($"doc_a").as("outer_doc"),
        least(size($"sh_a"), size($"sh_b")).as("n_inner"),
        $"inter")
      .filter($"n_inner" > 0 && $"inter" * 10 >= $"n_inner" * 9)
      .select($"lang", $"inner_doc", $"outer_doc",
        ($"inter".cast("double") / $"n_inner").as("coverage"))
  }

  private val containmentSql = {
    val shingleSql =
      """list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])"""
    s"""WITH d AS (
       |  SELECT doc_id, lang, $shingleSql AS sh
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
       |  WHERE len(t) >= 3)
       |SELECT a.lang, a.doc_id AS inner_doc, b.doc_id AS outer_doc,
       |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS coverage
       |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id <> b.doc_id
       |WHERE len(a.sh) < len(b.sh) AND len(a.sh) > 0
       |  AND len(list_intersect(a.sh, b.sh)) * 10 >= 9 * len(a.sh)""".stripMargin
  }

  /** MinHash permutation constants: affine maps (a_p·h + b_p) mod P over
    * the md5-derived 32-bit base hash, P prime > 2³² — a 2-universal family.
    * a_p stays < 2²¹ so a_p·h < 2⁵³ never overflows a long (or DuckDB's
    * BIGINT — the oracle restates these literals verbatim). */
  private val MinhashP = 4294967311L
  private def minhashA(p: Int): Long = 1L + 40503L * p
  private def minhashB(p: Int): Long = 1234567L * p

  /** MinHash + LSH banding near-dup:
    * shingle → md5-derived 32-bit base hash → 32 affine permutations
    * (`MinhashP` family above) → 16 bands × 2 rows → equi-join on the
    * band's signature pair → exact-Jaccard verification of candidates only.
    * The only shuffles are the band-key join and a distinct — no all-pairs
    * comparison anywhere. Deterministic AND oracle-expressible (round 4):
    * hashes, permutations, banding, and verification are restated exactly
    * in DuckDB SQL, so the emitted pair set is hash-checked rather than
    * spec-bounded — the xxhash64 family this replaces was Spark-only. */
  def minhashLsh(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    graft.functions.ArrayOps.register(s)
    val numPerm = 32
    val rowsPerBand = 2
    val numBands = numPerm / rowsPerBand

    // Hashed shingle sets are reused by four plan branches (both band-join
    // sides, both verification sides) — persist the small per-doc table
    // instead of recomputing the shingling 4×. ~0.5 KB/doc: fits memory at
    // any realistic docs-per-executor; spills to disk otherwise.
    val docs = Tables.documentsSpread(s, dir)
      .filter(size(toks($"text")) >= 3)
      .select($"doc_id", md5Shingles($"text").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Signatures via explode + 32 min-aggregates: one shuffle on doc_id,
    // fully codegen'd — no nested array HOFs, no 32 intermediate arrays/row.
    // Shingles were hashed to ints once; permutations are two integer ops
    // on the hash, not a re-hash of the string.
    val minAggs = (0 until numPerm).map(p =>
      min(($"h" * minhashA(p) + minhashB(p)) % MinhashP).as(s"m$p"))
    val sig = docs
      .select($"doc_id", explode($"sh").as("h"))
      .groupBy($"doc_id").agg(minAggs.head, minAggs.tail: _*)

    // Band keys straight from the 32 signature columns (2 rows/band); the
    // raw signature pair IS the join key — no derived band hash needed.
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        col(s"m${rowsPerBand * b}").as("m0"),
        col(s"m${rowsPerBand * b + 1}").as("m1"))
    }
    val bands = sig.select($"doc_id", explode(array(bandCols: _*)).as("e"))
      .select($"doc_id", $"e.band", $"e.m0", $"e.m1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.m0" === $"y.m0" &&
          $"x.m1" === $"y.m1" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()

    val result = candidates
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      // unrounded, same as ngramJaccard — the verification threshold must
      // agree exactly with the brute-force baseline's
      .select($"doc_a", $"doc_b", jaccard($"sh_a", $"sh_b").as("jacc"))
      .filter($"jacc" > threshold)

    // materialize the (small) pair list and release the intermediates now —
    // leaked persisted blocks otherwise pile up across queries and strangle
    // storage memory for the rest of the session
    val out = result.localCheckpoint(true)
    docs.unpersist(false)
    bands.unpersist(false)
    out
  }

  /** SimHash: 60-bit signature per document from per-token md5-derived bit
    * votes (explode → one hash-agg on doc_id with 60 codegen'd conditional
    * sums), then banded hamming-distance candidates (4 bands × 15 bits →
    * equi-join) with `bit_count(xor) <= maxHamming` verification.
    * Oracle-backed (round 4): DuckDB restates the identical hash, votes,
    * banding, and verification. */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 8): DataFrame = {
    import s.implicits._
    // 60-bit signature (15 md5 hex chars per token): stays positive in a
    // signed 64-bit int on BOTH engines, so every shift/mask below has
    // identical semantics in DuckDB — the property that makes this
    // oracle-expressible where the old 64-bit xxhash64 form was Spark-only
    val votes = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"v$b")
    }
    val sigBits = (0 until 60).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val sigs = Tables.documents(s, dir)
      .select($"doc_id", explode(toks($"text")).as("tok"))
      .select($"doc_id",
        conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy($"doc_id").agg(votes.head, votes.tail: _*)
      .select($"doc_id", sigBits.reduce(_.bitwiseOR(_)).as("simhash"))

    // per-band 15-bit slices via static shifts (shift amounts must be literals)
    val sliced = sigs.select($"doc_id", $"simhash",
      explode(array(
        struct(lit(0).as("band"), $"simhash".bitwiseAND(lit(0x7FFFL)).as("bv")),
        struct(lit(1).as("band"), shiftrightunsigned($"simhash", 15).bitwiseAND(lit(0x7FFFL)).as("bv")),
        struct(lit(2).as("band"), shiftrightunsigned($"simhash", 30).bitwiseAND(lit(0x7FFFL)).as("bv")),
        struct(lit(3).as("band"), shiftrightunsigned($"simhash", 45).bitwiseAND(lit(0x7FFFL)).as("bv")))).as("e"))
      .select($"doc_id", $"simhash", $"e.band", $"e.bv")

    sliced.as("x").join(sliced.as("y"),
        $"x.band" === $"y.band" && $"x.bv" === $"y.bv" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        bit_count($"x.simhash".bitwiseXOR($"y.simhash")).as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** Embedding-cosine near-dup over `embeddings.embedding` using the native
    * `cosine_sim` expression. Brute-force pair join (broadcast nested-loop on
    * the small side) — the oracle baseline; LSH-bucketed ANN lives in
    * SimilarityOps for the scale path. */
  def embeddingNearDup(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    // same triangular blocked all-pairs shape as ngramJaccard: equi-join on
    // the block pair (ga ≤ gb) — shuffled and bounded per task, no unbounded
    // broadcast; cosine is symmetric so ids canonicalize on output
    val G = 8
    val e = Tables.embeddings(s, dir)
      .withColumn("g", pmod(xxhash64($"vec_id"), lit(G)))
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("v_a"), $"g".as("ga"))
      .withColumn("gb", explode(sequence($"ga", lit(G - 1))))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("v_b"), $"g".as("gb"))
      .withColumn("ga", explode(sequence(lit(0), $"gb")))
    a.join(b.hint("SHUFFLE_HASH"), Seq("ga", "gb"))
      .filter($"ga" =!= $"gb" || $"id_a" < $"id_b")
      .select(
        least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"),
        round(VectorOps.cosineSim($"v_a", $"v_b"), 6).as("cos_sim"))
      .filter($"cos_sim" > threshold)
  }

  private val shingleSql =
    """list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])"""

  /** Incremental (ingest-time) dedup: classify each NEW document — the top
    * 20% of the doc_id space, standing in for the just-crawled batch —
    * against the EXISTING corpus (the other 80%) as `exact_dup` (identical
    * text), `near_dup` (same-lang n-gram Jaccard above `threshold`), or
    * `unique`. This is the shape a production pipeline actually runs:
    * nobody re-deduplicates 100 TB per crawl; each batch is checked against
    * the corpus and only survivors append.
    *
    * Scale posture: the exact check joins 16-byte md5s (never text); the
    * near check replicates only the SMALL new batch G ways so the equi-join
    * on (lang, corpus-block) spreads the probe work without replicating or
    * broadcasting the unbounded corpus side — corpus rows shuffle exactly
    * once. Both checks end in a per-new-doc count aggregate, so the output
    * stays |batch|-sized. */
  def incrementalDedup(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import s.implicits._
    graft.functions.ArrayOps.register(s)
    val G = 8
    // batch boundary from the id space: an O(1)-row aggregate, broadcast
    val mx = Tables.documents(s, dir)
      .agg(expr("((max(doc_id) + 1) * 4) div 5").as("cut"))
    val base = Tables.documentsSpread(s, dir).join(broadcast(mx))
    val newDocs = base.filter($"doc_id" >= $"cut").select($"doc_id", $"lang", $"text")
    val corpus = base.filter($"doc_id" < $"cut").select($"doc_id", $"lang", $"text")

    val ex = newDocs.select($"doc_id", md5($"text").as("h"))
      .join(corpus.select(md5($"text").as("h")), Seq("h"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_exact"))

    val nsh = newDocs.filter(size(toks($"text")) >= 3)
      .select($"doc_id".as("new_id"), $"lang", hashedShingles($"text").as("sh_a"))
      .withColumn("gb", explode(sequence(lit(0), lit(G - 1))))
    val csh = corpus.filter(size(toks($"text")) >= 3)
      .select($"doc_id".as("corp_id"), $"lang", hashedShingles($"text").as("sh_b"),
        pmod(xxhash64($"doc_id"), lit(G)).as("gb"))
    val near = nsh.join(csh.hint("SHUFFLE_HASH"), Seq("lang", "gb"))
      .filter(least(size($"sh_a"), size($"sh_b")).cast("double")
        >= lit(threshold) * greatest(size($"sh_a"), size($"sh_b")))
      .filter(jaccard($"sh_a", $"sh_b") > threshold)
      .groupBy($"new_id".as("doc_id")).agg(count(lit(1)).as("n_near"))

    newDocs.select($"doc_id")
      .join(ex, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_exact", lit(0L)).as("n_exact"),
        coalesce($"n_near", lit(0L)).as("n_near"),
        when(coalesce($"n_exact", lit(0L)) > 0, "exact_dup")
          .when(coalesce($"n_near", lit(0L)) > 0, "near_dup")
          .otherwise("unique").as("verdict"))
  }

  private[operators] val incrementalDedupSql =
    s"""WITH mx AS (SELECT ((max(doc_id) + 1) * 4) // 5 AS cut FROM documents),
       |nd AS (SELECT doc_id, lang, text FROM documents, mx WHERE doc_id >= cut),
       |corp AS (SELECT doc_id, lang, text FROM documents, mx WHERE doc_id < cut),
       |ex AS (
       |  SELECT n.doc_id, count(*) AS n_exact
       |  FROM nd n JOIN corp c ON n.text = c.text GROUP BY 1),
       |dn AS (
       |  SELECT doc_id, lang, $shingleSql AS sh
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM nd)
       |  WHERE len(t) >= 3),
       |dc AS (
       |  SELECT doc_id, lang, $shingleSql AS sh
       |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM corp)
       |  WHERE len(t) >= 3),
       |near AS (
       |  SELECT a.doc_id, count(*) AS n_near
       |  FROM dn a JOIN dc b ON a.lang = b.lang
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.sh, b.sh))) > 0.3
       |  GROUP BY 1)
       |SELECT n.doc_id,
       |       coalesce(ex.n_exact, 0) AS n_exact,
       |       coalesce(near.n_near, 0) AS n_near,
       |       CASE WHEN coalesce(ex.n_exact, 0) > 0 THEN 'exact_dup'
       |            WHEN coalesce(near.n_near, 0) > 0 THEN 'near_dup'
       |            ELSE 'unique' END AS verdict
       |FROM nd n LEFT JOIN ex ON ex.doc_id = n.doc_id
       |          LEFT JOIN near ON near.doc_id = n.doc_id""".stripMargin

  /** Train/test split-leakage audit: near-duplicate pairs that STRADDLE the
    * deterministic train/test split — the data-leakage check run before any
    * benchmark number is trusted (dedup-before-split; a test doc with a
    * training near-twin inflates eval, Lee et al. 2022's core warning).
    *
    * Pure composition: the MinHash+LSH pair set (`minhashLsh` — banded
    * equi-join, no all-pairs) plus the hash-gated split of
    * `q_split_traintest`, computed ROW-LOCALLY on the pair table from
    * doc_id (`md5` prefix gate) — no join against a split table, no extra
    * shuffle; the audit costs exactly one predicate over the (small)
    * near-dup pair set. Output = the leaking pairs with their similarity
    * and sides, the table a curation run feeds back into `q_decontaminate`
    * -style removal. */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def splitOf(c: Column): Column =
      when(substring(md5(c.cast("string")), 1, 2) < "cd", "train")
        .otherwise("test")
    minhashLsh(s, dir)
      .withColumn("split_a", splitOf($"doc_a"))
      .withColumn("split_b", splitOf($"doc_b"))
      .filter($"split_a" =!= $"split_b")
  }

  /** SUBSTRING-LEVEL DUPLICATE COVERAGE (round 15) — the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" measure
    * the doc-level family above cannot see: how many of each document's
    * tokens sit inside a ≥k-token run that ALSO appears in another
    * document. The paper removes those runs with a corpus suffix array;
    * the distributed re-expression is k-gram resolution — every k-token
    * shingle WITH ITS POSITION hashes once, shingles seen in >1 distinct
    * document flag their positions, and per-document interval merging
    * (classic gaps-and-islands, one window PARTITIONED BY doc) turns
    * overlapping flagged shingles into maximal duplicated runs whose
    * token coverage is exact. Output: per source — docs, flagged docs,
    * duplicated tokens, total tokens (all integers, so the oracle
    * boundary is float-free).
    *
    * Scale posture: the duplicated-shingle set is corpus-sized, so it is
    * NEVER broadcast — one hash-shuffle groupBy prices it (the honest
    * cost of substring dedup; the suffix array pays the same sort), the
    * flag join shuffles on the same key, and the interval merge is
    * per-document windows over only the FLAGGED positions. The md5
    * shingle key is engine-portable; a collision flags identically on
    * both sides, so comparisons stay exact. */
  def substringDedup(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(s, dir)
      .select($"doc_id", $"source", toks($"text").as("t"))
    val tot = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size($"t")).cast("long").as("total_tokens"))
    // positioned k-shingles: one row per (doc, start position)
    val sh = docs.where(size($"t") >= k)
      .select($"doc_id", $"source",
        posexplode(transform(sequence(lit(0), size($"t") - k),
          i => md5(concat_ws(" ", slice($"t", i + 1, lit(k)))))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "h")
      .persist()
    val dup = sh.groupBy($"h")
      .agg(countDistinct($"doc_id").as("nd"))
      .where($"nd" > 1).select($"h")
    val hits = sh.join(dup, "h").select($"doc_id", $"source", $"p")
    val w = Window.partitionBy($"doc_id").orderBy($"p")
    val perDoc = hits
      .withColumn("newi",
        when(coalesce(lag($"p", 1).over(w), lit(Int.MinValue).cast("int"))
          < $"p" - (k - 1), 1).otherwise(0))
      .withColumn("gid", sum($"newi")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"source", $"gid")
      .agg((max($"p") - min($"p") + k).cast("long").as("covered"))
      .groupBy($"doc_id", $"source")
      .agg(sum($"covered").as("dup_tokens"))
    val flagged = perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_flagged"), sum($"dup_tokens").as("dup_tokens"))
    // eager: the plan must execute while the shingle cache is live (the
    // dsirSelect pattern — a finally-unpersist would evict it first)
    val out = tot.join(flagged, Seq("source"), "left")
      .select($"source", $"n_docs",
        coalesce($"n_flagged", lit(0L)).as("n_flagged"),
        coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
        $"total_tokens")
      .localCheckpoint(true)
    sh.unpersist(false)
    out
  }

  private val substringDedupSql =
    """WITH d AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents),
      |tot AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(t)) AS BIGINT) AS total_tokens
      |  FROM d GROUP BY source),
      |sh AS (
      |  SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS p,
      |         md5(array_to_string(t[i:i+7], ' ')) AS h
      |  FROM d, unnest(range(1, len(t) - 8 + 2)) AS u(i)
      |  WHERE len(t) >= 8),
      |dup AS (
      |  SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) > 1),
      |hits AS (SELECT doc_id, source, p FROM sh JOIN dup USING (h)),
      |isl AS (
      |  SELECT doc_id, source, p,
      |         CASE WHEN COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p),
      |                            -2147483648) < p - 7
      |              THEN 1 ELSE 0 END AS newi
      |  FROM hits),
      |g AS (
      |  SELECT doc_id, source, p,
      |         sum(newi) OVER (PARTITION BY doc_id ORDER BY p
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      |  FROM isl),
      |cov AS (
      |  SELECT doc_id, source, gid, max(p) - min(p) + 8 AS covered
      |  FROM g GROUP BY doc_id, source, gid),
      |perdoc AS (
      |  SELECT doc_id, source, CAST(sum(covered) AS BIGINT) AS dup_tokens
      |  FROM cov GROUP BY doc_id, source),
      |flagged AS (
      |  SELECT source, count(*) AS n_flagged,
      |         CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens
      |  FROM perdoc GROUP BY source)
      |SELECT t.source, t.n_docs,
      |       COALESCE(f.n_flagged, 0) AS n_flagged,
      |       COALESCE(f.dup_tokens, 0) AS dup_tokens,
      |       t.total_tokens
      |FROM tot t LEFT JOIN flagged f USING (source)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substring_dedup" -> ((s, d) => substringDedup(s, d)),
    "q_split_leakage" -> ((s, d) => splitLeakage(s, d)),
    "q_dedup_exact" -> ((s, d) => exactDedup(s, d)),
    "q_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "q_containment" -> ((s, d) => containmentPairs(s, d)),
    "q_incremental_dedup" -> ((s, d) => incrementalDedup(s, d)),
    "q_minhash_pairs" -> ((s, d) => minhashLsh(s, d)),
    "q_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
    "q_embed_neardup" -> ((s, d) => embeddingNearDup(s, d)),
  )

  /** The DuckDB restatement of `minhashLsh` up to the verified pair table
    * `j` (doc_a, doc_b, jacc) — shared by `q_minhash_pairs` and the
    * split-leakage audit so the two oracles cannot drift apart. */
  private[graft] val minhashPairsCte: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, list_sort(list_distinct(
       |    [CAST(CONCAT('0x', substr(md5(array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT)
       |     for i in range(1, len(t) - 1)])) AS sh
       |  FROM d WHERE len(t) >= 3),
       |e AS (SELECT doc_id, unnest(sh) AS h FROM sh),
       |perm AS (SELECT unnest(range(0, 32)) AS p),
       |sig AS (
       |  SELECT e.doc_id, perm.p,
       |         min(((1 + 40503 * perm.p) * e.h + 1234567 * perm.p) % 4294967311) AS m
       |  FROM e, perm GROUP BY 1, 2),
       |bands AS (
       |  SELECT s0.doc_id, s0.p // 2 AS band, s0.m AS m0, s1.m AS m1
       |  FROM sig s0 JOIN sig s1 ON s0.doc_id = s1.doc_id AND s1.p = s0.p + 1
       |  WHERE s0.p % 2 = 0),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.m0 = y.m0 AND x.m1 = y.m1
       |   AND x.doc_id < y.doc_id),
       |j AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jacc
       |  FROM cand JOIN sh a ON cand.doc_a = a.doc_id
       |            JOIN sh b ON cand.doc_b = b.doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_incremental_dedup" -> incrementalDedupSql,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY text""".stripMargin,
    "q_containment" -> containmentSql,
    "q_ngram_jaccard" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, $shingleSql AS sh
         |  FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
         |  WHERE len(t) >= 3)
         |SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.sh, b.sh))) AS jacc
         |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.sh, b.sh))) > 0.3""".stripMargin,
    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) > 0.4""".stripMargin,
    // same positioned md5 k-shingles, same cross-doc duplicate flag, same
    // gaps-and-islands interval merge — integer outputs, float-free
    "q_substring_dedup" -> substringDedupSql,
    // Exact restatement of minhashLsh: same md5-derived base hashes, same
    // affine permutation literals, same 16×2 banding, same verification —
    // a drift anywhere in the pipeline breaks the hash compare.
    "q_minhash_pairs" -> s"$minhashPairsCte\nSELECT doc_a, doc_b, jacc FROM j WHERE jacc > 0.3",
    // the same verified pair set, with the hash-gated split of
    // q_split_traintest restated on both ids; only straddling pairs emit
    "q_split_leakage" ->
      s"""$minhashPairsCte
         |SELECT doc_a, doc_b, jacc,
         |  CASE WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'cd'
         |       THEN 'train' ELSE 'test' END AS split_a,
         |  CASE WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'cd'
         |       THEN 'train' ELSE 'test' END AS split_b
         |FROM j WHERE jacc > 0.3
         |  AND (CASE WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'cd'
         |       THEN 'train' ELSE 'test' END)
         |   <> (CASE WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'cd'
         |       THEN 'train' ELSE 'test' END)""".stripMargin,
    // Exact restatement of simhashPairs; the 60 vote sums and the bit
    // recomposition are generated by the same loops as the Spark side.
    "q_simhash_pairs" -> {
      val voteCols = (0 until 60).map(b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n         ")
      val sigExpr = (0 until 60).map(b =>
        s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      val bandRows = (0 until 4).map(b =>
        s"SELECT doc_id, simhash, $b AS band, (simhash >> ${15 * b}) & 32767 AS bv FROM s")
        .mkString("\n         UNION ALL ")
      s"""WITH d AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
         |  FROM d),
         |v AS (
         |  SELECT doc_id,
         |         $voteCols
         |  FROM h GROUP BY doc_id),
         |s AS (SELECT doc_id, $sigExpr AS simhash FROM v),
         |sl AS (
         |         $bandRows),
         |pairs AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         bit_count(xor(x.simhash, y.simhash)) AS hamming
         |  FROM sl x JOIN sl y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8""".stripMargin
    },
  )
}
