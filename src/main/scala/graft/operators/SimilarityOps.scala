package graft.operators

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings.embedding`
  * column (driver mandate; SURVEY.md §7 Phase 6).
  *
  * Two paths:
  *  - `knnBruteForce`: exact top-k per query via the codegen'd `cosine_sim`
  *    expression + a per-query top-k window. The correctness baseline the
  *    DuckDB oracle can reproduce.
  *  - `knnLsh`: sign-random-projection LSH — deterministic ±1 hyperplanes
  *    derived from a hash of (plane, dim), bucket on the signature prefix,
  *    exact re-rank only within the bucket. The 100 TB path: candidate
  *    generation is an equi-join on bucket id, never an all-pairs product.
  */
object SimilarityOps {

  /** Exact brute-force top-k: queries × candidates via broadcast of the
    * (small) query side, ranked per query. Ranking uses the 6-dp-rounded
    * similarity with vec_id tiebreak so Spark and the oracle agree even at
    * float boundaries. */
  def knnBruteForce(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** Matryoshka truncation audit (Kusupati et al. NeurIPS'22: MRL
    * embeddings are trained so a PREFIX of the dims is itself a usable
    * embedding): rank candidates by cosine over only the first `subDims`
    * dims and report, per query, how much of the full-dim exact top-k that
    * cheap ranking recovers — the measurement that decides whether a
    * deployment can ship 4× smaller vectors. At 100 TB the truncated scan
    * reads/computes a quarter of the vector bytes; this audit is the
    * bounded-query-slice shape of the ANN tier (broadcast ≤nQueries rows,
    * map-side `WindowGroupLimit` top-k), and every number it emits —
    * both rankings, the overlap, the recall fraction — is exactly
    * restatable in DuckDB (list slicing + the q_knn_topk cosine recipe),
    * unlike the probabilistic LSH/IVF recalls which are spec-bounded. */
  def matryoshkaRecall(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 10, subDims: Int = 16): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    def topk(scored: DataFrame): DataFrame = scored
      .withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"query_id", $"cand_id")
    val full = topk(c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim")))
    val trunc = topk(c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim(slice($"qv", 1, subDims),
          slice($"cv", 1, subDims)), 6).as("cos_sim")))
    full.join(trunc, Seq("query_id", "cand_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n_kept"))
      .join(q.select($"query_id"), Seq("query_id"), "right_outer")
      .select($"query_id",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        (coalesce($"n_kept", lit(0L)).cast("double") / k).as("recall"))
  }

  /** Deterministic ±1 hyperplane weights for plane `p`: a pure function of
    * (p, dim) — reproducible across runs, no RNG state to ship. */
  private def planeWeights(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((p, i))
      if ((h & 1) == 0) 1.0 else -1.0
    }

  /** Sign-random-projection LSH ANN: 8-bit signature (8 hyperplanes) →
    * bucket equi-join → exact cosine re-rank within bucket. The signature is
    * fully deterministic (literal ±1 hyperplanes, same IEEE double fold in
    * both engines), so unlike the KMeans-trained tiers this one gets a FULL
    * exact DuckDB restatement ([[lshOracleSql]]) — bucketing, candidate
    * join, and re-rank all hash-checked. */
  def knnLsh(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
      nPlanes: Int = 8, dims: Int = 64): DataFrame = {
    import s.implicits._
    VectorOps.register(s)

    def signature(v: Column): Column =
      (0 until nPlanes).map { p =>
        val w = typedlit(planeWeights(p, dims))
        val dot = aggregate(zip_with(v, w, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        when(dot >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)

    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding", signature($"embedding").as("bucket"))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"bucket")
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"bucket")

    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** Exact top-k via the `top_k_by` TypedImperativeAggregate: one pass,
    * O(k) state per query, map-side partials — the shuffle carries at most
    * k pairs per (partition, query) where the window formulation shuffles
    * and fully sorts every scored row. Same answer as `knnBruteForce`. */
  def knnTopKAgg(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
    c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
  }

  /** IVF-style ANN: KMeans partitions the vectors into cells (the "inverted
    * file"), each query probes its `nProbe` closest centroids, and only
    * vectors in probed cells are scored exactly (via `cosine_sim`) and
    * top-k'd (via the `top_k_by` aggregate). Candidate generation is an
    * equi-join on cell id — at 100 TB the cell assignment is a one-off
    * batch job and each query touches nProbe/nCells of the data. Rows-only
    * (cell boundaries are approximate).
    *
    * Default nProbe=10/16: the fixture vectors are near-isotropic (no real
    * cluster structure), so recall ≈ fraction scanned — 10/16 probes ≈ 0.6
    * of the data for recall@5 ≈ 0.87 (swept offline over
    * nCells ∈ {8,16,32} × nProbe ∈ {2..10}; MLlib KMeans recall at 8/16
    * measured 0.78). On real embedding corpora
    * (which cluster strongly) the same recall costs a far smaller scan;
    * nProbe is the recall/cost dial either way. */
  def knnIvf(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
      nCells: Int = 16, nProbe: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)

    val ev = Tables.embeddings(s, dir)
      .withColumn("fv", array_to_vector($"embedding"))
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(ev)
    val assigned = model.transform(ev)
      .select($"vec_id", $"embedding", $"cell").persist()

    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")

    val q = assigned.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cell")
    val probes = q.crossJoin(broadcast(cents))
      .select($"query_id", $"qv", $"cell",
        VectorOps.cosineSim($"qv", $"centroid").as("csim"))
      .withColumn("pr", row_number().over(w))
      .filter($"pr" <= nProbe)
      .select($"query_id", $"qv", $"cell")

    val out = probes
      .join(assigned.select($"cell", $"vec_id".as("cand_id"), $"embedding".as("cv")), "cell")
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"), $"cand_id")
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
      .localCheckpoint(true)
    assigned.unpersist(false)
    out
  }

  /** PERSISTED vector index (IVF as tables) — the ANN index as a durable
    * artifact instead of a per-query computation: `centroids/` (one row
    * per cell) and `cells/` (the assignments, PARTITIONED BY cell so a
    * probe reads only its cells' directories — the vector analog of the
    * inverted index's bucket pruning). Query: distances to the ≤|cells|
    * broadcast centroids pick each query's probe cells; the union of
    * probed cells becomes a literal partition filter (bounded:
    * queries × nProbe values); candidates re-rank exactly with the
    * codegen cosine. With `nProbe = nCells` the probe set is total and
    * the result EQUALS brute force — `q_vector_index` runs that mode, so
    * the q_knn_topk oracle hash-checks all the index plumbing (build,
    * layout, pruned read, re-rank); the spec runs partial probing and
    * asserts the partition filter plus a recall floor, and appends new
    * vectors to the persisted index (assignment = nearest centroid, an
    * append-mode write — no rebuild) and finds them. At 100 TB the build
    * amortizes over every search and probing cost is ∝ probed cells, not
    * corpus. */
  def vectorIndexSearch(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 10, nCells: Int = 16,
      nProbe: Int = 16): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_vecidx_" +
      java.lang.ProcessHandle.current().pid()
    // BUILD: one clustering pass, assignments land partitioned by cell
    val ev = Tables.embeddings(s, dir)
      .withColumn("fv", array_to_vector($"embedding"))
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(ev)
    model.transform(ev).select($"vec_id", $"embedding", $"cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root/cells")
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$root/centroids")
    vectorIndexQuery(s, root, k, nQueries, nProbe)
  }

  /** Search the PERSISTED index at `root` (no access to the corpus or the
    * build session — everything comes from the index tables). */
  private[graft] def vectorIndexQuery(s: SparkSession, root: String, k: Int,
      nQueries: Int, nProbe: Int): DataFrame = {
    import s.implicits._
    val cents = s.read.parquet(s"$root/centroids")
    val q = s.read.parquet(s"$root/cells")
      .filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cell")
    val probes = q.crossJoin(broadcast(cents))
      .select($"query_id", $"qv", $"cell",
        VectorOps.cosineSim($"qv", $"centroid").as("csim"))
      .withColumn("pr", row_number().over(w))
      .filter($"pr" <= nProbe)
      .select($"query_id", $"qv", $"cell")
      .localCheckpoint(true) // bounded: queries × nProbe rows
    // the union of probed cells → a LITERAL partition filter on the index
    val probedCells = probes.select($"cell").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nCells
    val cand = s.read.parquet(s"$root/cells")
      .filter($"cell".isin(probedCells.toIndexedSeq: _*))
    probes
      .join(cand.select($"cell", $"vec_id".as("cand_id"),
        $"embedding".as("cv")), "cell")
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"), $"cand_id")
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
  }

  /** VECTOR INDEX × ROW-LEVEL DML (round 17) — the persisted IVF index's
    * assignments live as a MANIFEST TABLE instead of bare parquet, so the
    * index composes with the lakehouse DML tier with NO rebuild:
    *
    *  - GDPR erasure = a keyed MOR delete (`#dv` marker, zero rewrites);
    *    the index scan reads through [[graft.sources.ManifestTable.read]],
    *    which applies the marker — deleted vectors can never surface in a
    *    search result, even before any compaction.
    *  - re-embeddings (corrections) + fresh arrivals = ONE distributed
    *    MOR upsert batch; every batch row re-assigns to its nearest
    *    centroid (broadcast of ≤nCells rows), so partial probing stays
    *    meaningful after the correction.
    *
    * Query side is [[vectorIndexQuery]]'s plumbing verbatim, candidates
    * served by the DV-aware read. Runs TOTAL probing, so the result
    * equals brute force over the post-DML corpus — which the DuckDB
    * oracle restates exactly (erased ids absent, negated corrections,
    * appended copies). Partial probing + the deleted-never-found
    * invariant are spec-pinned. At 100 TB the DML costs are the marker
    * commits (∝ batch, never corpus) and the scan-side marker apply is a
    * broadcast anti-join / bitmap probe — the same shape every MOR read
    * in this engine pays. */
  def vectorIndexSearchDml(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 10, nCells: Int = 16,
      nProbe: Int = 16): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    import graft.sources.ManifestTable
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)
    val cells = s"${System.getProperty("java.io.tmpdir")}/graft_vecidxdml_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(cells)
    // BUILD: one clustering pass; assignments commit clustered by cell so
    // per-file cell ranges stay tight (the stats-pruned probe path)
    val ev = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val fit = ev.withColumn("fv", array_to_vector($"embedding"))
    val model = new KMeans().setK(nCells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(fit)
    val assigned = model.transform(fit)
      .select($"vec_id", $"embedding", $"cell")
    val staged = ManifestTable.stageWithStats(s, cells,
      assigned.repartition(nCells, $"cell"),
      statsCols = Seq("vec_id", "cell"))
    require(ManifestTable.commit(cells, staged, -1))
    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    // DML LEG 1 — erasure: ids 3,13,…,93 leave by MOR marker (bounded
    // literal key list; no data file is touched)
    ManifestTable.deleteKeysMOR(s, cells, "vec_id", (3L to 93L by 10).toSeq)
    // DML LEG 2 — one upsert batch: the %10=5 vectors re-embed (negated —
    // an arithmetic the oracle can restate bit-exactly) and the %10=7
    // vectors re-arrive as NEW ids (+1_000_000); each row re-assigns to
    // its nearest centroid
    val fresh = ev.filter($"vec_id" % 10 === 5)
      .select($"vec_id", transform($"embedding", x => -x).as("embedding"))
      .unionByName(ev.filter($"vec_id" % 10 === 7)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
    val wa = Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cell")
    val freshAssigned = fresh.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"cell",
        VectorOps.cosineSim($"embedding", $"centroid").as("csim"))
      .withColumn("pr", row_number().over(wa)).filter($"pr" === 1)
      .select($"vec_id", $"embedding", $"cell")
    ManifestTable.upsertMOR(s, cells, freshAssigned, "vec_id")
    // SEARCH — the index plumbing over the DV-aware live view
    val live = ManifestTable.read(s, cells)
    val q = live.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val wp = Window.partitionBy($"query_id").orderBy($"csim".desc, $"cell")
    val probes = q.crossJoin(broadcast(cents))
      .select($"query_id", $"qv", $"cell",
        VectorOps.cosineSim($"qv", $"centroid").as("csim"))
      .withColumn("pr", row_number().over(wp))
      .filter($"pr" <= nProbe)
      .select($"query_id", $"qv", $"cell")
    probes
      .join(live.select($"cell", $"vec_id".as("cand_id"),
        $"embedding".as("cv")), "cell")
      .filter($"query_id" =!= $"cand_id")
      .select($"query_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"), $"cand_id")
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
  }

  /** Driver-side Lloyd k-means over a BOUNDED sample — the PQ codebook
    * trainer (codebooks need thousands of points, not the corpus; at this
    * size a plain Scala loop beats per-subspace MLlib fits whose job
    * overhead dominates — measured 9 s vs milliseconds in `knnPq`). */
  private def lloyd(pts: Array[Array[Double]], kCenters: Int,
      seed: Long): Array[Array[Double]] = {
    val dims = pts.head.length
    val rnd = new scala.util.Random(seed)
    var centers = rnd.shuffle(pts.indices.toVector)
      .take(kCenters).map(pts(_).clone).toArray
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        var d = 0.0; var i = 0
        while (i < p.length) { val t = p(i) - centers(c)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until 8) {
      val sums = Array.fill(kCenters)(new Array[Double](dims))
      val counts = new Array[Int](kCenters)
      pts.foreach { p =>
        val c = nearest(p); counts(c) += 1
        var i = 0
        while (i < dims) { sums(c)(i) += p(i); i += 1 }
      }
      centers = centers.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  /** Product-quantization ANN (Jégou et al., TPAMI'11): the 64-dim vectors
    * compress to m=8 one-byte codes (one 16-centroid KMeans codebook per
    * 8-dim subspace), and queries scan the CODES with an asymmetric
    * distance computation — per query a tiny m×16 table of partial inner
    * products is precomputed, so each candidate costs m table lookups
    * instead of a 64-dim float dot. At 100 TB this is the memory tier that
    * makes exhaustive scans feasible (8 bytes/vector vs 256) and composes
    * with IVF (`knnIvf`) as coarse stage; the scan side here is pure
    * DataFrame ops over a broadcast of the 10 query tables. The query
    * vectors and codebooks are collected driver-side — both bounded (10
    * rows; m×16×8 floats), the corpus never is. Rows-only (KMeans training
    * has no SQL oracle); recall vs the exact top-k is spec-bounded. */
  def knnPq(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
      m: Int = 8, subDim: Int = 8, codebookSize: Int = 16): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)
    val ev = Tables.embeddings(s, dir).select($"vec_id", $"embedding").persist()

    // one codebook per subspace, trained on a DETERMINISTIC BOUNDED SAMPLE
    // with a driver-side Lloyd loop — the standard PQ recipe (codebooks
    // need thousands of points, not the corpus), and at this size a plain
    // Scala loop beats 8 MLlib fits whose per-job overhead would dominate
    // the whole query (measured: 8 KMeans fits+transforms ≈ 9 s; this path
    // ≈ milliseconds of driver CPU)
    // id-range cap makes the sample BOUNDED (≤4096 rows to the driver at
    // any corpus size — a bare `% 7` alone is proportional, i.e. an OOM at
    // 100 TB) and deterministic, unlike `limit` without an order
    val sample = ev.filter($"vec_id" % 7 === 0 && $"vec_id" < 7L * 4096)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val codebooks = (0 until m).map { mi =>
      lloyd(sample.map(_.slice(mi * subDim, mi * subDim + subDim)),
        codebookSize, 42L + mi)
    }.toArray

    // encode distributed: per subspace, argmin over the 16 literal
    // centroids (first-min tie-break — deterministic); row-local HOFs
    def encodeSub(mi: Int): org.apache.spark.sql.Column = {
      val cents = typedlit(codebooks(mi).map(_.toSeq).toSeq)
      val sub = slice($"embedding", mi * subDim + 1, subDim)
      val dists = transform(cents, c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val vnorm = sqrt(aggregate($"embedding", lit(0.0), (a, x) => a + x * x))
    val codes = ev.select($"vec_id",
      array((0 until m).map(encodeSub): _*).as("codes"),
      vnorm.as("vn"))

    // per-query ADC tables: tbl[mi][code] = <q_sub, centroid>; query side is
    // bounded by construction, so the driver-side build is principled
    val qvecs = ev.filter($"vec_id" < nQueries)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qRows = qvecs.map { case (qid, qv) =>
      val tbl = (0 until m).map { mi =>
        codebooks(mi).map { c =>
          var d = 0.0; var i = 0
          while (i < subDim) { d += qv(mi * subDim + i) * c(i); i += 1 }
          d
        }.toSeq
      }
      val qn = math.sqrt(qv.map(x => x.toDouble * x).sum)
      (qid, tbl, qn, qv.toSeq)
    }.toSeq
    val qdf = qRows.toDF("query_id", "tbl", "qn", "qv")

    // stage 1 — ADC scan over the codes: cheap approximate scores, keep a
    // shortlist well past k (the standard retrieve-then-refine shape;
    // quantization error re-orders neighbors locally, so the shortlist
    // recalls what the top-k alone would lose)
    val shortlist = codes.crossJoin(broadcast(qdf))
      .filter($"query_id" =!= $"vec_id")
      .withColumn("adc",
        aggregate(zip_with($"codes", $"tbl",
          (c, row) => element_at(row, c + 1)), lit(0.0), (a, x) => a + x))
      .withColumn("approx_cos", $"adc" / ($"qn" * $"vn"))
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"approx_cos", $"vec_id", k * 16).as("top"))
      .select($"query_id", explode($"top").as("t"))
      .select($"query_id", $"t.id".as("cand_id"))
    // stage 2 — exact re-rank of the shortlist only: full-precision cosine
    // on |queries|·16k rows, never the corpus; the raw query vectors ride
    // in the same broadcast qdf (already driver-resident) — no second
    // corpus scan to recover them
    val out = shortlist
      .join(ev.select($"vec_id".as("cand_id"), $"embedding".as("cv")), "cand_id")
      .join(broadcast(qdf.select($"query_id", $"qv")), "query_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
      .localCheckpoint(true)
    ev.unpersist(false)
    out
  }

  /** IVF×PQ — the composed billion-vector ANN architecture (Jégou et al.
    * TPAMI'11; the FAISS IVFPQ layout): the coarse KMeans quantizer routes
    * each query to its `nProbe` closest cells, and WITHIN probed cells
    * candidates are scanned by asymmetric distance over PQ codes of the
    * RESIDUAL (vector − cell centroid) — residual PQ spends the codebook's
    * 4 bits/subspace on the within-cell offset, far tighter than coding
    * absolute position. `⟨q,v⟩ ≈ ⟨q,c_cell⟩ + Σᵢ tbl[i][code_i]` where
    * `⟨q,c_cell⟩` rides the probe row and `tbl` is the per-query ADC table
    * over the residual codebooks. A shortlist per query is then re-ranked
    * with exact full-precision cosine.
    *
    * Scale shape vs the components: `knnPq` ADC-scans the WHOLE corpus
    * (crossJoin); here candidate generation is an equi-join of the code
    * table against 10×nProbe broadcast probe rows — each query touches
    * nProbe/nCells of the data AND each candidate costs m byte-table
    * lookups, which is exactly why the composition (not either part alone)
    * is what runs at a billion vectors. Driver-side state stays bounded:
    * centroids (nCells×64), codebooks (m×16×8), the ≤4096-row residual
    * training sample, and the 10 query vectors. Rows-only (KMeans training
    * has no SQL oracle); recall@5 vs exact top-k is spec-bounded. */
  def knnIvfPq(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10,
      nCells: Int = 16, nProbe: Int = 10, m: Int = 8, subDim: Int = 8,
      codebookSize: Int = 16): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    graft.functions.TopKAgg.register(s)
    val ev = Tables.embeddings(s, dir).select($"vec_id", $"embedding").persist()

    // ONE bounded sample (the knnPq id-range recipe, ≤4096 rows at any
    // corpus size) trains BOTH quantizer levels driver-side: the coarse
    // router and, from each point's residual to its coarse cell, the m
    // subspace codebooks. No MLlib fit: the coarse quantizer needs stable
    // Voronoi cells from a few thousand points, not a converged corpus-wide
    // KMeans job (which is most of q_knn_ivf's wall time), and the corpus
    // itself never reaches the driver.
    // one collect serves both the training sample and the nQueries query
    // vectors (both id-bounded) — one Spark job instead of two
    val pulled = ev.filter(
        ($"vec_id" % 7 === 0 && $"vec_id" < 7L * 4096) || $"vec_id" < nQueries)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val sample = pulled.collect {
      case (id, v) if id % 7 == 0 && id < 7L * 4096 => v }
    val qvecs = pulled.collect { case (id, v) if id < nQueries => (id, v) }
    val centArr = lloyd(sample, nCells, 41L)
    // routing rule = argmax cosine to centroid (first index wins ties) —
    // chosen over L2 so the distributed assignment below can ride the
    // CODEGEN'D cosine_sim expression instead of interpreted HOF arithmetic
    // (~2× on the assignment scan), and consistent with the probe ranking
    def nearestCell(p: Array[Double]): Int = {
      val pn = math.sqrt(p.map(x => x * x).sum)
      var best = 0; var bs = Double.MinValue
      var c = 0
      while (c < centArr.length) {
        var d = 0.0; var i = 0
        while (i < p.length) { d += p(i) * centArr(c)(i); i += 1 }
        val cn = math.sqrt(centArr(c).map(x => x * x).sum)
        val sim = if (cn > 0 && pn > 0) d / (pn * cn) else 0.0
        if (sim > bs) { bs = sim; best = c }
        c += 1
      }
      best
    }
    val sampleResid = sample.map { v =>
      val c = centArr(nearestCell(v))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    val codebooks = (0 until m).map { mi =>
      lloyd(sampleResid.map(_.slice(mi * subDim, mi * subDim + subDim)),
        codebookSize, 42L + mi)
    }.toArray

    // distributed cell assignment: argmax cosine over the nCells literal
    // centroids, each a codegen'd cosine_sim call (row-local, embarrassingly
    // parallel — the 100 TB shape); array_position takes the FIRST max,
    // matching nearestCell's tie rule
    val centsLit = typedlit(centArr.map(_.toSeq).toSeq)
    val cellSims = array((0 until nCells).map { c =>
      VectorOps.cosineSim($"embedding",
        typedlit(centArr(c).map(_.toFloat).toSeq)) }: _*)
    val assigned = ev.select($"vec_id", $"embedding",
      (array_position(cellSims, array_max(cellSims)) - 1).cast("int").as("cell"))

    // distributed encode: residual = embedding − centroid[cell] (row-local,
    // centroids ride as a literal), then per-subspace argmin code
    val resid = zip_with($"embedding",
      element_at(centsLit, $"cell" + 1), (x, c) => x - c)
    def encodeSub(mi: Int): Column = {
      val cents = typedlit(codebooks(mi).map(_.toSeq).toSeq)
      val sub = slice($"resid", mi * subDim + 1, subDim)
      val dists = transform(cents, c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    val vnorm = sqrt(aggregate($"embedding", lit(0.0), (a, x) => a + x * x))
    val codes = assigned.withColumn("resid", resid)
      .select($"vec_id", $"cell",
        array((0 until m).map(encodeSub): _*).as("codes"), vnorm.as("vn"))

    // query side, all bounded: probe the nProbe closest cells by centroid
    // cosine (deterministic csim-desc/cell-asc order), carry ⟨q,c⟩ per probe
    // and the per-query residual ADC table
    val probeRows = qvecs.flatMap { case (qid, qv) =>
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val tbl = (0 until m).map { mi =>
        codebooks(mi).map { c =>
          var d = 0.0; var i = 0
          while (i < subDim) { d += qv(mi * subDim + i) * c(i); i += 1 }
          d
        }.toSeq
      }
      centArr.zipWithIndex.map { case (c, cell) =>
        val dot = c.indices.map(i => qv(i) * c(i)).sum
        val cn = math.sqrt(c.map(x => x * x).sum)
        (cell, dot, if (cn > 0) dot / (qn * cn) else 0.0)
      }.sortBy { case (cell, _, csim) => (-csim, cell) }
        .take(nProbe)
        .map { case (cell, qdotc, _) => (qid, cell, qdotc, tbl, qn, qv.toSeq) }
    }.toSeq
    val qdf = probeRows.toDF("query_id", "cell", "qdotc", "tbl", "qn", "qv")

    // stage 1 — ADC scan of PROBED cells only: equi-join on cell against the
    // broadcast probe rows, m table lookups per candidate
    val shortlist = codes.join(broadcast(qdf), "cell")
      .filter($"query_id" =!= $"vec_id")
      .withColumn("adc", $"qdotc" +
        aggregate(zip_with($"codes", $"tbl",
          (c, row) => element_at(row, c + 1)), lit(0.0), (a, x) => a + x))
      .withColumn("approx_cos", $"adc" / ($"qn" * $"vn"))
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"approx_cos", $"vec_id", k * 32).as("top"))
      .select($"query_id", explode($"top").as("t"))
      .select($"query_id", $"t.id".as("cand_id"))

    // stage 2 — exact re-rank of the shortlist only
    val qOnly = qvecs.toSeq.map { case (qid, qv) => (qid, qv.toSeq) }
      .toDF("query_id", "qv")
    val out = shortlist
      .join(ev.select($"vec_id".as("cand_id"), $"embedding".as("cv")), "cand_id")
      .join(broadcast(qOnly), "query_id")
      .select($"query_id", $"cand_id",
        round(VectorOps.cosineSim($"qv".cast("array<float>"), $"cv"), 6).as("cos_sim"))
      .groupBy($"query_id")
      .agg(graft.functions.TopKAgg.topKBy($"cos_sim", $"cand_id", k).as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col.id".as("cand_id"), $"col.score".as("cos_sim"),
        ($"pos" + 1).cast("int").as("rank"))
      .localCheckpoint(true)
    ev.unpersist(false)
    out
  }

  /** Per-label centroid (average pooling) in LONG form — (label, pos,
    * avg_val) — the class-prototype computation behind nearest-centroid
    * classification and IVF coarse quantizers. Long form keeps the output
    * scalar-typed (array columns break the driver's comparator) and the
    * plan is explode → one partial-aggregated hash agg: map-side combine
    * shrinks the shuffle to |labels|×dims rows regardless of corpus size.
    * avg over floats is order-dependent across engines → round(6). */
  def embedCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.embeddings(s, dir)
      .select($"label", posexplode($"embedding"))
      .groupBy($"label", ($"pos" + 1).cast("int").as("pos"))
      .agg(round(avg($"col"), 6).as("avg_val"))
  }

  /** Symmetric per-vector int8 quantization of the embedding column — the
    * 4× storage/bandwidth compression a billion-vector ANN index rides on
    * (scalar quantization; the storage tier below the PQ codes of
    * `knnPq`). scale = max|x|/127 per vector; code_i = ⌊x_i·127/max|x| +
    * 0.5⌋ ∈ [-127,127]. Embarrassingly parallel single map pass, no
    * shuffle below the explode. Emitted in LONG form (vec_id, pos, qval,
    * scale): the codes are exact integers — float-rounding-proof under
    * the driver's cross-engine hash compare — and `floor(x+0.5)` is used
    * instead of `round` because round-half-even vs half-away differs
    * between engines while floor is identical IEEE arithmetic in both.
    * Dequantization is qval·scale, verified within scale/2 by spec. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("mx", array_max(transform($"v", x => abs(x))))
      .select($"vec_id", $"mx", posexplode($"v"))
      .select(
        $"vec_id",
        $"pos".cast("int").as("pos"),
        when($"mx" > 0, floor($"col" * 127.0 / $"mx" + 0.5))
          .otherwise(lit(0.0)).cast("int").as("qval"),
        round($"mx" / 127.0, 6).as("scale"))
  }

  /** Prefix-filtered sparse-cosine self-join over bigram count vectors —
    * the AllPairs/PPJoin shape (Bayardo et al., WWW'07): candidate pairs
    * come from an inverted-index equi-join restricted to each document's
    * `prefix` RAREST terms (rank by document frequency), and the exact
    * cosine is then verified only on candidates. Candidate volume scales
    * with Σ prefix-df², not corpus², and the verify join fans each
    * candidate out by its term count — never an all-pairs product.
    * Cosine = int dot / sqrt(int norms): exact integers into correctly-
    * rounded sqrt/divide, so Spark and DuckDB agree bitwise. */
  def sparseCosinePairs(s: SparkSession, dir: String,
      prefix: Int = 2, threshold: Double = 0.6): DataFrame = {
    import s.implicits._
    val t = split(trim($"text"), "\\s+")
    // zip_with over two shifted slices beats transform+element_at ~2.5×
    // (one array traversal, no per-element positional lookups)
    val bigrams = when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val tf = Tables.documentsSpread(s, dir)
      .select($"doc_id", explode(bigrams).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    // rarest-`prefix` terms per doc via one hash agg (sort ≤|terms(doc)|
    // structs per group, keep 2) — cheaper than ranking the whole posting
    // table through a row_number window
    val pfx = tf.join(df, "term")
      .groupBy($"doc_id")
      .agg(slice(array_sort(collect_list(struct($"df", $"term"))), 1, prefix)
        .as("top"))
      .select($"doc_id", explode($"top").as("p"))
      .select($"doc_id", $"p.term".as("term"))
    val cand = pfx.as("a")
      .join(pfx.as("b"), $"a.term" === $"b.term" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    // per-doc packed sparse vector: sorted array of (hash48 << 16 | tf) —
    // the verify step is then ONE row-local merge scan per candidate pair
    // (codegen'd `sorted_dot_product`) instead of fanning every pair out by
    // its term count through a shuffle join on the posting table
    graft.functions.ArrayOps.register(s)
    val vecs = tf.groupBy($"doc_id")
      .agg(array_sort(collect_list(
        shiftleft(xxhash64($"term"), 16) + least($"tf", lit(65535L)))).as("vec"),
        sum($"tf" * $"tf").as("nrm"))
    val out = cand
      .join(vecs.select($"doc_id".as("doc_a"), $"vec".as("va"), $"nrm".as("na")), "doc_a")
      .join(vecs.select($"doc_id".as("doc_b"), $"vec".as("vb"), $"nrm".as("nb")), "doc_b")
      .withColumn("cos",
        graft.functions.ArrayOps.sortedDotProduct($"va", $"vb").cast("double") /
          sqrt(($"na" * $"nb").cast("double")))
      .filter($"cos" >= threshold)
      .select($"doc_a", $"doc_b", round($"cos", 6).as("cos_sim"))
      .localCheckpoint(true)
    tf.unpersist(false)
    out
  }

  private val sparseCosineSql =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
      |         SELECT doc_id,
      |                unnest(list_transform(range(1, len(t)),
      |                                      i -> t[i] || ' ' || t[i+1])) AS term
      |         FROM toks) GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |pfx AS (SELECT doc_id, term FROM (
      |          SELECT tf.doc_id, tf.term,
      |                 row_number() OVER (PARTITION BY tf.doc_id
      |                                    ORDER BY df.df, tf.term) AS rn
      |          FROM tf JOIN df USING (term)) WHERE rn <= 2),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM pfx a JOIN pfx b ON a.term = b.term AND a.doc_id < b.doc_id),
      |norms AS (SELECT doc_id, sum(tf * tf) AS nrm FROM tf GROUP BY 1),
      |dots AS (SELECT c.doc_a, c.doc_b, sum(ta.tf * tb.tf) AS dot
      |         FROM cand c
      |         JOIN tf ta ON ta.doc_id = c.doc_a
      |         JOIN tf tb ON tb.doc_id = c.doc_b AND tb.term = ta.term
      |         GROUP BY 1, 2)
      |SELECT d.doc_a, d.doc_b,
      |       round(d.dot / sqrt(na.nrm * nb.nrm), 6) AS cos_sim
      |FROM dots d JOIN norms na ON na.doc_id = d.doc_a
      |            JOIN norms nb ON nb.doc_id = d.doc_b
      |WHERE d.dot / sqrt(na.nrm * nb.nrm) >= 0.6e0""".stripMargin

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most-similar candidates carrying a DIFFERENT label — the
    * negatives that sit closest to the decision boundary and therefore carry
    * the most gradient signal. Same shape as [[knnBruteForce]] (broadcast
    * the bounded query side, codegen cosine, per-query top-k window), with
    * the label-mismatch predicate applied at the join so excluded positives
    * never reach the scorer; at 100 TB the candidate side streams through
    * the broadcast join with no shuffle and the only shuffle is the
    * nQueries-keyed top-k window. Ranking uses the 6-dp-rounded similarity
    * with cand_id tiebreak so Spark and the oracle agree at float
    * boundaries. */
  def hardNegatives(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"label".as("qlabel"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"label".as("neg_label"))
    val scored = c.join(broadcast(q), $"neg_label" =!= $"qlabel")
      .select($"query_id", $"cand_id", $"neg_label",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** Label-noise audit: for each audited vector, the fraction of its exact
    * k nearest neighbors carrying a DIFFERENT label — rows where most
    * neighbors disagree are suspected mislabels (the classic kNN-based
    * label-error detector). The audit slice is bounded (`nEval` rows,
    * broadcast), so the candidate side streams through a broadcast join
    * with no shuffle: at 100 TB you audit a sample per ingest batch, not
    * the full corpus at once. The disagreement fraction is a division of
    * two small exact integers — bit-identical across engines, no rounding
    * needed. */
  def labelNoise(s: SparkSession, dir: String, k: Int = 10, nEval: Int = 50): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nEval)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"label".as("qlabel"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"label".as("clabel"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"qlabel", $"cand_id", $"clabel",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .groupBy($"query_id", $"qlabel")
      .agg(sum(when($"clabel" =!= $"qlabel", 1).otherwise(0)).as("n_disagree"),
        // divide by the ACTUAL neighbor count, not the literal k: on a
        // fixture (or audit slice) with fewer than k other vectors the
        // fraction stays a true fraction instead of being understated
        (sum(when($"clabel" =!= $"qlabel", 1).otherwise(0)).cast("double")
          / count(lit(1))).as("noise_frac"))
  }

  /** The positives half of contrastive pair mining (besides
    * [[hardNegatives]]): per query vector, the top-k most-similar SAME-label
    * candidates (self excluded) — anchor/positive pairs for a contrastive
    * objective. Identical scale shape: bounded broadcast query slice,
    * label-equality predicate at the join, codegen cosine, map-side top-k. */
  def positivePairs(s: SparkSession, dir: String, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"label".as("qlabel"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"label".as("clabel"))
    val scored = c.join(broadcast(q),
        $"clabel" === $"qlabel" && $"cand_id" =!= $"query_id")
      .select($"query_id", $"cand_id", $"qlabel".as("label"),
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  /** Hybrid-retrieval rank fusion (Reciprocal Rank Fusion, Cormack et al.
    * SIGIR'09 — the standard way RAG stacks combine lexical and vector
    * search): fuse the BM25 ranking ([[CurationOps.bm25Search]], the query's
    * lexical form) with a cosine ranking against a query embedding (vec 0
    * standing in for the encoded query, as elsewhere in the ANN tier) by
    * `Σ 1/(k + rank)` over the lists each document appears in.
    *
    * Scale shape: each branch reduces to its top-`headN` via
    * `TakeOrderedAndProject` — a DISTRIBUTED bounded reduction, the 100 TB
    * substitute for a global ranking window — and only the two bounded
    * heads (≤headN rows each) see a `row_number` window and the full-outer
    * fusion join. Fusing heads, not full rankings, is also the semantics
    * real systems run (retrieve top-100 from each engine, fuse). RRF scores
    * are computed from integer ranks in a fixed term order, so Spark and
    * DuckDB evaluate bit-identical doubles. */
  def hybridRrf(s: SparkSession, dir: String, kRrf: Int = 60,
      headN: Int = 100, topn: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    VectorOps.register(s)
    val lexHead = CurationOps.bm25Search(s, dir)
      .orderBy($"bm25".desc, $"doc_id").limit(headN)
    val lex = lexHead.withColumn("lex_rank",
        row_number().over(Window.orderBy($"bm25".desc, $"doc_id")).cast("int"))
      .select($"doc_id", $"lex_rank")
    val e = Tables.embeddings(s, dir)
    val qv = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val semHead = e.filter($"vec_id" =!= 0)
      .join(broadcast(qv))
      .select($"vec_id".as("doc_id"),
        round(VectorOps.cosineSim($"embedding", $"qv"), 6).as("cos"))
      .orderBy($"cos".desc, $"doc_id").limit(headN)
    val sem = semHead.withColumn("sem_rank",
        row_number().over(Window.orderBy($"cos".desc, $"doc_id")).cast("int"))
      .select($"doc_id", $"sem_rank")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"lex_rank", $"sem_rank",
        (coalesce(lit(1.0) / ($"lex_rank" + kRrf), lit(0.0)) +
          coalesce(lit(1.0) / ($"sem_rank" + kRrf), lit(0.0))).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id").limit(topn)
      .select($"doc_id", $"lex_rank", $"sem_rank",
        round($"rrf", 6).as("rrf_score"))
  }

  /** Retrieval-quality evaluation — nDCG@k, MRR, and precision@k for the
    * exact cosine top-k, with "candidate shares the query's label" as the
    * relevance judgment (the standard proxy when no human qrels exist).
    * This is the measurement loop every RAG / embedding deployment runs on
    * each index or model change; it composes the engine's own ranking
    * (`knnBruteForce`, the q_knn_topk plan: bounded broadcast query slice,
    * map-side WindowGroupLimit top-k) with one broadcast-hash pass over the
    * label table — the ≤k·nQueries ranked rows broadcast, the corpus never
    * reshuffles. IDCG uses the ideal ranking of ALL corpus-relevant docs
    * capped at k (`Σ_{i≤min(k,n_rel)} 1/log2(i+1)`, a bounded `sequence`
    * fold), so nDCG is comparable across queries with few relevant docs.
    * Every emitted number is exactly restated in DuckDB. */
  def retrievalEval(s: SparkSession, dir: String, k: Int = 5,
      nQueries: Int = 10): DataFrame = {
    import s.implicits._
    val labels = Tables.embeddings(s, dir).select($"vec_id", $"label")
    // corpus-relevant count per query label: an agg to |labels| groups,
    // then the bounded query slice joins against it
    val byLabel = labels.groupBy($"label").agg(count(lit(1)).as("n_label"))
    val q = labels.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"label".as("q_label"))
      .join(byLabel.withColumnRenamed("label", "q_label"), Seq("q_label"))
      .withColumn("n_rel", ($"n_label" - 1).cast("long")) // exclude the query itself
    val ranked = knnBruteForce(s, dir, k, nQueries)
      .join(broadcast(q), Seq("query_id"))
    val judged = labels.select($"vec_id".as("cand_id"), $"label".as("c_label"))
      .join(broadcast(ranked), Seq("cand_id"))
      .withColumn("rel", ($"c_label" === $"q_label").cast("int"))
    judged.groupBy($"query_id", $"n_rel")
      .agg(sum($"rel").cast("long").as("n_rel_at_k"),
        round(sum($"rel") / lit(k.toDouble), 6).as("p_at_k"),
        round(max($"rel".cast("double") / $"rank"), 6).as("rr"),
        sum(when($"rel" === 1, lit(1.0) / log2($"rank" + lit(1.0)))
          .otherwise(0.0)).as("dcg_raw"))
      .withColumn("idcg_raw",
        when($"n_rel" >= 1, expr(
          s"""aggregate(sequence(1, int(least($k, n_rel))), 0d,
             |          (acc, i) -> acc + 1d / log2(i + 1d))""".stripMargin))
          .otherwise(lit(0.0)))
      .select($"query_id", $"n_rel", $"n_rel_at_k", $"p_at_k", $"rr",
        round($"dcg_raw", 6).as("dcg"),
        round(when($"idcg_raw" > 0, $"dcg_raw" / $"idcg_raw").otherwise(0.0), 6)
          .as("ndcg"))
  }

  /** kNN-classifier evaluation with chance correction: majority-vote the
    * k nearest neighbors' labels for an audit slice, then score the
    * predictions against truth as accuracy AND Cohen's kappa — the
    * agreement statistic that discounts what label imbalance gives away
    * for free (a 90%-one-class corpus scores 0.9 accuracy by always
    * guessing; its kappa is 0). This is the "is the embedding space
    * actually class-separating" measurement behind
    * [[labelNoise]]'s per-item audit.
    *
    * Scale shape: the same bounded-broadcast ANN audit as labelNoise
    * (≤nEval query rows broadcast, map-side WindowGroupLimit top-k);
    * everything after the top-k — votes, argmax prediction, confusion
    * marginals, kappa — runs on ≤k·nEval rows. Vote ties break to the
    * smallest label so prediction is deterministic. All divisions are
    * exact-integer-over-exact-integer IEEE ops, so both engines compute
    * bit-identical doubles before the 6-dp round. */
  def knnClassifierEval(s: SparkSession, dir: String, k: Int = 5,
      nEval: Int = 50): DataFrame = {
    import s.implicits._
    VectorOps.register(s)
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < nEval)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"label".as("qlabel"))
    val c = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"), $"label".as("clabel"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"cand_id")
      .select($"query_id", $"qlabel", $"cand_id", $"clabel",
        round(VectorOps.cosineSim($"qv", $"cv"), 6).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"cand_id")
    val votes = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .groupBy($"query_id", $"qlabel", $"clabel").agg(count(lit(1)).as("n"))
    val wv = Window.partitionBy($"query_id").orderBy($"n".desc, $"clabel")
    val pred = votes.withColumn("rn", row_number().over(wv)).filter($"rn" === 1)
      .select($"query_id", $"qlabel", $"clabel".as("plabel"))
    val tot = pred.agg(count(lit(1)).cast("long").as("n_eval"),
      sum(when($"qlabel" === $"plabel", 1L).otherwise(0L)).as("n_correct"))
    val rc = pred.groupBy($"qlabel".as("l")).agg(count(lit(1)).as("rm"))
      .join(pred.groupBy($"plabel".as("l")).agg(count(lit(1)).as("cmg")),
        Seq("l"), "full_outer")
      .agg(sum(coalesce($"rm", lit(0L)) * coalesce($"cmg", lit(0L))).as("sum_rc"))
    tot.crossJoin(rc)
      .withColumn("po_raw", $"n_correct" / $"n_eval".cast("double"))
      .withColumn("pe_raw", $"sum_rc" / ($"n_eval".cast("double") * $"n_eval"))
      .select($"n_eval", $"n_correct",
        round($"po_raw", 6).as("accuracy"),
        round($"pe_raw", 6).as("pe"),
        round(($"po_raw" - $"pe_raw") / (lit(1.0) - $"pe_raw"), 6).as("kappa"))
  }

  /** Driver-gate graduation for the KMeans-trained ANN tier (IVF / PQ /
    * IVF×PQ): the bound-invariant oracle pattern of `q_approx_distinct`
    * applied to recall. The gate runs the approximate ranking AND the exact
    * brute-force ranking and emits ONE row DuckDB restates exactly:
    *   - `n_queries` — the query-slice size (a real count, not a literal);
    *   - `exact_sim_sum_micros` — the exact top-k similarities summed as
    *     integer micros: `round(cos,6)·1e6` is integer-valued, so the sum is
    *     exact integer arithmetic, bit-identical across engines (a DOUBLE
    *     sum would hit the cross-engine summation-order trap);
    *   - `recall_ok` — TRUE iff mean recall@k vs the exact top-k clears the
    *     floor. The approximate ranking is deterministic (fixed seeds,
    *     first-min tie-breaks), so the flag is hash-stable, and a recall
    *     regression flips it FALSE and breaks the driver's hash compare.
    * Specs keep auditing the full per-row rankings via the underlying
    * functions; the registered query IS the gate. */
  /** ONE definition of the gate geometry, shared by [[annRecallGate]]
    * and [[annGateSql]] — the single place a retune edits, so the Spark
    * gate and its DuckDB oracle cannot desynchronize. */
  private val GateK = 5
  private val GateNQueries = 10

  private def annRecallGate(s: SparkSession, dir: String,
      approx: DataFrame, floor: Double, k: Int = GateK,
      nQueries: Int = GateNQueries): DataFrame = {
    import s.implicits._
    val exact = knnBruteForce(s, dir, k, nQueries)
      .select($"query_id", $"cand_id", $"cos_sim")
    val hits = approx.select($"query_id", $"cand_id")
      .join(exact.select($"query_id", $"cand_id"),
        Seq("query_id", "cand_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy($"query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(round($"cos_sim" * 1e6, 0).cast("long")).as("micros"))
      .join(hits, Seq("query_id"), "left_outer")
      .agg(count(lit(1)).as("n_queries"),
        sum($"micros").as("exact_sim_sum_micros"),
        (sum(coalesce($"n_hit", lit(0L))).cast("double") /
          sum($"n_exact") >= floor).as("recall_ok"))
  }

  /** Shared oracle for the [[annRecallGate]] wrappers: the exact top-k
    * restated (the q_knn_topk recipe), aggregated to the gate's one row.
    * DuckDB recomputes `n_queries` and the integer-micros similarity sum for
    * real; `recall_ok` is the bound-invariant TRUE flag. */
  // generated from the SAME GateK/GateNQueries constants annRecallGate
  // defaults to (the lshOracleSql pattern) — one shared definition, so a
  // retune cannot silently desynchronize the gate from its oracle
  private def annGateSql(k: Int = GateK, nQueries: Int = GateNQueries)
      : String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
      |  FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
      |ranked AS (
      |  SELECT query_id, cand_id, cos_sim,
      |         ROW_NUMBER() OVER (PARTITION BY query_id
      |                            ORDER BY cos_sim DESC, cand_id) AS rank
      |  FROM scored QUALIFY rank <= $k)
      |SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
      |       CAST(sum(CAST(round(cos_sim * 1000000) AS BIGINT)) AS BIGINT) AS exact_sim_sum_micros,
      |       TRUE AS recall_ok
      |FROM ranked""".stripMargin

  /** FULL DuckDB restatement of [[knnLsh]]: the ±1 hyperplane matrix is a
    * pure function of (plane, dim) — see [[planeWeights]] — so it embeds as
    * 8×64 literal +/− terms. Each plane's dot product is the same
    * left-to-right IEEE double fold Spark's `aggregate(zip_with(...))`
    * computes (float elements promote to double exactly; ±1.0 multiplies are
    * exact negations), so the SIGN — and therefore the bucket — is
    * bit-identical across engines, and the bucketed candidate join + 6-dp
    * cosine re-rank is the already-proven q_knn_topk recipe. */
  private def lshOracleSql(nQueries: Int = 10, nPlanes: Int = 8,
      dims: Int = 64): String = {
    val bucket = (0 until nPlanes).map { p =>
      val terms = planeWeights(p, dims).zipWithIndex.map { case (w, i) =>
        (if (w > 0) " + " else " - ") + s"v[${i + 1}]"
      }.mkString
      s"(CASE WHEN (0.0$terms) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("\n     + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |      ($bucket) AS bucket FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
       |  FROM b q JOIN b c ON q.bucket = c.bucket
       |                   AND q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT query_id, cand_id, cos_sim,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |                               ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= 5""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_classifier" -> ((s, d) => knnClassifierEval(s, d)),
    "q_retrieval_eval" -> ((s, d) => retrievalEval(s, d)),
    "q_sparse_cosine" -> ((s, d) => sparseCosinePairs(s, d)),
    "q_hybrid_rrf" -> ((s, d) => hybridRrf(s, d)),
    "q_matryoshka_recall" -> ((s, d) => matryoshkaRecall(s, d)),
    "q_knn_topk" -> ((s, d) => knnBruteForce(s, d)),
    "q_vector_index" -> ((s, d) => vectorIndexSearch(s, d)),
    "q_vector_index_dml" -> ((s, d) => vectorIndexSearchDml(s, d)),
    "q_hard_negatives" -> ((s, d) => hardNegatives(s, d)),
    "q_positive_pairs" -> ((s, d) => positivePairs(s, d)),
    "q_label_noise" -> ((s, d) => labelNoise(s, d)),
    "q_knn_topk_agg" -> ((s, d) => knnTopKAgg(s, d)),
    "q_knn_lsh" -> ((s, d) => knnLsh(s, d)),
    // the KMeans-trained tiers register as recall gates (round-16
    // graduation): same ANN work, plus the exact ranking the oracle
    // restates. Floors hold with margin at sf0.001/0.01/0.1 (measured
    // 0.86–0.94 / 0.50–0.78 / 0.68–0.88 respectively) and sit far above the
    // random-scan baselines (probe fraction ≈ 0.63 for IVF, ~0.0025 for a
    // blind top-5), so the TRUE flag is SF-stable yet a real regression
    // (broken probe routing, codebook collapse) still flips it.
    "q_knn_ivf" -> ((s, d) => annRecallGate(s, d, knnIvf(s, d), floor = 0.75)),
    "q_knn_pq" -> ((s, d) => annRecallGate(s, d, knnPq(s, d), floor = 0.3)),
    "q_knn_ivfpq" -> ((s, d) => annRecallGate(s, d, knnIvfPq(s, d), floor = 0.6)),
    "q_embed_centroids" -> ((s, d) => embedCentroids(s, d)),
    "q_embed_quantize" -> ((s, d) => embedQuantize(s, d)),
  )

  private val knnOracleSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
      |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      |SELECT query_id, cand_id, cos_sim,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 5""".stripMargin

  private val knnTopkSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
      |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      |SELECT query_id, cand_id, cos_sim,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 5""".stripMargin

  val oracle: Map[String, String] = Map(
    // the full classifier eval restated: same ranking CTE, majority vote
    // with the same (count desc, label asc) tiebreak, kappa from marginals
    "q_knn_classifier" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM e WHERE vec_id < 50),
        |scored AS (
        |  SELECT q.query_id, q.qlabel, c.vec_id AS cand_id, c.label AS clabel,
        |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
        |  FROM q JOIN e c ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, cand_id) AS rank
        |  FROM scored QUALIFY rank <= 5),
        |votes AS (SELECT query_id, qlabel, clabel, count(*) AS n
        |          FROM ranked GROUP BY 1, 2, 3),
        |pred AS (SELECT query_id, qlabel, clabel AS plabel FROM votes
        |         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
        |                                    ORDER BY n DESC, clabel) = 1),
        |m AS (SELECT COALESCE(rm, 0) AS rm, COALESCE(cmg, 0) AS cmg
        |      FROM (SELECT qlabel AS l, count(*) AS rm FROM pred GROUP BY 1) r
        |      FULL JOIN (SELECT plabel AS l2, count(*) AS cmg FROM pred GROUP BY 1) c2
        |        ON r.l = c2.l2),
        |stats AS (SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM pred) AS n_eval,
        |    (SELECT CAST(count(*) AS BIGINT) FROM pred WHERE qlabel = plabel) AS n_correct,
        |    (SELECT CAST(sum(rm * cmg) AS BIGINT) FROM m) AS sum_rc)
        |SELECT n_eval, n_correct,
        |       round(n_correct / CAST(n_eval AS DOUBLE), 6) AS accuracy,
        |       round(sum_rc / (CAST(n_eval AS DOUBLE) * n_eval), 6) AS pe,
        |       round((n_correct / CAST(n_eval AS DOUBLE)
        |              - sum_rc / (CAST(n_eval AS DOUBLE) * n_eval))
        |             / (1 - sum_rc / (CAST(n_eval AS DOUBLE) * n_eval)), 6) AS kappa
        |FROM stats""".stripMargin,
    // the full eval loop restated: ranking CTE = the q_knn_topk recipe,
    // relevance = label match, IDCG the capped ideal-ranking sum
    "q_retrieval_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |lc AS (SELECT label, count(*) AS n_label FROM e GROUP BY 1),
        |q AS (SELECT e.vec_id AS query_id, e.label AS q_label,
        |             CAST(lc.n_label - 1 AS BIGINT) AS n_rel
        |      FROM e JOIN lc USING (label) WHERE e.vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, q.q_label, q.n_rel, c.vec_id AS cand_id,
        |         c.label AS c_label,
        |         round(list_cosine_similarity(qq.v, c.v), 6) AS cos_sim
        |  FROM q JOIN e qq ON qq.vec_id = q.query_id
        |  JOIN e c ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |                               ORDER BY cos_sim DESC, cand_id) AS rank
        |  FROM scored QUALIFY rank <= 5),
        |per AS (
        |  SELECT query_id, n_rel,
        |         CAST(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
        |         round(sum(CASE WHEN c_label = q_label THEN 1.0 ELSE 0.0 END) / 5.0, 6) AS p_at_k,
        |         round(max(CASE WHEN c_label = q_label THEN 1.0 / rank ELSE 0.0 END), 6) AS rr,
        |         sum(CASE WHEN c_label = q_label THEN 1.0 / log2(rank + 1.0) ELSE 0.0 END) AS dcg_raw
        |  FROM ranked GROUP BY 1, 2),
        |ideal AS (
        |  SELECT *, CASE WHEN n_rel >= 1
        |                 THEN list_sum(list_transform(
        |                        range(1, CAST(least(5, n_rel) AS INT) + 1),
        |                        i -> 1.0 / log2(i + 1.0)))
        |                 ELSE 0.0 END AS idcg_raw
        |  FROM per)
        |SELECT query_id, n_rel, n_rel_at_k, p_at_k, rr,
        |       round(dcg_raw, 6) AS dcg,
        |       round(CASE WHEN idcg_raw > 0 THEN dcg_raw / idcg_raw
        |                  ELSE 0.0 END, 6) AS ndcg
        |FROM ideal""".stripMargin,
    "q_sparse_cosine" -> sparseCosineSql,
    // the full two-branch fusion restated: BM25 CTE verbatim from
    // q_bm25_search, cosine branch the q_knn_topk recipe, ranks from the
    // same rounded scores, RRF from integer ranks (bit-identical doubles)
    "q_hybrid_rrf" ->
      s"""WITH bm AS (${CurationOps.bm25Sql}),
         |lexh AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100),
         |lex AS (SELECT doc_id,
         |        CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS lex_rank
         |        FROM lexh),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |semh AS (SELECT e.vec_id AS doc_id,
         |         round(list_cosine_similarity(e.v, q.v), 6) AS cos
         |         FROM emb e, (SELECT v FROM emb WHERE vec_id = 0) q
         |         WHERE e.vec_id <> 0
         |         ORDER BY cos DESC, doc_id LIMIT 100),
         |sem AS (SELECT doc_id,
         |        CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INTEGER) AS sem_rank
         |        FROM semh),
         |f AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, lex_rank, sem_rank,
         |      coalesce(CAST(1 AS DOUBLE) / (lex_rank + 60), CAST(0 AS DOUBLE))
         |      + coalesce(CAST(1 AS DOUBLE) / (sem_rank + 60), CAST(0 AS DOUBLE)) AS rrf
         |      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, round(rrf, 6) AS rrf_score
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin,
    "q_knn_topk_agg" -> knnOracleSql,
    // both rankings + the overlap + the recall fraction restated exactly:
    // truncated cosine is list slicing, counts are small exact integers
    "q_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |fs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |fr AS (SELECT query_id, cand_id,
        |       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
        |       FROM fs QUALIFY rank <= 5),
        |ts AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v[1:16], c.v[1:16]), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |tr AS (SELECT query_id, cand_id,
        |       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
        |       FROM ts QUALIFY rank <= 5),
        |kept AS (SELECT f.query_id, count(*) AS n
        |         FROM fr f JOIN tr t USING (query_id, cand_id) GROUP BY 1)
        |SELECT q.vec_id AS query_id,
        |       CAST(coalesce(k.n, 0) AS BIGINT) AS n_kept,
        |       CAST(coalesce(k.n, 0) AS DOUBLE) / 5 AS recall
        |FROM (SELECT vec_id FROM e WHERE vec_id < 10) q
        |LEFT JOIN kept k ON q.vec_id = k.query_id""".stripMargin,
    "q_positive_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.label AS label,
        |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.label = c.label
        |                    AND q.vec_id <> c.vec_id)
        |SELECT query_id, cand_id, label, cos_sim,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_label_noise" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, q.label AS qlabel,
        |         c.vec_id AS cand_id, c.label AS clabel,
        |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 50 AND q.vec_id <> c.vec_id),
        |nn AS (
        |  SELECT query_id, qlabel, clabel,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY cos_sim DESC, cand_id) AS rank
        |  FROM scored QUALIFY rank <= 10)
        |SELECT query_id, qlabel,
        |       CAST(sum(CASE WHEN clabel <> qlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
        |       CAST(sum(CASE WHEN clabel <> qlabel THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS noise_frac
        |FROM nn GROUP BY 1, 2""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         c.label AS neg_label,
        |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.label <> c.label)
        |SELECT query_id, cand_id, neg_label, cos_sim,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_knn_topk" -> knnTopkSql,
    // total probe ⟹ the persisted index must reproduce brute force exactly
    "q_vector_index" -> knnTopkSql,
    // post-DML total probe = brute force over the corpus AFTER the
    // erasure (ids 3..93 gone), the negated corrections (%10=5 — float
    // negation is exact, so the widened cosines agree bit-for-bit), and
    // the appended copies (%10=7 under +1e6 ids)
    "q_vector_index_dml" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |live AS (
        |  SELECT vec_id, v FROM e0
        |  WHERE vec_id NOT IN (3,13,23,33,43,53,63,73,83,93)
        |    AND vec_id % 10 <> 5
        |  UNION ALL
        |  SELECT vec_id, list_transform(v, x -> -x) FROM e0
        |  WHERE vec_id % 10 = 5
        |  UNION ALL
        |  SELECT vec_id + 1000000, v FROM e0 WHERE vec_id % 10 = 7),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        |  FROM live q JOIN live c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT query_id, cand_id, cos_sim,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS INTEGER) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_embed_centroids" ->
      """SELECT label, CAST(i AS INTEGER) AS pos,
        |       round(avg(embedding[i]), 6) AS avg_val
        |FROM embeddings, range(1, 65) t(i)
        |GROUP BY label, i""".stripMargin,
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |             list_max(list_transform(v, x -> abs(x))) AS mx
        |      FROM e)
        |SELECT vec_id, CAST(i AS INTEGER) AS pos,
        |       CAST(CASE WHEN mx > 0
        |                 THEN floor(v[i + 1] * 127.0 / mx + 0.5)
        |                 ELSE 0 END AS INTEGER) AS qval,
        |       round(mx / 127.0, 6) AS scale
        |FROM m, range(0, 64) t(i)""".stripMargin,
    "q_knn_lsh" -> lshOracleSql(),
    "q_knn_ivf" -> annGateSql(),
    "q_knn_pq" -> annGateSql(),
    "q_knn_ivfpq" -> annGateSql(),
  )
}
