package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

/** Round 16: three-way branch merge past fastForward's diverged-main
  * refusal, the exactly-once streaming MOR upsert, and the driver-gate
  * graduation of the last rows-only queries (ANN recall gates, ML metric
  * gates, the BPE-train and LSH full oracles). */
class Round16Spec extends AnyFunSuite {
  import graft.TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r16_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  test("merge_branch folds a diverged branch when file sets are disjoint") {
    val root = freshDir("mrg")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16m",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16m.root", root)
    spark.sql("""CREATE TABLE g16m.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g16m.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g16m.system.branch(table => 't', name => 'fix')")
    // main ADVANCES past the fork (append only — touches no fork file) …
    spark.sql("""INSERT INTO g16m.default.t
      SELECT id, CAST(id AS DOUBLE) FROM range(200, 205)""")
    // … while the branch erases and corrects against the fork snapshot
    spark.sql("DELETE FROM g16m.default.`t@fix` WHERE k < 5")
    spark.sql("""INSERT INTO g16m.default.`t@fix`
      SELECT id, CAST(id AS DOUBLE) FROM range(100, 105)""")
    // the diverged main refuses a plain publish …
    val ff = intercept[Exception] {
      spark.sql("CALL g16m.system.fastforward(table => 't', name => 'fix')")
    }
    assert(ff.getMessage.contains("advanced past its fork point"),
      s"fastforward must refuse the diverged main, got: ${ff.getMessage}")
    // … but the three-way merge replays the branch delta onto main's head
    spark.sql("CALL g16m.system.merge_branch(table => 't', name => 'fix')")
    val got = spark.sql("SELECT k FROM g16m.default.t")
      .collect().map(_.getLong(0)).toSet
    val want = (5L until 20L).toSet ++ (100L until 105L) ++ (200L until 205L)
    assert(got == want, s"merged content: got ${got.toSeq.sorted}")
    // the branch retired with the publish
    assert(ManifestTable.currentVersion(
      ManifestTable.branchDir(s"$root/t", "fix")) < 0,
      "branch must retire after a successful merge")
  }

  test("merge_branch re-run after a crashed retire is a no-op, not a refusal") {
    import java.nio.file.{Files, Path, Paths}
    def copyTree(from: Path, to: Path): Unit = {
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else { Files.createDirectories(dst.getParent); Files.copy(p, dst) }
      }
    }
    val root = freshDir("rerun")
    val dir = s"$root/t"
    ManifestTable.destroy(dir)
    spark.conf.set("spark.sql.catalog.g16r",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16r.root", root)
    spark.sql("""CREATE TABLE g16r.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g16r.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g16r.system.branch(table => 't', name => 'fix')")
    spark.sql("""INSERT INTO g16r.default.t
      SELECT id, CAST(id AS DOUBLE) FROM range(200, 205)""")
    // a DML branch: removals AND new deletion vectors in the delta
    spark.sql("DELETE FROM g16r.default.`t@fix` WHERE k < 5")
    spark.sql("""INSERT INTO g16r.default.`t@fix`
      SELECT id, CAST(id AS DOUBLE) FROM range(100, 105)""")
    val bd = Paths.get(ManifestTable.branchDir(dir, "fix"))
    val saved = Paths.get(s"$root/.saved_branch")
    copyTree(bd, saved)
    spark.sql("CALL g16r.system.merge_branch(table => 't', name => 'fix')")
    val v1 = ManifestTable.currentVersion(dir)
    val want = spark.sql("SELECT k FROM g16r.default.t")
      .collect().map(_.getLong(0)).sorted.toSeq
    // simulate a crash BETWEEN the publish CAS and the retire: the branch
    // directory is still on disk while main already carries the delta
    copyTree(saved, bd)
    spark.sql("CALL g16r.system.merge_branch(table => 't', name => 'fix')")
    assert(ManifestTable.currentVersion(dir) == v1,
      "re-running a fully-applied merge must not commit")
    val got = spark.sql("SELECT k FROM g16r.default.t")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "re-run must not duplicate or drop rows")
    assert(ManifestTable.currentVersion(bd.toString) < 0,
      "the re-run must retire the stranded branch")
  }

  test("a removal-only branch delta never passes for already-applied") {
    // the ambiguity the positive-signal rule exists for: main removed the
    // same fork file INDEPENDENTLY (its own COW delete), so the branch's
    // delete-everything delta looks "applied" by negative space — the
    // merge must refuse with the conflict, never silently retire
    val root = freshDir("negsp")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16n",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16n.root", root)
    spark.sql("CREATE TABLE g16n.default.t (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO g16n.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g16n.system.branch(table => 't', name => 'wipe')")
    spark.sql("DELETE FROM g16n.default.t WHERE k < 5") // COW: rewrites the file
    spark.sql("DELETE FROM g16n.default.`t@wipe` WHERE k >= 0") // removal-only delta
    val e = intercept[Exception] {
      spark.sql("CALL g16n.system.merge_branch(table => 't', name => 'wipe')")
    }
    assert(e.getMessage.contains("both sides touched"),
      s"removal-only delta must refuse, got: ${e.getMessage}")
    assert(spark.sql("SELECT count(*) FROM g16n.default.t")
      .head().getLong(0) == 15L, "main must keep its own survivors")
  }

  test("fastforward re-run after a crashed retire returns the head and retires") {
    import java.nio.file.{Files, Path, Paths}
    def copyTree(from: Path, to: Path): Unit = {
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else { Files.createDirectories(dst.getParent); Files.copy(p, dst) }
      }
    }
    val root = freshDir("ffrr")
    val dir = s"$root/t"
    ManifestTable.destroy(dir)
    spark.conf.set("spark.sql.catalog.g16w",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16w.root", root)
    spark.sql("CREATE TABLE g16w.default.t (k BIGINT)")
    spark.sql("INSERT INTO g16w.default.t SELECT id FROM range(0, 10)")
    spark.sql("CALL g16w.system.branch(table => 't', name => 'wap')")
    spark.sql("INSERT INTO g16w.default.`t@wap` SELECT id FROM range(10, 15)")
    val bd = Paths.get(ManifestTable.branchDir(dir, "wap"))
    val saved = Paths.get(s"$root/.saved_ff")
    copyTree(bd, saved)
    spark.sql("CALL g16w.system.fastforward(table => 't', name => 'wap')")
    val v1 = ManifestTable.currentVersion(dir)
    copyTree(saved, bd) // crash window: published but never retired
    spark.sql("CALL g16w.system.fastforward(table => 't', name => 'wap')")
    assert(ManifestTable.currentVersion(dir) == v1,
      "re-running a landed publish must not commit")
    assert(spark.sql("SELECT count(*) FROM g16w.default.t")
      .head().getLong(0) == 15L)
    assert(ManifestTable.currentVersion(bd.toString) < 0,
      "the re-run must retire the stranded branch")
  }

  test("merge_branch refuses with the conflict list when both sides touch a file") {
    val root = freshDir("cfl")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16c",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16c.root", root)
    spark.sql("""CREATE TABLE g16c.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g16c.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g16c.system.branch(table => 't', name => 'fix')")
    // both sides DV-target the SAME (single) fork file with OVERLAPPING
    // rows (k=3,4 doomed by both) — since round 17 disjoint-row marker
    // pairs reconcile (Round17Spec), so the refusal contract pins on a
    // genuine row overlap
    spark.sql("DELETE FROM g16c.default.t WHERE k < 5")
    spark.sql("DELETE FROM g16c.default.`t@fix` WHERE k >= 3 AND k < 8")
    val e = intercept[Exception] {
      spark.sql("CALL g16c.system.merge_branch(table => 't', name => 'fix')")
    }
    assert(e.getMessage.contains("both sides touched"),
      s"conflict must refuse with the touched-file list, got: ${e.getMessage}")
    // refusal leaves BOTH sides intact: main serves its own delete,
    // the branch stays addressable and re-mergeable after a re-cut
    assert(spark.sql("SELECT count(*) FROM g16c.default.t")
      .head().getLong(0) == 15L)
    assert(spark.sql("SELECT count(*) FROM g16c.default.`t@fix`")
      .head().getLong(0) == 15L)
  }

  test("merge_branch refuses when both sides changed table metadata") {
    val root = freshDir("meta")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16t",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16t.root", root)
    spark.sql("CREATE TABLE g16t.default.t (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO g16t.default.t
      SELECT id, CAST(id AS DOUBLE) FROM range(0, 10)""")
    spark.sql("CALL g16t.system.branch(table => 't', name => 'fix')")
    spark.sql("ALTER TABLE g16t.default.t SET TBLPROPERTIES ('who' = 'main')")
    ManifestTable.alterAtomic(ManifestTable.branchDir(s"$root/t", "fix"),
      Seq(ManifestTable.AlterOp.SetProp("who", "branch")))
    val e = intercept[Exception] {
      spark.sql("CALL g16t.system.merge_branch(table => 't', name => 'fix')")
    }
    assert(e.getMessage.contains("changed table metadata"),
      s"metadata conflict must refuse, got: ${e.getMessage}")
  }

  test("merge_branch on an unmoved main behaves like a publish") {
    val root = freshDir("ffeq")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16f",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16f.root", root)
    spark.sql("CREATE TABLE g16f.default.t (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO g16f.default.t
      SELECT id, CAST(id AS DOUBLE) FROM range(0, 10)""")
    spark.sql("CALL g16f.system.branch(table => 't', name => 'wap')")
    spark.sql("""INSERT INTO g16f.default.`t@wap`
      SELECT id, CAST(id AS DOUBLE) FROM range(10, 15)""")
    spark.sql("CALL g16f.system.merge_branch(table => 't', name => 'wap')")
    assert(spark.sql("SELECT count(*) FROM g16f.default.t")
      .head().getLong(0) == 15L)
  }

  test("upsertMOR epoch guard: a replayed epoch no-ops before staging") {
    import spark.implicits._
    val tbl = freshDir("epoch")
    ManifestTable.merge(spark, tbl,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"))
    val v0 = ManifestTable.currentVersion(tbl)
    val batch = Seq((1L, 10.0)).toDF("k", "v")
    val v1 = ManifestTable.upsertMOR(spark, tbl, batch, "k",
      epoch = Some(("q16", 3L)))
    assert(v1 == v0 + 1)
    // same epoch again (redelivery): must return without committing
    val v2 = ManifestTable.upsertMOR(spark, tbl, batch, "k",
      epoch = Some(("q16", 3L)))
    assert(v2 == v1 && ManifestTable.currentVersion(tbl) == v1,
      "a replayed epoch must be a metadata-only no-op")
    // an EARLIER epoch too (out-of-order redelivery)
    val v3 = ManifestTable.upsertMOR(spark, tbl, batch, "k",
      epoch = Some(("q16", 1L)))
    assert(v3 == v1 && ManifestTable.currentVersion(tbl) == v1)
    // the next epoch commits, and the upsert landed exactly once
    val v4 = ManifestTable.upsertMOR(spark, tbl,
      Seq((2L, 20.0)).toDF("k", "v"), "k", epoch = Some(("q16", 4L)))
    assert(v4 == v1 + 1)
    val got = ManifestTable.read(spark, tbl).as[(Long, Double)]
      .collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0), s"got $got")
  }

  test("streaming MOR upsert equals the batch restatement (replay no-ops)") {
    import org.apache.spark.sql.functions._
    val got = streaming.StreamingOps.streamMorUpsert(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val want = Tables.events(spark, sf)
      .withColumn("value", when(col("event_type") === "click",
        col("value") + 1000.0).otherwise(col("value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == want, s"got $got\nwant $want")
  }

  test("ANN recall gates: TRUE flags over real anchors at the spec fixture") {
    import org.apache.spark.sql.functions.{round, sum}
    import spark.implicits._
    for (q <- Seq("q_knn_ivf", "q_knn_pq", "q_knn_ivfpq")) {
      val row = SparkEntry.queries(q)(spark, sf).head()
      assert(row.getAs[Long]("n_queries") == 10L, s"$q n_queries")
      assert(row.getAs[Boolean]("recall_ok"), s"$q recall below its floor")
      // the anchor is real: recompute the exact top-k micros sum
      val micros = operators.SimilarityOps.knnBruteForce(spark, sf)
        .select(round($"cos_sim" * 1e6, 0).cast("long").as("m"))
        .agg(sum($"m")).head().getLong(0)
      assert(row.getAs[Long]("exact_sim_sum_micros") == micros, s"$q anchor")
    }
  }

  test("ML gates: metric flags hold and anchors match the corpus") {
    val lr = SparkEntry.queries("q_ml_fare_lr")(spark, sf).head()
    assert(lr.getAs[Long]("n_total") == Tables.lineitem(spark, sf).count())
    assert(lr.getAs[Boolean]("split_ok") && lr.getAs[Boolean]("r2_ok") &&
      lr.getAs[Boolean]("rmse_ok"))
    val cv = SparkEntry.queries("q_ml_cv")(spark, sf).head()
    assert(cv.getAs[Boolean]("reg_in_grid") && cv.getAs[Boolean]("en_in_grid")
      && cv.getAs[Boolean]("cv_rmse_ok"))
    val gbt = SparkEntry.queries("q_ml_demand_gbt")(spark, sf).head()
    val hours = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")),
        org.apache.spark.sql.functions.col("event_type")).count().count()
    assert(gbt.getAs[Long]("n_hours") == hours, "demand anchor")
    assert(gbt.getAs[Boolean]("split_ok") && gbt.getAs[Boolean]("rmse_ok") &&
      gbt.getAs[Boolean]("mae_le_rmse"))
  }

  test("bpe train oracle registers dynamically with the learned rules inline") {
    val rules = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
    assert(rules.length == 5)
    val o = SparkEntry.oracleSql
    assert(o.contains("q_bpe_train"), "q_bpe_train oracle must register")
    // each round recounts under exactly the PREFIX rules, so rules 1..4
    // appear as rewrite literals (the final rule is only ever an OUTPUT —
    // nothing rewrites with it)
    rules.filter(_.getInt(0) < rules.length).foreach { r =>
      assert(o("q_bpe_train").contains(s"'${r.getString(1)}'") &&
        o("q_bpe_train").contains(s"'${r.getString(2)}'"),
        s"prefix rule ${r.getString(1)}+${r.getString(2)} missing from oracle")
    }
    assert(o("q_bpe_train").contains("UNION ALL"))
  }

  test("SQL view DDL routes to the graft catalog; session statements pass through") {
    val root = freshDir("vddl")
    ManifestTable.destroy(s"$root/t")
    spark.conf.set("spark.sql.catalog.g16v",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g16v.root", root)
    spark.sql("CREATE TABLE g16v.default.t (k BIGINT)")
    spark.sql("INSERT INTO g16v.default.t VALUES (1), (2), (3)")
    spark.sql("CREATE VIEW g16v.default.big AS " +
      "SELECT k FROM g16v.default.t WHERE k >= 2")
    assert(spark.sql("SELECT sum(k) FROM g16v.default.big")
      .head().getLong(0) == 5L)
    // SHOW VIEWS lists it with the standard 3-column shape
    val shown = spark.sql("SHOW VIEWS IN g16v.default").collect()
    assert(shown.exists(r => r.getString(1) == "big" && !r.getBoolean(2)))
    // LIKE pattern filters
    assert(spark.sql("SHOW VIEWS IN g16v.default LIKE 'nope*'")
      .collect().isEmpty)
    // plain CREATE VIEW refuses a taken name; IF NOT EXISTS no-ops
    intercept[Exception] {
      spark.sql("CREATE VIEW g16v.default.big AS SELECT 1 AS x")
    }
    spark.sql("CREATE VIEW IF NOT EXISTS g16v.default.big AS SELECT 1 AS x")
    assert(spark.sql("SELECT sum(k) FROM g16v.default.big")
      .head().getLong(0) == 5L, "IF NOT EXISTS must keep the original body")
    // DROP VIEW removes it; a second DROP refuses unless IF EXISTS
    spark.sql("DROP VIEW g16v.default.big")
    intercept[Exception] { spark.sql("DROP VIEW g16v.default.big") }
    spark.sql("DROP VIEW IF EXISTS g16v.default.big")
    // only the PERSISTENT rows are gone — SHOW VIEWS still lists the
    // session's temp views (the SQL contract), which the shared test
    // session accumulates from other suites
    assert(spark.sql("SHOW VIEWS IN g16v.default").collect()
      .filterNot(_.getBoolean(2)).isEmpty)
    // session-catalog view statements are untouched by the router
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW r16_tmpv AS SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM r16_tmpv").head().getInt(0) == 7)
    // 1-part, 2-part (<ns>.<view>) and bare SHOW VIEWS all route against
    // the CURRENT catalog (Spark's catalog-first multipart rule)
    try {
      spark.sql("USE g16v.default")
      spark.sql("CREATE VIEW small AS SELECT k FROM g16v.default.t WHERE k = 1")
      assert(spark.sql("SHOW VIEWS").collect()
        .exists(_.getString(1) == "small"))
      assert(spark.sql("SELECT k FROM g16v.default.small")
        .head().getLong(0) == 1L)
      spark.sql("DROP VIEW small")
      spark.sql("CREATE VIEW default.small2 AS " +
        "SELECT k FROM g16v.default.t WHERE k = 2")
      assert(spark.sql("SELECT k FROM g16v.default.small2")
        .head().getLong(0) == 2L)
      assert(spark.sql("SHOW VIEWS IN default").collect()
        .exists(_.getString(1) == "small2"))
      spark.sql("DROP VIEW default.small2")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("doc gates: unit-norm flags and the tfidf recall floor hold") {
    val emb = SparkEntry.queries("q_doc_embed")(spark, sf)
    val bad = emb.filter("NOT norm_ok OR NOT nnz_ok").count()
    assert(bad == 0, s"$bad docs violate the embedding invariants")
    val knn = SparkEntry.queries("q_doc_knn")(spark, sf).head()
    assert(knn.getAs[Long]("n_queries") == 5L)
    assert(knn.getAs[Boolean]("recall_ok"),
      "hashed ANN must recall the exact sparse tfidf top-k above the floor")
  }
}
