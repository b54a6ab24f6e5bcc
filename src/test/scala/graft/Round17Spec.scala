package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

/** Round 17: row-level branch-merge reconciliation — a fork file BOTH
  * sides touched merges anyway when each side's touch is marker-only and
  * the two sides' new deletion-vector markers doom provably disjoint
  * rows; anything unprovable (overlap, mixed marker kinds, different key
  * columns) keeps the honest refusal. */
class Round17Spec extends AnyFunSuite {
  import graft.TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r17_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  private def catSetup(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("merge_branch reconciles disjoint positional row edits on one fork file") {
    val root = freshDir("posok")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17p", root)
    spark.sql("""CREATE TABLE g17p.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g17p.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g17p.system.branch(table => 't', name => 'erase')")
    // both sides DV-target the SAME (single) fork file, DISJOINT rows
    spark.sql("DELETE FROM g17p.default.t WHERE k >= 15")
    spark.sql("DELETE FROM g17p.default.`t@erase` WHERE k < 5")
    spark.sql("CALL g17p.system.merge_branch(table => 't', name => 'erase')")
    val got = spark.sql("SELECT k FROM g17p.default.t")
      .collect().map(_.getLong(0)).toSet
    assert(got == (5L until 15L).toSet,
      s"both erasures must apply, got ${got.toSeq.sorted}")
    // doomed counts stayed additive: the metadata COUNT path agrees
    assert(spark.sql("SELECT count(*) FROM g17p.default.t")
      .head().getLong(0) == 10L)
    assert(ManifestTable.currentVersion(
      ManifestTable.branchDir(s"$root/t", "erase")) < 0,
      "branch must retire after a successful reconciled merge")
  }

  test("merge_branch reconciles disjoint keyed row edits on one fork file") {
    val root = freshDir("keyok")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17k", root)
    spark.sql("""CREATE TABLE g17k.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g17k.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g17k.system.branch(table => 't', name => 'gdpr')")
    spark.sql("DELETE FROM g17k.default.t WHERE k IN (15, 16, 17)")
    spark.sql("DELETE FROM g17k.default.`t@gdpr` WHERE k IN (1, 2, 3)")
    spark.sql("CALL g17k.system.merge_branch(table => 't', name => 'gdpr')")
    val got = spark.sql("SELECT k FROM g17k.default.t")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 20L).toSet -- Set(1L, 2L, 3L, 15L, 16L, 17L),
      s"both keyed erasures must apply, got ${got.toSeq.sorted}")
    // recorded doomed-live counts stay additive across the merged markers
    assert(spark.sql("SELECT count(*) FROM g17k.default.t")
      .head().getLong(0) == 14L)
  }

  test("merge_branch reconciles disjoint STRING-keyed row edits") {
    val root = freshDir("strok")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17s", root)
    spark.sql("""CREATE TABLE g17s.default.t (uid STRING, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g17s.default.t
      SELECT /*+ REPARTITION(1) */ concat('u', id), CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    spark.sql("CALL g17s.system.branch(table => 't', name => 'gdpr')")
    spark.sql("DELETE FROM g17s.default.t WHERE uid IN ('u15', 'u16')")
    spark.sql("DELETE FROM g17s.default.`t@gdpr` WHERE uid IN ('u1', 'u2')")
    spark.sql("CALL g17s.system.merge_branch(table => 't', name => 'gdpr')")
    val got = spark.sql("SELECT uid FROM g17s.default.t")
      .collect().map(_.getString(0)).toSet
    assert(got == (0 until 20).map(i => s"u$i").toSet --
      Set("u15", "u16", "u1", "u2"),
      s"both string-keyed erasures must apply, got ${got.toSeq.sorted}")
  }

  test("merge_branch refuses overlapping keyed row edits") {
    val root = freshDir("keybad")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17o", root)
    spark.sql("""CREATE TABLE g17o.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g17o.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g17o.system.branch(table => 't', name => 'gdpr')")
    spark.sql("DELETE FROM g17o.default.t WHERE k IN (3, 4)")
    spark.sql("DELETE FROM g17o.default.`t@gdpr` WHERE k IN (4, 5)")
    val e = intercept[Exception] {
      spark.sql("CALL g17o.system.merge_branch(table => 't', name => 'gdpr')")
    }
    assert(e.getMessage.contains("both sides touched"),
      s"overlapping keys must refuse, got: ${e.getMessage}")
    // the refusal left both sides intact
    assert(spark.sql("SELECT count(*) FROM g17o.default.t")
      .head().getLong(0) == 18L)
    assert(spark.sql("SELECT count(*) FROM g17o.default.`t@gdpr`")
      .head().getLong(0) == 18L)
  }

  test("merge_branch refuses mixed-kind markers even on disjoint rows") {
    val root = freshDir("mixed")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17m", root)
    // BOTH modes: `k IN (…)` deletes go keyed-MOR, predicate deletes go
    // positional — so the two sides stage markers of different kinds on
    // the same fork file, which the disjointness proof cannot compare
    spark.sql("""CREATE TABLE g17m.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor',
                     'graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g17m.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("CALL g17m.system.branch(table => 't', name => 'fix')")
    spark.sql("DELETE FROM g17m.default.t WHERE k IN (15, 16)") // keyed
    spark.sql("DELETE FROM g17m.default.`t@fix` WHERE k < 5")   // positional
    val e = intercept[Exception] {
      spark.sql("CALL g17m.system.merge_branch(table => 't', name => 'fix')")
    }
    assert(e.getMessage.contains("both sides touched"),
      s"mixed marker kinds must stay irreconcilable, got: ${e.getMessage}")
  }

  test("view DDL error shapes, table pass-through, and parse-only safety") {
    val root = freshDir("vddl")
    ManifestTable.destroy(s"$root/ord")
    catSetup("g17v", root)
    spark.sql("DROP TABLE IF EXISTS g17v.default.ord")
    spark.sql("CREATE TABLE g17v.default.ord (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO g17v.default.ord VALUES (1, 1.0), (2, 2.0)")
    spark.sql("DROP VIEW IF EXISTS g17v.default.v1")
    spark.sql("DROP VIEW IF EXISTS g17v.default.v2")
    spark.sql(
      "CREATE VIEW g17v.default.v1 AS SELECT k FROM g17v.default.ord")
    // ALTER VIEW addressed to a TABLE gets Spark's own error shape
    val et = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("ALTER VIEW g17v.default.ord SET TBLPROPERTIES ('a'='b')")
    }
    assert(et.getCondition == "EXPECT_VIEW_NOT_TABLE.USE_ALTER_TABLE",
      s"got ${et.getCondition}: ${et.getMessage}")
    // the internal resolution-decision property is reserved
    val er = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("ALTER VIEW g17v.default.v1 UNSET TBLPROPERTIES " +
        s"('${graft.sources.GraftViews.CrossCatalogHeadsProp}')")
    }
    assert(er.getCondition == "CANNOT_REMOVE_RESERVED_PROPERTY")
    // RENAME onto a taken name refuses with the view-exists shape
    spark.sql(
      "CREATE VIEW g17v.default.v2 AS SELECT k FROM g17v.default.ord")
    intercept[org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException] {
      spark.sql("ALTER VIEW g17v.default.v1 RENAME TO v2")
    }
    // EXPLAIN of a routed CREATE VIEW is parse-only: never creates
    spark.sql("EXPLAIN CREATE VIEW g17v.default.ghost AS " +
      "SELECT k FROM g17v.default.ord").collect()
    assert(!spark.sql("SHOW VIEWS IN g17v.default").collect()
      .exists(_.getString(1) == "ghost"),
      "EXPLAIN must not execute the CREATE")
    // DESCRIBE of a graft TABLE keeps its native DSv2 path
    val dt = spark.sql("DESCRIBE g17v.default.ord").collect()
    assert(dt.map(_.getString(0)).toSet.intersect(Set("k", "v")) ==
      Set("k", "v"), s"table describe stays native, got ${dt.toSeq}")
    // UNSET of a missing key is idempotent (v2 semantics)
    spark.sql("ALTER VIEW g17v.default.v1 UNSET TBLPROPERTIES ('nope')")
    // ALTER VIEW AS on a missing view refuses (ALTER, not CREATE)
    intercept[Exception] {
      spark.sql("ALTER VIEW g17v.default.missing AS SELECT 1 AS one")
    }
  }

  test("vector index DML: partial probe never serves erased vectors") {
    val res = graft.operators.SimilarityOps
      .vectorIndexSearchDml(spark, sf, nProbe = 8).collect()
    val erased = (3L to 93L by 10).toSet
    assert(res.nonEmpty)
    assert(res.forall(r => !erased.contains(r.getLong(1))),
      "erased ids must never surface in search results — the index scan " +
        "applies the deletion-vector marker")
    assert(!res.exists(_.getLong(0) == 3L),
      "an erased query id must be gone from the query set too")
    // query 7's appended copy is its exact duplicate: cosine 1.0, and its
    // re-assignment lands in the query's own top probe cell, so it ranks
    // first even under partial probing
    val top7 = res.filter(r => r.getLong(0) == 7L && r.getInt(3) == 1)
    assert(top7.length == 1 && top7.head.getLong(1) == 1000007L,
      s"the appended exact duplicate must rank first, got ${top7.toSeq}")
  }

  test("SHOW CREATE round-trips a column-list view with its comments") {
    val root = freshDir("sct")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17sc", root)
    spark.sql("DROP TABLE IF EXISTS g17sc.default.t")
    spark.sql("CREATE TABLE g17sc.default.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO g17sc.default.t VALUES (1, 1.5), (2, 2.5)")
    spark.sql("DROP VIEW IF EXISTS g17sc.default.cv")
    spark.sql("DROP VIEW IF EXISTS g17sc.default.cv2")
    // the comment carries a backslash — the round-trip must escape it
    // (Spark treats \t in a literal as a TAB)
    spark.sql("""CREATE VIEW g17sc.default.cv
      (id COMMENT 'row identity', amount) AS
      SELECT k, v FROM g17sc.default.t""")
    spark.sql("""ALTER VIEW g17sc.default.cv
      SET TBLPROPERTIES ('note' = 'path C:\\temp')""")
    val ddl = spark.sql("SHOW CREATE TABLE g17sc.default.cv")
      .head().getString(0)
    assert(ddl.contains("COMMENT 'row identity'") && ddl.contains("`id`"),
      s"the reconstructed DDL must carry the column list, got: $ddl")
    // EXECUTING the reconstructed DDL recreates an equivalent view —
    // same pinned columns, same comment, same rows
    spark.sql(ddl.replace("`cv`", "`cv2`")) // the DDL quotes identifiers
    assert(graft.sources.GraftViews.load(root, Seq("default"), "cv2")
      .get.properties.get("note").contains("path C:\\temp"),
      "a backslash-carrying property must round-trip byte-exact")
    val d2 = spark.sql("DESCRIBE g17sc.default.cv2").collect()
    assert(d2.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("id", "row identity"), ("amount", null)),
      s"round-tripped view must keep columns + comments, got ${d2.toSeq}")
    assert(spark.sql("SELECT sum(amount) FROM g17sc.default.cv2")
      .head().getDouble(0) == 4.0)
  }

  test("upsertMOR refuses NULL-keyed rows — an upsert key is a row identity") {
    import spark.implicits._
    val tbl = s"${freshDir("nullkey")}/t"
    ManifestTable.destroy(tbl)
    ManifestTable.merge(spark, tbl, Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    val bad = Seq[(java.lang.Long, Double)]((null, 9.0), (2L, 2.0))
      .toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.upsertMOR(spark, tbl, bad, "k")
    }
    assert(e.getMessage.contains("NULL 'k' key"),
      s"must name the null-key contract, got: ${e.getMessage}")
    // the refusal left the table untouched
    assert(ManifestTable.read(spark, tbl).count() == 1L)
    // NaN keys refuse with the same named contract (NaN never equals
    // itself — un-amendable; Spark orders it greatest, so it surfaces
    // as the span max instead of a bare BigDecimal NumberFormatException)
    val tbl2 = s"${freshDir("nankey")}/t"
    ManifestTable.destroy(tbl2)
    ManifestTable.merge(spark, tbl2,
      Seq((1.0, 1.0)).toDF("k", "v"), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.upsertMOR(spark, tbl2,
        Seq((Double.NaN, 9.0), (2.0, 2.0)).toDF("k", "v"), "k")
    }
    assert(e2.getMessage.contains("row identity"),
      s"NaN key must hit the named contract, got: ${e2.getMessage}")
  }

  test("a property VALUE containing the fork-point key text survives publish") {
    import spark.implicits._
    val root = freshDir("propval")
    val tbl = s"$root/t"
    ManifestTable.destroy(tbl)
    ManifestTable.merge(spark, tbl, Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    ManifestTable.createBranch(tbl, "fix")
    val bd = ManifestTable.branchDir(tbl, "fix")
    // the key-text-in-VALUE trap: an exact-KEY filter keeps this line;
    // the old whole-line contains() silently dropped it from the publish
    ManifestTable.alterAtomic(bd, Seq(ManifestTable.AlterOp.SetProp(
      "note", "see graft.branch.base semantics")))
    ManifestTable.fastForward(tbl, "fix")
    val props = ManifestTable.tableProperties(tbl,
      ManifestTable.currentVersion(tbl))
    assert(props.get("note").contains("see graft.branch.base semantics"),
      s"the publish must carry the property, got $props")
    assert(!props.contains("graft.branch.base"),
      "the branch's private fork-point marker itself must not publish")
  }

  test("declarative upsert sink refuses a mode without a key, loudly") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val root = freshDir("stuerr")
    val tbl = s"$root/sink"
    ManifestTable.destroy(tbl)
    catSetup("g17su", root)
    ManifestTable.merge(spark,
      tbl, Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    ManifestTable.alterAtomic(tbl, Seq(
      ManifestTable.AlterOp.SetProp("graft.write.mode", "upsert")))
    val e = intercept[Exception] {
      val q = spark.readStream.format("rate").option("rowsPerSecond", "5")
        .load().select($"value".as("k"), lit(2.0).as("v"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$root-ckpt")
        .trigger(Trigger.AvailableNow())
        .toTable("g17su.default.sink")
      q.awaitTermination()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
        .map(x => Option(x.getMessage).getOrElse(""))
    assert(chain(e).exists(_.contains("graft.write.key")),
      s"must name the missing key property, got: ${e.getMessage}")
  }

  test("SQL txn: a torn state is never visible through catalog-pinned reads") {
    val root = freshDir("txn")
    catSetup("g17t", root)
    spark.sql("DROP TABLE IF EXISTS g17t.default.a")
    spark.sql("DROP TABLE IF EXISTS g17t.default.b")
    spark.sql("CREATE TABLE g17t.default.a (k BIGINT)")
    spark.sql("CREATE TABLE g17t.default.b (k BIGINT)")
    spark.sql("CALL g17t.system.txn_begin()")
    spark.sql("INSERT INTO g17t.default.a SELECT id FROM range(0, 10)")
    spark.sql("INSERT INTO g17t.default.b SELECT id FROM range(0, 10)")
    spark.sql("CALL g17t.system.txn_commit(tables => 'a,b')")
    val v0 = spark.sql("CALL g17t.system.txn_version()").head().getInt(0)
    // a second transaction writes table a ONLY and never commits —
    // the catalog-pinned read must keep serving the consistent pair
    spark.sql("CALL g17t.system.txn_begin()")
    spark.sql("INSERT INTO g17t.default.a SELECT id FROM range(100, 110)")
    assert(spark.sql(
      s"SELECT count(*) FROM g17t.default.a VERSION AS OF 'catalog:$v0'")
      .head().getLong(0) == 10L,
      "uncommitted writes must stay invisible to catalog-pinned readers")
    // … while the raw table read (outside the transaction tier) sees it
    assert(spark.sql("SELECT count(*) FROM g17t.default.a")
      .head().getLong(0) == 20L)
    // commit flips the pin; the new catalog version serves both writes
    spark.sql("CALL g17t.system.txn_commit(tables => 'a,b')")
    val v1 = spark.sql("CALL g17t.system.txn_version()").head().getInt(0)
    assert(v1 == v0 + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM g17t.default.a VERSION AS OF 'catalog:$v1'")
      .head().getLong(0) == 20L)
    // pins carry forward: b kept its pin in v1 even though unchanged
    assert(spark.sql(
      s"SELECT count(*) FROM g17t.default.b VERSION AS OF 'catalog:$v1'")
      .head().getLong(0) == 10L)
  }

  test("SQL txn: commit refuses when the catalog advanced since begin") {
    val root = freshDir("txnrace")
    catSetup("g17r", root)
    spark.sql("DROP TABLE IF EXISTS g17r.default.a")
    spark.sql("CREATE TABLE g17r.default.a (k BIGINT)")
    spark.sql("INSERT INTO g17r.default.a SELECT id FROM range(0, 5)")
    spark.sql("CALL g17r.system.txn_commit(tables => 'a')")
    spark.sql("CALL g17r.system.txn_begin()")
    spark.sql("INSERT INTO g17r.default.a SELECT id FROM range(5, 10)")
    // a CONCURRENT transaction (another session — simulated through the
    // catalog API) commits first
    val croot = s"$root/.graft-catalog"
    val cur = graft.sources.Catalog.currentVersion(croot)
    require(graft.sources.Catalog.commit(croot,
      graft.sources.Catalog.snapshot(croot, cur), cur))
    val e = intercept[Exception] {
      spark.sql("CALL g17r.system.txn_commit(tables => 'a')")
    }
    assert(e.getMessage.contains("concurrent transaction"),
      s"must refuse the stale begin, got: ${e.getMessage}")
    // a fresh begin → commit then succeeds
    spark.sql("CALL g17r.system.txn_begin()")
    spark.sql("CALL g17r.system.txn_commit(tables => 'a')")
    val v = spark.sql("CALL g17r.system.txn_version()").head().getInt(0)
    assert(spark.sql(
      s"SELECT count(*) FROM g17r.default.a VERSION AS OF 'catalog:$v'")
      .head().getLong(0) == 10L)
  }

  test("txn_history: pin matrix, carry-forward, alias normalization, empty case") {
    val root = freshDir("txnh")
    catSetup("g17h", root)
    // empty catalog: zero rows, not an error
    assert(spark.sql("CALL g17h.system.txn_history()").collect().isEmpty)
    spark.sql("DROP TABLE IF EXISTS g17h.default.a")
    spark.sql("DROP TABLE IF EXISTS g17h.default.b")
    spark.sql("CREATE TABLE g17h.default.a (k BIGINT)")
    spark.sql("CREATE TABLE g17h.default.b (k BIGINT)")
    spark.sql("INSERT INTO g17h.default.a SELECT id FROM range(0, 5)")
    spark.sql("INSERT INTO g17h.default.b SELECT id FROM range(0, 5)")
    // the SAME physical table committed under an unnormalized alias and
    // the plain name must land ONE pin key, never two contradictory ones
    spark.sql("CALL g17h.system.txn_commit(tables => 'default.a,b')")
    spark.sql("INSERT INTO g17h.default.a SELECT id FROM range(5, 9)")
    spark.sql("CALL g17h.system.txn_commit(tables => 'a')")
    val hist = spark.sql("CALL g17h.system.txn_history()").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(hist == Set((0, "a", 1), (0, "b", 1), (1, "a", 2), (1, "b", 1)),
      s"pin matrix with carry-forward and one normalized key, got $hist")
    // the pinned read resolves the carried pin, not the moved table
    assert(spark.sql(
      "SELECT count(*) FROM g17h.default.a VERSION AS OF 'catalog:0'")
      .head().getLong(0) == 5L)
    assert(spark.sql(
      "SELECT count(*) FROM g17h.default.a VERSION AS OF 'catalog:1'")
      .head().getLong(0) == 9L)
  }

  test("mixed-case catalog head matches Spark's case-sensitive routing") {
    val root = freshDir("case")
    catSetup("g17case", root)
    val cm = spark.sessionState.catalogManager
    val before = cm.currentCatalog.name()
    try {
      spark.sql("USE spark_catalog")
      // conf keys are case-sensitive, exactly like Spark's own catalog
      // resolution: the upper-cased head must NOT route into g17case —
      // it fails like any unknown catalog/schema, never silently creates
      intercept[Exception] {
        spark.sql("CREATE VIEW G17CASE.default.v AS SELECT 1 AS one")
      }
      assert(graft.sources.GraftViews.load(root, Seq("default"), "v").isEmpty,
        "a mixed-case head must not silently route into the catalog")
      // the exact-case head routes
      spark.sql("DROP VIEW IF EXISTS g17case.default.v")
      spark.sql("CREATE VIEW g17case.default.v AS SELECT 1 AS one")
      assert(graft.sources.GraftViews.load(root, Seq("default"),
        "v").isDefined)
    } finally spark.sql(s"USE $before")
  }

  test("merge_branch refuses keyed edits on different key columns") {
    val root = freshDir("cols")
    ManifestTable.destroy(s"$root/t")
    catSetup("g17c", root)
    spark.sql("""CREATE TABLE g17c.default.t (k BIGINT, j BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g17c.default.t
      SELECT /*+ REPARTITION(1) */ id, id + 100, CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    spark.sql("CALL g17c.system.branch(table => 't', name => 'fix')")
    spark.sql("DELETE FROM g17c.default.t WHERE k IN (15, 16)")
    spark.sql("DELETE FROM g17c.default.`t@fix` WHERE j IN (101, 102)")
    val e = intercept[Exception] {
      spark.sql("CALL g17c.system.merge_branch(table => 't', name => 'fix')")
    }
    assert(e.getMessage.contains("both sides touched"),
      "different key columns doom by values the proof cannot compare — " +
        s"must refuse, got: ${e.getMessage}")
  }
}
