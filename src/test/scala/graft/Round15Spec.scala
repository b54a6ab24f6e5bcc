package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

/** Round 15: roaring-bitmap positional deletion vectors + the
  * branch/clone name-convention fix.
  *
  * The round-14 positions parquet recorded 8 bytes per doomed ordinal
  * and keyed both the marker's target set and the `_file` values by
  * BASENAME — but branch/clone manifests reference their source's data
  * files by ABSOLUTE path, so a positional DELETE on a branch committed
  * a marker matching no manifest name (silently resurrecting the rows)
  * and a cloned positional table's metadata COUNT overcounted. Round 15
  * stores run-optimized roaring bitmaps (one row per target file,
  * ~1-2 bits per doomed row dense — the Iceberg-v3 puffin DV shape),
  * records marker targets in the committer's manifest-name convention,
  * and normalizes every positions lookup to the file's basename. */
class Round15Spec extends AnyFunSuite {
  import graft.TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r15_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  test("positional DELETE on a branch dooms rows that STAY deleted") {
    val root = freshDir("pbr")
    val dir = s"$root/t"
    spark.conf.set("spark.sql.catalog.g15pb",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15pb.root", root)
    spark.sql("""CREATE TABLE g15pb.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g15pb.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    spark.sql("CALL g15pb.system.branch(table => 't', name => 'wap')")
    // the branch's manifest references the SOURCE's data file by
    // absolute path; a positional DELETE on it must publish a marker
    // whose target matches that absolute manifest name
    spark.sql("DELETE FROM g15pb.default.`t@wap` WHERE k < 5")
    val bd = ManifestTable.branchDir(dir, "wap")
    val bv = ManifestTable.currentVersion(bd)
    val bNames = ManifestTable.listFiles(bd, bv).toSet
    assert(bNames.forall(_.startsWith("/")),
      s"branch v0 references must be absolute, got $bNames")
    val marks = ManifestTable.dvEntries(bd, bv)
    assert(marks.exists(_.col == "_pos"),
      "the branch DELETE must publish a positional marker, not rewrite")
    assert(marks.flatMap(_.targets).toSet.subsetOf(bNames),
      s"marker targets ${marks.flatMap(_.targets)} must match branch " +
        s"manifest names $bNames")
    // deleted rows stay deleted on the branch …
    assert(spark.sql("SELECT k FROM g15pb.default.`t@wap`")
      .collect().map(_.getLong(0)).toSet == (5L until 20L).toSet,
      "branch rows under an absolute-named positional marker")
    // … the metadata COUNT(*) tier serves the LIVE count (the abs-name
    // lookup normalizes to the basename the positions file records) …
    assert(spark.sql("SELECT count(*) FROM g15pb.default.`t@wap`")
      .head().getLong(0) == 15L)
    // … and main never sees the branch's delete
    assert(spark.sql("SELECT count(*) FROM g15pb.default.t")
      .head().getLong(0) == 20L)
    ManifestTable.destroy(root)
  }

  test("clone of a positional table serves exact rows and counts") {
    val root = freshDir("pcl")
    val dir = s"$root/t"
    spark.conf.set("spark.sql.catalog.g15pc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15pc.root", root)
    spark.sql("""CREATE TABLE g15pc.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g15pc.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    spark.sql("DELETE FROM g15pc.default.t WHERE k < 4")
    // shallow-clone: the clone's marker targets re-point into the source
    // absolutely; its positions lookups must still land (basenames)
    ManifestTable.cloneTable(dir, s"$root/c")
    assert(spark.sql("SELECT k FROM g15pc.default.c")
      .collect().map(_.getLong(0)).toSet == (4L until 20L).toSet)
    // scan-path count (predicate defeats the metadata tier)
    assert(spark.sql("SELECT count(*) FROM g15pc.default.c WHERE v >= 0")
      .head().getLong(0) == 16L)
    // metadata-path count — round 14 OVERCOUNTED here (abs target vs
    // basename-keyed positions)
    assert(spark.sql("SELECT count(*) FROM g15pc.default.c")
      .head().getLong(0) == 16L)
    // history's live-row arithmetic crosses the clone the same way
    val hist = ManifestTable.history(spark, s"$root/c")
      .orderBy("version").collect()
    assert(hist.last.getLong(3) == 16L,
      s"clone history live rows: ${hist.mkString(", ")}")
    ManifestTable.destroy(root)
  }

  test("bitmap DVs lift the ordinal budget; bytes are the loud bound") {
    val root = freshDir("pbu")
    spark.conf.set("spark.sql.catalog.g15bu",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15bu.root", root)
    spark.sql("""CREATE TABLE g15bu.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g15bu.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE)
      FROM range(0, 100)""")
    // round 14 refused a positional statement dooming more ordinals
    // than graft.dv.maxKeys; bitmaps decouple from the ordinal count —
    // the same statement now succeeds (15 doomed rows ≫ a 10-"key"
    // budget, but a few bytes of run-length bitmap)
    sys.props("graft.dv.maxKeys") = "10"
    try {
      spark.sql("DELETE FROM g15bu.default.t WHERE k < 15")
      assert(spark.sql("SELECT count(*) FROM g15bu.default.t")
        .head().getLong(0) == 85L)
    } finally sys.props -= "graft.dv.maxKeys"
    // the byte budget refuses loudly at write time — the statement
    // aborts, nothing publishes, the table still answers
    sys.props("graft.dv.maxBytes") = "4"
    try {
      val e = intercept[Throwable] {
        spark.sql("DELETE FROM g15bu.default.t WHERE k >= 90")
      }
      def messages(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
      assert(messages(e).contains("graft.dv.maxBytes"),
        s"expected the byte-budget refusal, got: ${messages(e)}")
    } finally sys.props -= "graft.dv.maxBytes"
    assert(spark.sql("SELECT count(*) FROM g15bu.default.t")
      .head().getLong(0) == 85L,
      "the refused statement must not have published anything")
    spark.sql("DELETE FROM g15bu.default.t WHERE k >= 90")
    assert(spark.sql("SELECT count(*) FROM g15bu.default.t")
      .head().getLong(0) == 75L)
    ManifestTable.destroy(root)
  }

  test("partition-spec evolution: degrade SPJ honestly, rebucket re-arms") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
      SortMergeJoinExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(nodes) ++ (p match {
        case q: QueryStageExec => nodes(q.plan)
        case _ => Seq.empty
      }))
    def joinShuffles(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joins = nodes(plan).filter(n => n.isInstanceOf[SortMergeJoinExec] ||
        n.isInstanceOf[ShuffledHashJoinExec])
      (joins.size,
        joins.flatMap(_.children.flatMap(nodes))
          .count(_.isInstanceOf[ShuffleExchangeLike]))
    }
    val root = freshDir("pse")
    val dir = s"$root/ord"
    spark.conf.set("spark.sql.catalog.g15pe",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15pe.root", root)
    val prevBucketing = spark.conf
      .get("spark.sql.sources.v2.bucketing.enabled", "false")
    val prevPush = spark.conf
      .get("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "false")
    val prevBroadcast = spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("""CREATE TABLE g15pe.default.ord (k BIGINT, p DOUBLE)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("""CREATE TABLE g15pe.default.cust (k BIGINT, b DOUBLE)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("""INSERT INTO g15pe.default.ord
        SELECT id, CAST(id AS DOUBLE) FROM range(0, 200)""")
      spark.sql("""INSERT INTO g15pe.default.cust
        SELECT id, CAST(-id AS DOUBLE) FROM range(0, 200)""")
      def theJoin = spark.sql("""SELECT o.k, o.p, c.b
        FROM g15pe.default.ord o JOIN g15pe.default.cust c ON o.k = c.k""")
      val want = (0L until 200L).map(k =>
        Seq[Any](k, k.toDouble, -k.toDouble)).toSet
      val (j0, s0) = joinShuffles(theJoin)
      assert(j0 == 1 && s0 == 0,
        s"co-bucketed baseline must be shuffle-free: $j0 joins $s0 shuffles")
      // EVOLVE the spec (different modulus): the commit must strike the
      // stale bucket ids — grouping 4-bucket files under an 8-bucket
      // transform would MIS-GROUP the join
      spark.sql("""ALTER TABLE g15pe.default.ord
        SET TBLPROPERTIES ('graft.partitioning' = 'bucket(8,k)')""")
      val v1 = ManifestTable.currentVersion(dir)
      assert(ManifestTable.listLines(dir, v1).map(ManifestTable.parseEntry)
        .forall(_.bucket.isEmpty),
        "evolving the bucket transform must strike stale bucket ids")
      val (j1, s1) = joinShuffles(theJoin)
      assert(j1 == 1 && s1 > 0,
        s"the degraded join must shuffle, never mis-group: $s1 shuffles")
      assert(theJoin.collect().map(_.toSeq).toSet == want,
        "answers are invariant across the evolution")
      // evolve the other side + rebucket BOTH to the new spec → re-armed
      spark.sql("""ALTER TABLE g15pe.default.cust
        SET TBLPROPERTIES ('graft.partitioning' = 'bucket(8,k)')""")
      spark.sql("CALL g15pe.system.rebucket(table => 'ord')")
      spark.sql("CALL g15pe.system.rebucket(table => 'cust')")
      val (j2, s2) = joinShuffles(theJoin)
      assert(j2 == 1 && s2 == 0,
        s"rebucket must re-arm the SPJ: $j2 joins $s2 shuffles")
      assert(theJoin.collect().map(_.toSeq).toSet == want)
      // identity evolution composes; a spec naming an absent column and
      // an unparseable spec both refuse loudly
      spark.sql("""ALTER TABLE g15pe.default.ord
        SET TBLPROPERTIES ('graft.partitioning' = 'identity(p);bucket(8,k)')""")
      assert(theJoin.collect().map(_.toSeq).toSet == want)
      val e = intercept[Throwable] { spark.sql("""ALTER TABLE
        g15pe.default.ord SET TBLPROPERTIES
        ('graft.partitioning' = 'identity(nope)')""") }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      assert(msgs(e).contains("does not exist"), msgs(e))
      val e2 = intercept[Throwable] { spark.sql("""ALTER TABLE
        g15pe.default.ord SET TBLPROPERTIES
        ('graft.partitioning' = 'garbage')""") }
      assert(msgs(e2).contains("unparseable"), msgs(e2))
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prevBucketing)
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        prevPush)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
    ManifestTable.destroy(root)
  }

  test("keyed-MOR markers price their dooms: COUNT/history/LIMIT served") {
    val root = freshDir("kmc")
    val dir = s"$root/t"
    spark.conf.set("spark.sql.catalog.g15km",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15km.root", root)
    spark.sql("""CREATE TABLE g15km.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g15km.default.t
      SELECT /*+ REPARTITION(4) */ id, CAST(id AS DOUBLE)
      FROM range(0, 100)""")
    // two OVERLAPPING keyed MOR deletes: the second's count is priced
    // against the first's live view, so key 3 never double-subtracts
    spark.sql("DELETE FROM g15km.default.t WHERE k IN (1, 2, 3)")
    spark.sql("DELETE FROM g15km.default.t WHERE k IN (3, 50)")
    val marks = ManifestTable.dvEntries(dir, ManifestTable.currentVersion(dir))
    assert(marks.size == 2 && marks.forall(_.fullyCounted),
      s"both keyed markers must carry complete counts: $marks")
    val cnt = spark.sql("SELECT count(*) FROM g15km.default.t")
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata agg"),
      s"counted keyed markers must keep COUNT(*) metadata-served:\n" +
        cnt.queryExecution.executedPlan)
    assert(cnt.head().getLong(0) == 96L)
    // history's live-row arithmetic serves through keyed counts too
    val hist = ManifestTable.history(spark, dir).orderBy("version").collect()
    assert(!hist.last.isNullAt(3) && hist.last.getLong(3) == 96L,
      s"keyed-MOR history live rows: ${hist.mkString(", ")}")
    // the LIMIT file-prefix stays armed: per-file live counts are exact
    val lim = spark.sql("SELECT k FROM g15km.default.t LIMIT 3")
    assert(lim.queryExecution.executedPlan.toString.matches(
        "(?s).*files [123]/4.*"),
      s"counted keyed markers must keep the LIMIT prefix armed:\n" +
        lim.queryExecution.executedPlan)
    assert(lim.collect().length == 3)
    // a MOR upsert prices its marker the same way (dooms 60, adds 2)
    import spark.implicits._
    ManifestTable.upsertMOR(spark, dir,
      Seq((60L, -1.0), (200L, -2.0)).toDF("k", "v"), "k")
    val cnt2 = spark.sql("SELECT count(*) FROM g15km.default.t")
    assert(cnt2.queryExecution.executedPlan.toString.contains("metadata agg"))
    assert(cnt2.head().getLong(0) == 97L)
    // consolidation merges counts per target (sums stay exact)
    spark.sql("CALL g15km.system.rewrite_dvs(table => 't')")
    val cnt3 = spark.sql("SELECT count(*) FROM g15km.default.t")
    assert(cnt3.queryExecution.executedPlan.toString.contains("metadata agg"),
      "consolidated counted markers must stay metadata-served")
    assert(cnt3.head().getLong(0) == 97L)
    assert(spark.sql("SELECT count(*) FROM g15km.default.t WHERE v >= -2.0")
      .head().getLong(0) == 97L, "the scan path agrees")
    ManifestTable.destroy(root)
  }

  test("branch publish carries DV and rename markers: WAP with DML") {
    val root = freshDir("wap")
    val dir = s"$root/t"
    spark.conf.set("spark.sql.catalog.g15wp",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15wp.root", root)
    spark.sql("""CREATE TABLE g15wp.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('graft.dml.mode' = 'positional')""")
    spark.sql("""INSERT INTO g15wp.default.t
      SELECT /*+ REPARTITION(1) */ id, CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    spark.sql("CALL g15wp.system.branch(table => 't', name => 'wap')")
    // the audited changes: a positional DELETE (zero rewrites — the
    // shape a GDPR erasure audit actually stages), an UPDATE, an
    // append, and a column rename — all on the branch
    spark.sql("DELETE FROM g15wp.default.`t@wap` WHERE k < 3")
    spark.sql("UPDATE g15wp.default.`t@wap` SET v = -1.0 WHERE k = 10")
    spark.sql("""INSERT INTO g15wp.default.`t@wap`
      SELECT id, CAST(id AS DOUBLE) FROM range(100, 103)""")
    spark.sql("ALTER TABLE g15wp.default.`t@wap` RENAME COLUMN v TO price")
    val want = ((3L until 20L).map(k =>
      k -> (if (k == 10) -1.0 else k.toDouble)) ++
      (100L until 103L).map(k => k -> k.toDouble)).toMap
    assert(spark.sql("SELECT k, price FROM g15wp.default.`t@wap`")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == want)
    // main is untouched until the audit passes …
    assert(spark.sql("SELECT count(*) FROM g15wp.default.t")
      .head().getLong(0) == 20L)
    // … then the publish carries the markers — no compaction required
    spark.sql("CALL g15wp.system.fastforward(table => 't', name => 'wap')")
    val v = ManifestTable.currentVersion(dir)
    assert(ManifestTable.dvEntries(dir, v).nonEmpty,
      "the published snapshot carries the branch's DV markers")
    assert(ManifestTable.dvEntries(dir, v).flatMap(_.targets)
      .forall(t => ManifestTable.listFiles(dir, v).contains(t)),
      "published marker targets fold to main's manifest names")
    assert(spark.sql("SELECT k, price FROM g15wp.default.t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap == want,
      "main serves exactly the audited content")
    // the metadata COUNT tier survives the publish (exact ordinals)
    val cnt = spark.sql("SELECT count(*) FROM g15wp.default.t")
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata agg"),
      s"published positional markers keep COUNT(*) metadata-served:\n" +
        cnt.queryExecution.executedPlan)
    assert(cnt.head().getLong(0) == want.size.toLong)
    ManifestTable.destroy(root)
  }

  test("price_dvs retro-prices pre-round-15 uncounted keyed markers") {
    val root = freshDir("prc")
    val dir = s"$root/t"
    spark.conf.set("spark.sql.catalog.g15pr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15pr.root", root)
    spark.sql("""CREATE TABLE g15pr.default.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('delete.mode' = 'mor')""")
    spark.sql("""INSERT INTO g15pr.default.t
      SELECT /*+ REPARTITION(2) */ id, CAST(id AS DOUBLE)
      FROM range(0, 100)""")
    spark.sql("DELETE FROM g15pr.default.t WHERE k IN (1, 2, 3)")
    spark.sql("DELETE FROM g15pr.default.t WHERE k IN (3, 50)")
    // simulate a pre-round-15 table: strip the counts leg from the
    // committed #dv lines (exactly the old wire format)
    val v = ManifestTable.currentVersion(dir)
    val mf = java.nio.file.Paths.get(dir, f"manifest-v$v%08d.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .split('\n').map { l =>
        if (l.startsWith("#dv\t")) l.split('\t').take(4).mkString("\t")
        else l
      }.mkString("\n")
    java.nio.file.Files.write(mf, stripped.getBytes("UTF-8"))
    assert(ManifestTable.dvEntries(dir, v).exists(!_.fullyCounted))
    // uncounted markers decline the metadata COUNT honestly …
    val cnt0 = spark.sql("SELECT count(*) FROM g15pr.default.t")
    assert(!cnt0.queryExecution.executedPlan.toString.contains("metadata agg"))
    assert(cnt0.head().getLong(0) == 96L)
    // … price_dvs measures the doom remainders in one pass …
    spark.sql("CALL g15pr.system.price_dvs(table => 't')")
    assert(ManifestTable.dvEntries(dir, ManifestTable.currentVersion(dir))
      .forall(_.fullyCounted), "every marker must be priced")
    // … and the metadata tiers are re-armed, exactly
    val cnt1 = spark.sql("SELECT count(*) FROM g15pr.default.t")
    assert(cnt1.queryExecution.executedPlan.toString.contains("metadata agg"),
      s"priced markers must re-arm the COUNT pushdown:\n" +
        cnt1.queryExecution.executedPlan)
    assert(cnt1.head().getLong(0) == 96L)
    val hist = ManifestTable.history(spark, dir).orderBy("version").collect()
    assert(!hist.last.isNullAt(3) && hist.last.getLong(3) == 96L)
    // idempotent: a second call is a no-op commit
    val vAfter = ManifestTable.currentVersion(dir)
    spark.sql("CALL g15pr.system.price_dvs(table => 't')")
    assert(ManifestTable.currentVersion(dir) == vAfter)
    ManifestTable.destroy(root)
  }

  test("persistent views: create, read through, survive a fresh catalog") {
    val root = freshDir("vw")
    spark.conf.set("spark.sql.catalog.g15vw",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15vw.root", root)
    spark.sql("CREATE TABLE g15vw.default.t (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO g15vw.default.t
      SELECT id, CAST(id AS DOUBLE) FROM range(0, 20)""")
    spark.sql("""CALL g15vw.system.create_view(name => 'big',
      sql => 'SELECT k, v FROM g15vw.default.t WHERE v >= 10.0')""")
    assert(spark.sql("SELECT count(*) FROM g15vw.default.big")
      .head().getLong(0) == 10L)
    // storage-backed, not session-cached: a SECOND catalog name over the
    // same root (a fresh GraftCatalog instance — the restart shape)
    // serves the same view
    spark.conf.set("spark.sql.catalog.g15vw2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15vw2.root", root)
    assert(spark.sql("SELECT sum(k) FROM g15vw2.default.big")
      .head().getLong(0) == (10L until 20L).sum)
    // a view outlives DML on its base
    spark.sql("DELETE FROM g15vw.default.t WHERE k = 10")
    assert(spark.sql("SELECT count(*) FROM g15vw.default.big")
      .head().getLong(0) == 9L)
    // name collision: CREATE TABLE under the view's name refuses
    val e = intercept[Throwable] {
      spark.sql("CREATE TABLE g15vw.default.big (x BIGINT)") }
    assert(e.getMessage.contains("view"), e.getMessage)
    // create_view over an existing table name refuses
    val e2 = intercept[Throwable] {
      spark.sql("""CALL g15vw.system.create_view(name => 't',
        sql => 'SELECT 1 AS one')""") }
    assert(e2.getMessage.contains("table"), e2.getMessage)
    // UNQUALIFIED body relations resolve in the view's CREATION context
    // (its stored catalog + namespace), never the reader's
    spark.sql("""CALL g15vw.system.create_view(name => 'unq',
      sql => 'SELECT k FROM t WHERE v < 5.0')""")
    assert(spark.sql("SELECT count(*) FROM g15vw.default.unq")
      .head().getLong(0) == 5L)
    // a WITH-bodied view resolves, with an UNQUALIFIED base inside the
    // CTE (qualification runs after CTE substitution, so the CTE name
    // never shields a real table from the creation context)
    spark.sql("""CALL g15vw.system.create_view(name => 'wv',
      sql => 'WITH b AS (SELECT k FROM t WHERE k >= 15)
              SELECT count(*) AS n FROM b')""")
    assert(spark.sql("SELECT n FROM g15vw.default.wv")
      .head().getLong(0) == 5L)
    // a CROSS-CATALOG 2-part body reference stays verbatim (2-part
    // names resolve catalog-first; qualification must not hijack them
    // into the view's own catalog)
    assert(spark.sql("SELECT count(*) FROM g15vw2.default.t")
      .head().getLong(0) >= 1L) // the alias catalog serves the table
    spark.sql("""CALL g15vw.system.create_view(name => 'xcat',
      sql => 'SELECT k FROM g15vw2.t WHERE k < 3')""")
    assert(spark.sql("SELECT count(*) FROM g15vw.default.xcat")
      .head().getLong(0) == 3L)
    spark.sql("CALL g15vw.system.drop_view(name => 'big')")
    val e3 = intercept[Throwable] {
      spark.sql("SELECT count(*) FROM g15vw.default.big").collect() }
    assert(e3 != null)
    ManifestTable.destroy(root)
  }

  test("views refuse on dropped base columns and on self-reference") {
    val root = freshDir("vwr")
    spark.conf.set("spark.sql.catalog.g15vr",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g15vr.root", root)
    spark.sql("CREATE TABLE g15vr.default.t (k BIGINT, v DOUBLE, w DOUBLE)")
    spark.sql("""INSERT INTO g15vr.default.t
      SELECT id, CAST(id AS DOUBLE), 1.0 FROM range(0, 5)""")
    spark.sql("""CALL g15vr.system.create_view(name => 'vw',
      sql => 'SELECT k, w FROM g15vr.default.t')""")
    assert(spark.sql("SELECT sum(w) FROM g15vr.default.vw")
      .head().getDouble(0) == 5.0)
    // dropping a base column the view reads → the view REFUSES (the
    // creation-time column set is pinned; never a silent shape change)
    spark.sql("ALTER TABLE g15vr.default.t DROP COLUMN w")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM g15vr.default.vw").collect() }
    assert(e.getMessage.toLowerCase.contains("w") ||
      e.getMessage.toLowerCase.contains("resolve"), e.getMessage)
    // a REPLACE whose body references the view ITSELF refuses at
    // CREATE (the probe would resolve it against the OLD definition
    // and publish a view that bricks every later read) — and the old
    // definition keeps serving
    spark.sql("""CALL g15vr.system.create_view(name => 'selfy',
      sql => 'SELECT k FROM g15vr.default.t')""")
    val e2 = intercept[Throwable] {
      spark.sql("""CALL g15vr.system.create_view(name => 'selfy',
        sql => 'SELECT k FROM g15vr.default.selfy', replace => true)""") }
    def m2(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + m2(t.getCause)
    assert(m2(e2).contains("references the view itself"), m2(e2))
    assert(spark.sql("SELECT count(*) FROM g15vr.default.selfy")
      .head().getLong(0) == 5L, "the old definition survives")
    // the unqualified self-reference form refuses identically
    val e3 = intercept[Throwable] {
      spark.sql("""CALL g15vr.system.create_view(name => 'selfy',
        sql => 'SELECT k FROM selfy', replace => true)""") }
    assert(m2(e3).contains("references the view itself"), m2(e3))
    ManifestTable.destroy(root)
  }

  test("ViewCatalog SPI: create/load/list/alter/rename/drop round-trip") {
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange,
      ViewInfo}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val root = freshDir("vws")
    val cat = new graft.sources.GraftCatalog()
    cat.initialize("g15spi",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", root)))
    val id = Identifier.of(Array("default"), "v1")
    val schema = StructType(Seq(StructField("k", LongType)))
    val info = new ViewInfo(id, "SELECT 1 AS k", "g15spi",
      Array("default"), schema, Array("k"), Array.empty, Array.empty,
      java.util.Map.of("comment", "spi view"))
    cat.createView(info)
    assert(cat.viewExists(id))
    intercept[org.apache.spark.sql.catalyst.analysis
      .ViewAlreadyExistsException] { cat.createView(info) }
    val v = cat.loadView(id)
    assert(v.query() == "SELECT 1 AS k" && v.schema() == schema &&
      v.properties().get("comment") == "spi view")
    assert(cat.listViews("default").map(_.name()).toSeq == Seq("v1"))
    cat.alterView(id, ViewChange.setProperty("owner", "graft"),
      ViewChange.removeProperty("comment"))
    val v2 = cat.loadView(id)
    assert(v2.properties().get("owner") == "graft" &&
      !v2.properties().containsKey("comment"))
    val id2 = Identifier.of(Array("default"), "v2")
    cat.renameView(id, id2)
    assert(!cat.viewExists(id) && cat.viewExists(id2))
    assert(cat.dropView(id2) && !cat.dropView(id2))
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchViewException] {
      cat.loadView(id2) }
    ManifestTable.destroy(root)
  }
}
