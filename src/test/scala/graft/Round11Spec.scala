package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 regressions — the round-9/10 judge findings, each pinned:
  * streamTableSink re-run in one JVM, NaN/Infinity pushdown, the governed
  * SQL-DML contract, atomic multi-change ALTER TABLE, and `#ts`
  * commit-instant time travel. */
class Round11Spec extends AnyFunSuite {
  import TestSpark._
  import sources.ManifestTable

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r11_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  test("streamTableSink runs twice in one session — the cached-catalog-root bug") {
    // pre-fix: a fresh UUID root per invocation under the FIXED catalog
    // name graft_st meant the second run streamed into the first run's
    // root (Spark caches catalog instances per name, root captured at
    // initialize) while ManifestTable.read targeted the new, empty root
    val first = streaming.StreamingOps.streamTableSink(spark, sf)
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    val second = streaming.StreamingOps.streamTableSink(spark, sf)
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    val oracle = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    assert(first == oracle, "first invocation must match the batch answer")
    assert(second == oracle, "second invocation must match too — not fail " +
      "or double-append into the first run's root")
  }

  test("non-finite predicate bounds decline the prune instead of crashing pushdown") {
    val root = freshDir("nan")
    val dir = s"$root/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("value").cast("double").as("value"))
    val staged = ManifestTable.stageWithStats(spark, dir, ev, Seq("value"))
    assert(ManifestTable.commit(dir, staged, -1))
    spark.conf.set("spark.sql.catalog.g11nan",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g11nan.root", root)
    val total = ev.count()
    // pre-fix: BigDecimal(Double.NaN) threw NumberFormatException inside
    // prunable() and killed the query before any scan ran
    assert(spark.sql(
      "SELECT count(*) AS n FROM g11nan.default.t WHERE value > double('NaN')")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM g11nan.default.t WHERE value < double('Infinity')")
      .head().getLong(0) == total)
    assert(spark.sql(
      "SELECT count(*) AS n FROM g11nan.default.t WHERE value >= double('-Infinity')")
      .head().getLong(0) == total)
    ManifestTable.destroy(root)
  }

  test("governed tables refuse SQL DML on BOTH paths (key-membership and row-level)") {
    val root = freshDir("govdml")
    val dir = s"$root/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ManifestTable.merge(spark, dir, ev, Seq("event_id"))
    ManifestTable.setPolicy(dir, masks = Map.empty,
      rowFilter = Some("event_type <> 'error'"))
    spark.conf.set("spark.sql.catalog.g11gov",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g11gov.root", root)
    val before = ManifestTable.read(spark, dir).count()
    // pre-fix: canDeleteWhere accepted the key-membership shape on a
    // governed table, so DELETE removed rows the row filter HID from the
    // statement's author — while UPDATE (row-level path) was refused
    intercept[Exception] {
      spark.sql("DELETE FROM g11gov.default.t WHERE event_id IN (1, 2, 3)")
    }
    intercept[Exception] {
      spark.sql("UPDATE g11gov.default.t SET user_id = 0 WHERE event_id = 1")
    }
    assert(ManifestTable.read(spark, dir).count() == before,
      "refused statements must leave the table untouched")
    ManifestTable.destroy(root)
  }

  test("multi-change ALTER TABLE is atomic: a refused change leaves nothing durable") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val root = freshDir("altatom")
    val dir = s"$root/t"
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    ManifestTable.merge(spark, dir, ev, Seq("event_id"))
    // a deletion vector makes any RENAME COLUMN refuse
    ManifestTable.deleteKeysMOR(spark, dir, "event_id", Seq(1L))
    val cat = new graft.sources.GraftCatalog
    cat.initialize("g11alt",
      new CaseInsensitiveStringMap(Map("root" -> root).asJava))
    val ident = Identifier.of(Array("default"), "t")
    val vBefore = ManifestTable.currentVersion(dir)
    intercept[Exception] {
      cat.alterTable(ident,
        TableChange.setProperty("a", "1"),
        TableChange.renameColumn(Array("user_id"), "uid")) // refused: DVs
    }
    assert(ManifestTable.currentVersion(dir) == vBefore,
      "a refused change must not leave an earlier change committed")
    assert(!ManifestTable.tableProperties(dir, vBefore).contains("a"),
      "property 'a' from the same refused statement must not be durable")
    // the happy path lands as ONE commit, changes applied in order
    cat.alterTable(ident,
      TableChange.setProperty("a", "1"),
      TableChange.setProperty("b", "2"),
      TableChange.setProperty("a", "3"))
    assert(ManifestTable.currentVersion(dir) == vBefore + 1,
      "a multi-change statement publishes exactly one version")
    val props = ManifestTable.tableProperties(dir, vBefore + 1)
    assert(props.get("a").contains("3") && props.get("b").contains("2"))
    ManifestTable.destroy(root)
  }

  test("TIMESTAMP AS OF resolves from #ts commit markers and survives mtime perturbation") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val root = freshDir("tsmark")
    val dir = s"$root/t"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type")).limit(100)
    val s0 = ManifestTable.stage(spark, dir, ev.filter(col("event_id") % 2 === 0))
    assert(ManifestTable.commit(dir, s0, -1))
    Thread.sleep(1100) // distinct commit instants at millis granularity
    val s1 = ManifestTable.stage(spark, dir, ev.filter(col("event_id") % 2 =!= 0))
    assert(ManifestTable.commit(dir, ManifestTable.listLines(dir, 0) ++ s1, 0))
    val t0 = ManifestTable.commitInstantMillis(dir, 0)
      .getOrElse(fail("v0 must carry a #ts marker"))
    val t1 = ManifestTable.commitInstantMillis(dir, 1)
      .getOrElse(fail("v1 must carry a #ts marker"))
    assert(t0 < t1)
    // a directory copy / backup-restore rewrites mtimes; simulate the
    // worst case by pushing every manifest mtime far into the future —
    // mtime-based resolution would now find NO version at-or-before
    (0 to 1).foreach { v =>
      Files.setLastModifiedTime(
        Paths.get(dir, f"manifest-v$v%08d.json"),
        FileTime.fromMillis(t1 + 365L * 24 * 3600 * 1000))
    }
    spark.conf.set("spark.sql.catalog.g11ts",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g11ts.root", root)
    val mid = java.time.Instant.ofEpochMilli(t0 + (t1 - t0) / 2)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val atMid = spark.sql(
      s"SELECT count(*) AS n FROM g11ts.default.t TIMESTAMP AS OF '$mid'")
      .head().getLong(0)
    assert(atMid == ev.filter(col("event_id") % 2 === 0).count(),
      "an instant between the commits must resolve to v0 — by marker, " +
        "not by the (perturbed) file mtimes")
    ManifestTable.destroy(root)
  }
}
