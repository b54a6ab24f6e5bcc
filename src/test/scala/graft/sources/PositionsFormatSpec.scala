package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 15 positions-file format: roaring-bitmap rows are what the
  * writer stages, round-14 per-ordinal rows stay READABLE (time travel
  * and restore cross the format change), and every lookup normalizes
  * target names to the basename so relative (local), absolute (clone/
  * branch reference), and historical name forms all land on the same
  * bitmap. */
class PositionsFormatSpec extends AnyFunSuite {
  import graft.TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r15_pf_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  test("legacy (_file,_pos) positions files decode with basename lookups") {
    val dir = freshDir("legacy")
    // a round-14-shape positions parquet: one row per doomed ordinal
    spark.createDataFrame(Seq(
        ("f1.parquet", 0L), ("f1.parquet", 3L), ("f2.parquet", 7L)))
      .toDF("_file", "_pos")
      .coalesce(1).write.parquet(dir)
    val p = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no parquet part file under $dir")).getAbsolutePath
    val rb = DvKeyCache.doomedPositions(p, "f1.parquet")
    assert(rb.contains(0) && rb.contains(3) && !rb.contains(1) &&
      rb.getLongCardinality == 2L)
    // an ABSOLUTE target name form (clone/branch manifest reference)
    // lands on the same bitmap
    val abs = DvKeyCache.doomedPositions(p, "/any/table/data/f2.parquet")
    assert(abs.contains(7) && abs.getLongCardinality == 1L)
    assert(DvKeyCache.doomedPositions(p, "absent.parquet").isEmpty)
    ManifestTable.destroy(dir)
  }

  test("bitmap positions round-trip, dense deletes stay tiny on disk") {
    val dir = freshDir("rt")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "data"))
    val dense = new org.roaringbitmap.RoaringBitmap()
    dense.add(0L, 20_000_000L) // 20M consecutive doomed ordinals
    dense.runOptimize()
    val sparse = org.roaringbitmap.RoaringBitmap.bitmapOf(1, 99, 65537)
    val name = GraftDeltaWriter.writePositionsFile(dir,
      Iterator("big.parquet" -> dense, "small.parquet" -> sparse), "t0")
    val staged = new java.io.File(dir, s"data/$name")
    // round 14 stored 8 bytes/ordinal (160 MB here — past its own 16M
    // budget and REFUSED); the run-optimized bitmap is a few KB
    assert(staged.length() < 64 * 1024,
      s"20M dense doomed ordinals must stay tiny, got ${staged.length()}")
    val back = DvKeyCache.doomedPositions(staged.getAbsolutePath,
      "big.parquet")
    assert(back.getLongCardinality == 20_000_000L &&
      back.contains(0) && back.contains(19_999_999) &&
      !back.contains(20_000_000))
    val s2 = DvKeyCache.doomedPositions(staged.getAbsolutePath,
      "/abs/prefix/small.parquet")
    assert(s2.getLongCardinality == 3L && s2.contains(65537))
    ManifestTable.destroy(dir)
  }
}
