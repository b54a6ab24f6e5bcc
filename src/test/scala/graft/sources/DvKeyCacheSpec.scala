package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate memory bound of the deletion-vector key cache (round 14):
  * a byte-budgeted LRU across the long and string pools — loading past
  * the budget EVICTS least-recently-used entries (no OOM, no
  * clear-everything), an evicted entry reloads correctly on re-access,
  * and a single entry over the whole budget still caches (the per-file
  * key budget is the loud bound for that). */
class DvKeyCacheSpec extends AnyFunSuite {
  import graft.TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_r14_dvc_${tag}_" +
      java.lang.ProcessHandle.current().pid()
    ManifestTable.destroy(d)
    d
  }

  /** Write one single-file key parquet of longs [lo, hi) and return its
    * path. */
  private def keyFile(dir: String, name: String, lo: Long, hi: Long): String = {
    val out = s"$dir/$name"
    spark.range(lo, hi).select(col("id").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(out)
    val f = new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no parquet part file under $out"))
    f.getAbsolutePath
  }

  test("byte-budgeted LRU: evicts eldest past budget, reloads evicted") {
    val dir = freshDir("lru")
    val n = 1000L // entry ≈ 16 + 8 000 bytes
    val paths = (0 until 5).map(i => keyFile(dir, s"kf$i", i * n, i * n + n))
    val old = sys.props.get("graft.dv.cacheBytes")
    try {
      // budget fits ~2 entries
      sys.props("graft.dv.cacheBytes") = "20000"
      DvKeyCache.clearForTest()
      paths.zipWithIndex.foreach { case (p, i) =>
        val ks = DvKeyCache.doomed(p, "k")
        assert(ks.length == n && ks.head == i * n, s"entry $i decodes")
      }
      val (entries, bytes) = DvKeyCache.stats
      assert(entries < paths.size,
        s"loading 5 x 8KB under a 20KB budget must evict, kept $entries")
      assert(entries >= 1 && bytes <= 20000,
        s"cache must respect the byte budget, at $bytes bytes / $entries")
      // an evicted entry reloads with the same answer — never wrong
      val again = DvKeyCache.doomed(paths.head, "k")
      assert(again.length == n && again.head == 0L &&
        DvKeyCache.contains(again, n - 1) && !DvKeyCache.contains(again, n))
      // string pool shares the same budget
      val sdir = s"$dir/s"
      spark.range(0, 200).select(concat(lit("user"), col("id")).as("u"))
        .coalesce(1).write.parquet(sdir)
      val sp = new java.io.File(sdir).listFiles()
        .find(_.getName.endsWith(".parquet")).get.getAbsolutePath
      val sks = DvKeyCache.doomedBytes(sp, "u")
      assert(sks.length == 200 &&
        DvKeyCache.containsBytes(sks, "user199".getBytes("UTF-8")))
      val (e2, b2) = DvKeyCache.stats
      assert(b2 <= 20000 && e2 >= 1,
        s"mixed pools stay within the budget: $b2 bytes / $e2 entries")
    } finally {
      old match {
        case Some(v) => sys.props("graft.dv.cacheBytes") = v
        case None => sys.props.remove("graft.dv.cacheBytes")
      }
      DvKeyCache.clearForTest()
      ManifestTable.destroy(dir)
    }
  }

  test("one entry over the whole budget still caches and answers") {
    val dir = freshDir("big")
    val p = keyFile(dir, "big", 0, 5000) // ≈ 40KB > 10KB budget
    val old = sys.props.get("graft.dv.cacheBytes")
    try {
      sys.props("graft.dv.cacheBytes") = "10000"
      DvKeyCache.clearForTest()
      val ks = DvKeyCache.doomed(p, "k")
      assert(ks.length == 5000 && DvKeyCache.contains(ks, 4999L))
      assert(DvKeyCache.stats._1 == 1, "the lone oversized entry stays")
      // and a second identical request HITS (same array instance)
      assert(DvKeyCache.doomed(p, "k") eq ks)
    } finally {
      old match {
        case Some(v) => sys.props("graft.dv.cacheBytes") = v
        case None => sys.props.remove("graft.dv.cacheBytes")
      }
      DvKeyCache.clearForTest()
      ManifestTable.destroy(dir)
    }
  }
}
