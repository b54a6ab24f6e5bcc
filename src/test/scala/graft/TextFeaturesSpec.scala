package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounds for the MLlib text-feature pipeline (rows-only queries) and the
  * streaming sessionizer's cross-batch ordering property. */
class TextFeaturesSpec extends AnyFunSuite {
  import TestSpark._

  private val stop =
    Set("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  test("tfidf top terms: no stopwords, positive finite scores, ≤k per doc") {
    val rows = operators.TextFeatures.tfidfTopTerms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val term = r.getAs[String]("term")
      val score = r.getAs[Double]("tfidf")
      assert(!stop.contains(term), s"stopword '$term' survived the remover")
      assert(score > 0 && !score.isNaN && !score.isInfinite, s"score=$score")
    }
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id")).values.map(_.length)
    assert(perDoc.forall(_ <= 3))
  }

  test("generated doc embeddings are unit-L2, fixed-dim, one per doc") {
    import spark.implicits._
    val e = operators.TextFeatures.docEmbeddings(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    val stats = e.select(
      count(lit(1)).as("n"),
      min(size($"embedding")).as("min_d"),
      max(size($"embedding")).as("max_d"),
      min(aggregate($"embedding", lit(0.0), (acc, x) => acc + x * x)).as("min_sq"),
      max(aggregate($"embedding", lit(0.0), (acc, x) => acc + x * x)).as("max_sq"))
      .collect()(0)
    assert(stats.getAs[Long]("n") == nDocs)
    assert(stats.getAs[Int]("min_d") == 64 && stats.getAs[Int]("max_d") == 64)
    // unit norm within float tolerance (all-stopword docs would be zero
    // vectors; the fixture has none)
    assert(math.abs(stats.getAs[Double]("min_sq") - 1.0) < 1e-3, stats.toString)
    assert(math.abs(stats.getAs[Double]("max_sq") - 1.0) < 1e-3, stats.toString)
  }

  test("doc knn over generated embeddings returns k ranked neighbors per query") {
    val rows = operators.TextFeatures.docKnn(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
      assert(rs.forall(r => r.getAs[Double]("cos_sim") <= 1.000001))
    }
  }

  test("stream sessionization survives a 2-file time-split replay") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_sess_split").toFile.getAbsolutePath
    // split the raw events (long nanosecond ts) at the median into two
    // time-ordered files — the time-partitioned ingest layout the operator's
    // cross-batch ordering contract assumes
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val cut = raw.stat.approxQuantile("ts", Array(0.5), 0.0)(0).toLong
    raw.filter(col("ts") <= cut).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Thread.sleep(20) // distinct mtimes: FileStreamSource replays oldest-first
    raw.filter(col("ts") > cut).coalesce(1)
      .write.mode("append").parquet(s"$tmp/events.parquet")

    val streamed = streaming.Sessionize
      .streamSessions(spark, tmp, maxFilesPerTrigger = Some(1))
      .orderBy("user_id", "sess_no").collect().toSeq
    val batch = streaming.Sessionize.batchSessions(spark, tmp)
      .orderBy("user_id", "sess_no").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
