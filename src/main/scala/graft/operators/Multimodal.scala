package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass (driver
  * mandate; SURVEY.md §7 Phase 6).
  *
  * The container has no image/audio codec libraries, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below). Everything around it — the
  * binary payload column, metadata struct schema, partition-preserving
  * `mapPartitions` batch shape, and the typed output Encoder — is the real
  * production plumbing a codec would drop into.
  */
object Multimodal {

  /** Raw payload row fed to the decoder. */
  final case class BlobRow(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Typed features produced per payload. */
  final case class BlobFeatures(
      doc_id: Long, n_bytes: Int, fmt: String,
      mean_byte: Double, max_byte: Int, checksum: Long)

  /** Attach a binary payload + typed metadata struct to each document.
    * The payload is the utf-8 encoding of the text (a deterministic stand-in
    * for real image bytes); metadata mirrors what an image table carries. */
  def withBlobs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      encode($"text", "utf-8").as("payload"),
      struct(
        ($"n_chars" % 640).cast("int").as("img_w"),
        ($"n_chars" % 480).cast("int").as("img_h"),
        when($"n_chars" % 2 === 0, "png").otherwise("jpeg").as("fmt")
      ).as("meta"))
  }

  /** Metadata projection — oracle-checkable (byte lengths, derived dims). */
  def blobMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withBlobs(s, dir).select(
      $"doc_id",
      length($"payload").as("n_bytes"),
      $"meta.img_w", $"meta.img_h", $"meta.fmt")
  }

  /** Batch feature extraction over binary payloads via `mapPartitions`: one
    * decoder instance per partition (where a real codec would be initialized
    * once), streaming over rows without materializing the partition.
    *
    * ===== STUB =====
    * `decodeFeatures` stands in for the real image/audio decode (no codec
    * libs in this container). It is deterministic byte arithmetic so tests
    * and the driver's rows-only check are stable. A real implementation
    * swaps only the body of `decodeFeatures`.
    */
  def blobFeatures(s: SparkSession, dir: String): Dataset[BlobFeatures] = {
    import s.implicits._
    val blobs = withBlobs(s, dir)
      .select($"doc_id", $"payload", $"meta.fmt".as("fmt"))
      .as[BlobRow]
    blobs.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r => decodeFeatures(r) }
    }
  }

  /** STUB decode: deterministic per-byte statistics standing in for pixel /
    * sample decoding. */
  private def decodeFeatures(r: BlobRow): BlobFeatures = {
    val bytes = r.payload
    var sum = 0L; var max = 0; var checksum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sum += b
      if (b > max) max = b
      checksum = (checksum << 5) ^ (checksum >>> 59) ^ b
      i += 1
    }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    BlobFeatures(r.doc_id, bytes.length, r.fmt,
      math.rint(mean * 1e6) / 1e6, max, checksum)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_blob_meta" -> ((s, d) => blobMeta(s, d)),
    "q_blob_features" -> ((s, d) => blobFeatures(s, d).toDF()),
  )

  val oracle: Map[String, String] = Map(
    "q_blob_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(n_chars % 640 AS INTEGER) AS img_w,
        |       CAST(n_chars % 480 AS INTEGER) AS img_h,
        |       CASE WHEN n_chars % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
        |FROM documents""".stripMargin,
    // q_blob_features: rows-only (stubbed decoder)
  )
}
