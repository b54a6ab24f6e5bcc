package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus feature-extraction passes (driver
  * mandate; SURVEY.md §7 Phase 6).
  *
  * Two tiers:
  *  - `blobFeatures`: byte-level statistics with a STUB decode body (clearly
  *    marked below) — the plumbing template for codecs this container lacks
  *    (JPEG/PNG/MP3 need native libs);
  *  - `imageDecode` / `audioDecode`: REAL codecs for two headerful formats
  *    that need no external libs — 24-bit BMP and 16-bit PCM WAV. The
  *    payloads are genuine well-formed files (written by `encodeBmp` /
  *    `encodeWav` from deterministic doc-derived pixels/samples) and the
  *    decoders parse the actual headers (magic, dimensions, sample counts)
  *    and payload bytes. Header fields are oracle-checked; channel/sample
  *    statistics are round-trip-asserted in ScalaTest.
  *
  * All decode work runs in `mapPartitions` — one decoder context per
  * partition, streaming over rows — the batch shape a Python stack would
  * express as a Pandas UDF under `mapInPandas`.
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

  // ===== real BMP / WAV codecs (no external libs needed) =====

  /** Image dims derived deterministically from doc length (small on purpose;
    * the point is real encode/decode, not pixel volume). */
  private def imgDims(nChars: Long): (Int, Int) =
    (4 + (nChars % 13).toInt, 4 + (nChars % 11).toInt)

  /** Doc-derived pixel bytes: utf-8 text bytes cycled to length n. */
  private def cycled(src: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = src(i % src.length); i += 1 }
    out
  }

  /** REAL 24-bit BMP writer: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER
    * (40 B) + bottom-up BGR rows padded to 4-byte boundaries — byte-exact
    * per the public BMP format spec. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        buf.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decoded image features: header fields + per-channel means. */
  final case class ImageFeatures(
      doc_id: Long, img_w: Int, img_h: Int, bpp: Int, n_pixels: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Shared BMP header validation: magic, full 54-byte header, positive
    * dims, 24 bpp, and a pixel array that lies ENTIRELY inside the payload
    * (checked in Long arithmetic so a hostile width can't overflow the
    * bound). Malformed input fails with a diagnosable
    * IllegalArgumentException — never an index error.
    * Returns (dataOffset, w, h, rowSize). */
  private def bmpHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 54, s"truncated BMP header: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP")
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    require(bpp == 24, s"unsupported bpp=$bpp")
    require(w > 0 && h > 0, s"bad BMP dims ${w}x$h")
    val rowSizeL = (w.toLong * 3 + 3) / 4 * 4
    require(dataOffset >= 54 &&
      dataOffset.toLong + h.toLong * rowSizeL <= bytes.length,
      s"pixel array out of bounds: offset=$dataOffset ${w}x$h in ${bytes.length} bytes")
    (dataOffset, w, h, rowSizeL.toInt)
  }

  /** REAL BMP parser: validates the `BM` magic, reads the pixel-array offset
    * and BITMAPINFOHEADER dims/bpp, walks the padded bottom-up BGR rows. */
  def decodeBmp(docId: Long, bytes: Array[Byte]): ImageFeatures = {
    val (dataOffset, w, h, rowSize) = bmpHeader(bytes)
    val bpp = 24
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      val row = dataOffset + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        sb += bytes(row + x * 3) & 0xFF
        sg += bytes(row + x * 3 + 1) & 0xFF
        sr += bytes(row + x * 3 + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    ImageFeatures(docId, w, h, bpp, w * h,
      math.rint(sr / n * 1e6) / 1e6,
      math.rint(sg / n * 1e6) / 1e6,
      math.rint(sb / n * 1e6) / 1e6)
  }

  /** documents → real BMP payloads → parsed features, one codec pass per
    * partition. Header fields (w/h/bpp/n_pixels) are oracle-checked against
    * the dims formula; channel means are round-trip-asserted in ScalaTest. */
  def imageDecode(s: SparkSession, dir: String): Dataset[ImageFeatures] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val (w, h) = imgDims(nChars)
          val bmp = encodeBmp(w, h, cycled(text.getBytes("UTF-8"), w * h * 3))
          decodeBmp(id, bmp)
        }
      }
  }

  /** REAL 16-bit mono PCM WAV writer: canonical 44-byte RIFF/fmt/data
    * header + little-endian samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decoded audio features: header fields + RMS/peak over PCM samples. */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, n_samples: Int, rms: Double, peak: Int)

  /** Shared RIFF chunk walk: validates the RIFF/WAVE magic, then visits
    * word-aligned chunks collecting the `fmt ` sample rate and the `data`
    * extent. Every declared chunk must lie entirely inside the payload and
    * have a non-negative length — an unchecked negative length would stall
    * the walk forever (`pos += 8 + len` stops advancing), and a truncated
    * declaration would read past the buffer; both fail here with a
    * diagnosable IllegalArgumentException instead.
    * Returns (rate or 0, dataPos or -1, dataLen). */
  private def riffChunks(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 12, s"truncated RIFF header: ${bytes.length} bytes")
    require(new String(bytes, 0, 4) == "RIFF" && new String(bytes, 8, 4) == "WAVE",
      "not a WAV")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = 0
    var dataPos = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length && (rate == 0 || dataPos < 0)) {
      val id = new String(bytes, pos, 4)
      val len = buf.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len.toLong <= bytes.length,
        s"corrupt RIFF chunk '$id' len=$len at $pos in ${bytes.length} bytes")
      if (id == "fmt ") {
        require(len >= 8, s"truncated fmt chunk: len=$len")
        rate = buf.getInt(pos + 12)
      } else if (id == "data") { dataPos = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    (rate, dataPos, dataLen)
  }

  /** REAL WAV parser: validates RIFF/WAVE magic, walks chunks to `fmt ` and
    * `data`, reads rate + PCM samples. */
  def decodeWav(docId: Long, bytes: Array[Byte]): AudioFeatures = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val (rate, dataPos, dataLen) = riffChunks(bytes)
    require(rate > 0 && dataPos >= 0, "missing fmt/data chunk")
    val n = dataLen / 2
    var sumSq = 0.0
    var peak = 0
    var i = 0
    while (i < n) {
      val v = buf.getShort(dataPos + i * 2).toInt
      sumSq += v.toDouble * v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    AudioFeatures(docId, rate, n, math.rint(rms * 1e6) / 1e6, peak)
  }

  /** documents → real WAV payloads (samples = centered doc bytes × 256,
    * n_samples = n_chars % 500 + 100) → parsed features. */
  def audioDecode(s: SparkSession, dir: String): Dataset[AudioFeatures] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val nSamples = (nChars % 500).toInt + 100
          val src = text.getBytes("UTF-8")
          val samples = Array.tabulate(nSamples) { i =>
            (((src(i % src.length) & 0xFF) - 128) * 256).toShort
          }
          decodeWav(id, encodeWav(16000, samples))
        }
      }
  }

  /** Nearest-neighbor RGB resize — the real pixel math of a thumbnailing
    * pass (source coordinate = floor(dst * src_dim / dst_dim)). */
  def resizeRgb(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        val sp = (sy * w + sx) * 3
        val dp = (y * ow + x) * 3
        out(dp) = rgb(sp); out(dp + 1) = rgb(sp + 1); out(dp + 2) = rgb(sp + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** BMP pixel-array extraction (top-down RGB) for the resize path. */
  def decodeBmpPixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (dataOffset, w, h, rowSize) = bmpHeader(bytes)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val row = dataOffset + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val dp = (y * w + x) * 3
        rgb(dp + 2) = bytes(row + x * 3)     // B
        rgb(dp + 1) = bytes(row + x * 3 + 1) // G
        rgb(dp) = bytes(row + x * 3 + 2)     // R
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  final case class Thumb(doc_id: Long, out_w: Int, out_h: Int, thumb_bytes: Int)

  /** Image RESIZE pipeline (driver mandate: decode / feature-extract /
    * resize / frame-sample): encode the doc-derived BMP, decode its pixel
    * array, nearest-neighbor resize to an 8×8 thumbnail, re-encode. The
    * per-partition mapPartitions shape is the production layout (one codec
    * context per partition, binary in → binary out); the oracle checks the
    * output geometry (thumbnail BMP size is format-determined), and specs
    * assert identity-resize and mean preservation on constant images. */
  def imageResize(s: SparkSession, dir: String, ow: Int = 8, oh: Int = 8): Dataset[Thumb] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val (w, h) = imgDims(nChars)
          val bmp = encodeBmp(w, h, cycled(text.getBytes("UTF-8"), w * h * 3))
          val (dw, dh, rgb) = decodeBmpPixels(bmp)
          val thumb = encodeBmp(ow, oh, resizeRgb(dw, dh, rgb, ow, oh))
          Thumb(id, ow, oh, thumb.length)
        }
      }
  }

  /** PCM sample extraction for the frame-sample path. */
  def decodeWavSamples(bytes: Array[Byte]): Array[Short] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val (_, dataPos, dataLen) = riffChunks(bytes)
    require(dataPos >= 0, "missing data chunk")
    Array.tabulate(dataLen / 2)(i => buf.getShort(dataPos + i * 2))
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_rms: Double)

  /** Audio FRAME-SAMPLE pipeline: decode PCM, window into 80-sample (5 ms @
    * 16 kHz) frames, keep every 2nd frame, per-frame RMS — the temporal
    * subsampling shape video/audio feature extraction uses (decode once,
    * emit many frames per blob: a one-to-many mapPartitions, no shuffle).
    * Oracle-checked end to end: the sample derivation is deterministic
    * integer arithmetic over the document bytes (ASCII fixture ⇒ byte =
    * code point), per-frame Σv² is a sum of ≤80 exact-in-double integers
    * (order-insensitive), so DuckDB restates the whole pipeline including
    * the RMS values — the codec round-trip must be the identity for the
    * hashes to match. Frame-count formula and RMS bounds also in ScalaTest. */
  def audioFrameSample(s: SparkSession, dir: String,
      frameLen: Int = 80, every: Int = 2): Dataset[Frame] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text, nChars) =>
          val nSamples = (nChars % 500).toInt + 100
          val src = text.getBytes("UTF-8")
          val samples = Array.tabulate(nSamples) { i =>
            (((src(i % src.length) & 0xFF) - 128) * 256).toShort
          }
          val pcm = decodeWavSamples(encodeWav(16000, samples))
          val nFrames = (pcm.length + frameLen - 1) / frameLen
          (0 until nFrames by every).map { f =>
            val start = f * frameLen
            val end = math.min(start + frameLen, pcm.length)
            var sumSq = 0.0
            var i = start
            while (i < end) { val v = pcm(i).toInt; sumSq += v.toDouble * v; i += 1 }
            Frame(id, f, math.rint(math.sqrt(sumSq / (end - start)) * 1e6) / 1e6)
          }
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_resize" -> ((s, d) => imageResize(s, d).toDF()),
    "q_frame_sample" -> ((s, d) => audioFrameSample(s, d).toDF()),
    "q_blob_meta" -> ((s, d) => blobMeta(s, d)),
    "q_blob_features" -> ((s, d) => blobFeatures(s, d).toDF()),
    "q_image_decode" -> ((s, d) => imageDecode(s, d).toDF()
      .select("doc_id", "img_w", "img_h", "bpp", "n_pixels")),
    "q_audio_decode" -> ((s, d) => audioDecode(s, d).toDF()
      .select("doc_id", "sample_rate", "n_samples")),
  )

  val oracle: Map[String, String] = Map(
    "q_blob_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CAST(n_chars % 640 AS INTEGER) AS img_w,
        |       CAST(n_chars % 480 AS INTEGER) AS img_h,
        |       CASE WHEN n_chars % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
        |FROM documents""".stripMargin,
    // header fields round-trip through the REAL BMP/WAV encode→parse path;
    // the oracle recomputes them from the deterministic dims/sample formulas
    "q_image_decode" ->
      """SELECT doc_id,
        |       CAST(4 + n_chars % 13 AS INTEGER) AS img_w,
        |       CAST(4 + n_chars % 11 AS INTEGER) AS img_h,
        |       CAST(24 AS INTEGER) AS bpp,
        |       CAST((4 + n_chars % 13) * (4 + n_chars % 11) AS INTEGER) AS n_pixels
        |FROM documents""".stripMargin,
    "q_audio_decode" ->
      """SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
        |       CAST(n_chars % 500 + 100 AS INTEGER) AS n_samples
        |FROM documents""".stripMargin,
    // thumbnail BMP byte size is format-determined: 54-byte headers + 8 rows
    // of (8*3 padded to 4) = 24 bytes → 54 + 192 = 246 for every doc
    "q_image_resize" ->
      """SELECT doc_id, CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
        |       CAST(246 AS INTEGER) AS thumb_bytes
        |FROM documents""".stripMargin,
    // the full decode→window→RMS pipeline restated: samples are
    // (byte − 128)·256 over the cycled document bytes (ASCII fixture ⇒
    // unicode() = byte), frames of 80 keeping every 2nd, Σv² exact in
    // double — a codec bug anywhere breaks the hash match
    "q_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS l,
        |         CAST(n_chars % 500 + 100 AS INTEGER) AS n
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text, l, n,
        |         unnest(range(0, CAST((n + 79) // 80 AS INTEGER), 2)) AS frame_idx
        |  FROM d),
        |r AS (
        |  SELECT doc_id, frame_idx,
        |         least(80, n - frame_idx * 80) AS flen,
        |         list_sum(list_transform(
        |           [ (unicode(text[((frame_idx*80 + j) % l) + 1 : ((frame_idx*80 + j) % l) + 1]) - 128) * 256
        |             for j in range(0, least(80, n - frame_idx * 80)) ],
        |           v -> CAST(v AS DOUBLE) * v)) AS sumsq
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       round(sqrt(sumsq / flen), 6) AS frame_rms
        |FROM r""".stripMargin,
    // q_blob_features: rows-only (stubbed decoder — byte stats only)
  )
}
