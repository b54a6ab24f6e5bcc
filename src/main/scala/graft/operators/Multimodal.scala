package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus feature-extraction passes (driver
  * mandate; SURVEY.md §7 Phase 6).
  *
  * Three REAL codecs, none needing external libs:
  *  - `blobFeatures`: 8-bit truecolor PNG — full chunk walk with per-chunk
  *    CRC32 verification, IHDR parse, multi-IDAT zlib inflate
  *    (`java.util.zip.Inflater` — zlib ships in the JDK), and scanline
  *    unfiltering across all five PNG filter types (None/Sub/Up/Average/
  *    Paeth). The encoder applies a different filter per row, so the
  *    decoder's reconstruction paths are all exercised on every image.
  *  - `imageDecode` / `audioDecode`: 24-bit BMP and 16-bit PCM WAV — the
  *    payloads are genuine well-formed files (written by `encodeBmp` /
  *    `encodeWav` from deterministic doc-derived pixels/samples) and the
  *    decoders parse the actual headers (magic, dimensions, sample counts)
  *    and payload bytes.
  * Header fields AND channel means are oracle-checked for PNG (the means
  * survive only if inflate+unfilter reproduce the exact pixels); BMP/WAV
  * header fields are oracle-checked with stats round-trip-asserted in
  * ScalaTest. Formats that genuinely need native libs (JPEG/MP3) are out of
  * scope — their plumbing shape is identical to these three.
  *
  * All decode work runs in `mapPartitions` — one decoder context per
  * partition, streaming over rows — the batch shape a Python stack would
  * express as a Pandas UDF under `mapInPandas`.
  */
object Multimodal {

  /** Raw payload row fed to the decoder. */
  final case class BlobRow(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Features decoded from a PNG payload: IHDR header fields + per-channel
    * pixel means (exact integer sum / pixel count — one IEEE division, so
    * bit-identical across engines with no rounding step). */
  final case class PngFeatures(
      doc_id: Long, img_w: Int, img_h: Int, bit_depth: Int, color_type: Int,
      n_pixels: Int, mean_r: Double, mean_g: Double, mean_b: Double)

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

  // ===== real PNG codec (zlib via java.util.zip — no external libs) =====

  private val pngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG Paeth predictor (filter type 4), verbatim from the public spec:
    * pick whichever of left/up/upper-left is closest to left+up−upperLeft,
    * ties broken left, then up. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** One PNG chunk: 4-byte big-endian length, 4-byte type, data, CRC32 over
    * type+data. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(12 + data.length) // BE default
    out.putInt(data.length).put(tb).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** REAL PNG writer (8-bit truecolor, colour type 2): signature + IHDR +
    * zlib-deflated filtered scanlines in TWO IDAT chunks (the spec allows
    * any split and real encoders emit many — forces the reader to
    * concatenate) + IEND. Each row is filtered with type `row % 5`, so the
    * full None/Sub/Up/Average/Paeth reconstruction matrix is exercised by
    * every image taller than 4 rows. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // colour type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xFF
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xFF else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= 3) rgb((y - 1) * stride + x - 3) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val cbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) cbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val comp = cbuf.toByteArray
    val cut = comp.length / 2
    val chunks = Array(
      pngChunk("IHDR", ihdr.array()),
      pngChunk("IDAT", java.util.Arrays.copyOfRange(comp, 0, cut)),
      pngChunk("IDAT", java.util.Arrays.copyOfRange(comp, cut, comp.length)),
      pngChunk("IEND", Array.emptyByteArray))
    val out = java.nio.ByteBuffer.allocate(8 + chunks.map(_.length).sum)
    out.put(pngSig); chunks.foreach(out.put)
    out.array()
  }

  /** REAL PNG parser: validates the 8-byte signature, walks chunks with
    * per-chunk CRC32 verification and Long-arithmetic bounds checks (a
    * hostile length can't overflow past the payload), parses IHDR,
    * concatenates every IDAT, inflates the zlib stream to the exact
    * filtered-scanline size, and unfilters all five filter types. Malformed
    * input — bad magic, truncation, CRC corruption, over/under-sized IDAT,
    * unknown filter — fails with a diagnosable IllegalArgumentException,
    * never an index error or a hang. Ancillary chunks are skipped, per spec.
    * Returns (w, h, bitDepth, colorType, top-down RGB pixels). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 8, s"truncated PNG: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require(bytes(i) == pngSig(i), "not a PNG (bad signature)"); i += 1
    }
    val buf = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var pos = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 8 <= bytes.length && !seenIend) {
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"corrupt PNG chunk len=$len at $pos in ${bytes.length} bytes")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(pos + 8 + len),
        s"PNG chunk '$typ' CRC mismatch at $pos")
      typ match {
        case "IHDR" =>
          require(len == 13, s"bad IHDR length $len")
          w = buf.getInt(pos + 8); h = buf.getInt(pos + 12)
          bitDepth = bytes(pos + 16) & 0xFF
          colorType = bytes(pos + 17) & 0xFF
          require(w > 0 && h > 0, s"bad PNG dims ${w}x$h")
          require(bitDepth == 8 && colorType == 2,
            s"unsupported bitDepth=$bitDepth colorType=$colorType " +
              "(8-bit truecolor only)")
          require((bytes(pos + 18) & 0xFF) == 0 && (bytes(pos + 19) & 0xFF) == 0
            && (bytes(pos + 20) & 0xFF) == 0,
            "unsupported compression/filter/interlace method")
          require(h.toLong * (1 + w.toLong * 3) <= Int.MaxValue,
            s"PNG dims ${w}x$h overflow the pixel buffer")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk — skip
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "missing IHDR/IEND chunk")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var off = 0
    var stalled = false
    while (!infl.finished() && off < raw.length && !stalled) {
      val n = infl.inflate(raw, off, raw.length - off)
      if (n == 0 && !infl.finished()) stalled = true // truncated/garbled
      off += n
    }
    require(off == raw.length,
      s"IDAT inflated to $off bytes, expected ${raw.length}")
    val scratch = new Array[Byte](1)
    require(infl.finished() || infl.inflate(scratch) == 0,
      "IDAT stream longer than the declared image")
    infl.end()
    val rgb = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xFF
      require(f <= 4, s"bad PNG filter type $f on row $y")
      var x = 0
      while (x < stride) {
        val v = raw(y * (1 + stride) + 1 + x) & 0xFF
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xFF else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= 3) rgb((y - 1) * stride + x - 3) & 0xFF else 0
        val recon = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case _ => v + paeth(left, up, ul)
        }
        rgb(y * stride + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, bitDepth, colorType, rgb)
  }

  /** documents → real PNG payloads → full decode (CRC walk, inflate,
    * unfilter) → header fields + per-channel means, one codec pass per
    * partition. Every output column is oracle-checked: the dims come from
    * the shared `imgDims` formula and the channel means are exact integer
    * sums over the doc-derived pixels, which DuckDB restates directly from
    * the text — so a bug anywhere in deflate→inflate or filter→unfilter
    * changes the means and breaks the hash. (Formerly the repo's one stub;
    * now the third real codec beside BMP and WAV.) */
  def blobFeatures(s: SparkSession, dir: String): Dataset[PngFeatures] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val (w, h) = imgDims(nChars)
          val png = encodePng(w, h, cycled(text.getBytes("UTF-8"), w * h * 3))
          val (dw, dh, bd, ct, rgb) = decodePng(png)
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = 0
          val n = dw * dh
          while (p < n) {
            sr += rgb(p * 3) & 0xFF
            sg += rgb(p * 3 + 1) & 0xFF
            sb += rgb(p * 3 + 2) & 0xFF
            p += 1
          }
          PngFeatures(id, dw, dh, bd, ct, n,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
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

  final case class PHash(doc_id: Long, hash_hi: Long, hash_lo: Long, n_set: Int)

  /** Perceptual image hash (average hash): the image near-dup fingerprint —
    * resize to 8×8, grayscale, threshold each cell against the global mean,
    * pack the 64 bits. Two identical-looking images land at hamming
    * distance ~0 regardless of resolution; pairing then rides the SAME
    * banded-hamming equi-join shape as `q_simhash_pairs` (4×16-bit bands),
    * so the pairwise stage needs no new machinery — this query certifies
    * the per-image fingerprint itself, with the REAL codec in the loop:
    * encode the doc-derived BMP, decode its pixel array, nearest-neighbor
    * resize, then hash. All integer arithmetic — gray = r+g+b (0..765,
    * channel-order-proof), threshold `64·gray > Σgray` (no division), and
    * the 64 bits emitted as two 32-bit halves so neither engine touches
    * the BIGINT sign bit. The oracle restates encode→decode→resize→gray→
    * threshold from the deterministic pixel formulas: any codec, resize
    * index, or bit-packing bug flips a bit and the hash compare goes red.
    * Row-local map pass, one codec context per partition, no shuffle. */
  def imagePhash(s: SparkSession, dir: String): Dataset[PHash] = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nChars) =>
          val (w, h) = imgDims(nChars)
          val bmp = encodeBmp(w, h, cycled(text.getBytes("UTF-8"), w * h * 3))
          val (dw, dh, rgb) = decodeBmpPixels(bmp)
          val thumb = resizeRgb(dw, dh, rgb, 8, 8)
          val gray = Array.tabulate(64) { i =>
            (thumb(3 * i) & 0xff) + (thumb(3 * i + 1) & 0xff) + (thumb(3 * i + 2) & 0xff)
          }
          val total = gray.sum
          var hi = 0L; var lo = 0L; var nSet = 0
          var i = 0
          while (i < 64) {
            if (64 * gray(i) > total) {
              nSet += 1
              if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
            }
            i += 1
          }
          PHash(id, hi, lo, nSet)
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

  /** `q_image_phash` oracle: encode→decode→resize→gray→threshold restated
    * from the deterministic pixel formulas. `byteAt(k)` is byte k of the
    * cycled utf-8 text (ASCII fixture ⇒ `unicode()` = byte, as in
    * `q_frame_sample`); resized cell i (x=i%8, y=i//8) samples source pixel
    * p = (y·h/8)·w + (x·w/8); gray = the three channel bytes 3p..3p+2. */
  private val imagePhashSql: String = {
    def byteAt(k: String): String =
      s"unicode(text[(($k) % l) + 1 : (($k) % l) + 1])"
    val p = "(((i // 8) * h // 8) * w + ((i % 8) * w // 8))"
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS l,
       |         CAST(4 + n_chars % 13 AS INTEGER) AS w,
       |         CAST(4 + n_chars % 11 AS INTEGER) AS h
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, i,
       |         ${byteAt(s"3 * $p")} + ${byteAt(s"3 * $p + 1")}
       |           + ${byteAt(s"3 * $p + 2")} AS gray
       |  FROM (SELECT doc_id, text, l, w, h, unnest(range(0, 64)) AS i FROM d)),
       |t AS (SELECT doc_id, sum(gray) AS total FROM g GROUP BY doc_id),
       |b AS (
       |  SELECT g.doc_id, g.i,
       |         CASE WHEN 64 * g.gray > t.total THEN 1 ELSE 0 END AS bit
       |  FROM g JOIN t USING (doc_id))
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN i >= 32 THEN bit * (CAST(1 AS BIGINT) << (i - 32))
       |           ELSE 0 END) AS BIGINT) AS hash_hi,
       |  CAST(sum(CASE WHEN i < 32 THEN bit * (CAST(1 AS BIGINT) << i)
       |           ELSE 0 END) AS BIGINT) AS hash_lo,
       |  CAST(sum(bit) AS INTEGER) AS n_set
       |FROM b GROUP BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_phash" -> ((s, d) => imagePhash(s, d).toDF()),
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
    "q_image_phash" -> imagePhashSql,
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
    // the full PNG encode→decode round trip restated: pixels are the
    // cycled document bytes (ASCII fixture ⇒ unicode() = byte), channel c
    // of pixel p is byte (3p+c) mod len — integer sums are exact, and the
    // single sum/count division is one IEEE op on both engines. The hash
    // matches only if deflate→inflate and filter→unfilter are identities.
    "q_blob_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS l,
        |         CAST(4 + n_chars % 13 AS INTEGER) AS w,
        |         CAST(4 + n_chars % 11 AS INTEGER) AS h
        |  FROM documents)
        |SELECT doc_id, w AS img_w, h AS img_h,
        |       CAST(8 AS INTEGER) AS bit_depth,
        |       CAST(2 AS INTEGER) AS color_type,
        |       CAST(w * h AS INTEGER) AS n_pixels,
        |       CAST(list_sum([unicode(text[((3*p) % l) + 1 : ((3*p) % l) + 1])
        |                      for p in range(0, w*h)]) AS DOUBLE) / (w*h) AS mean_r,
        |       CAST(list_sum([unicode(text[((3*p+1) % l) + 1 : ((3*p+1) % l) + 1])
        |                      for p in range(0, w*h)]) AS DOUBLE) / (w*h) AS mean_g,
        |       CAST(list_sum([unicode(text[((3*p+2) % l) + 1 : ((3*p+2) % l) + 1])
        |                      for p in range(0, w*h)]) AS DOUBLE) / (w*h) AS mean_b
        |FROM d""".stripMargin,
  )
}
