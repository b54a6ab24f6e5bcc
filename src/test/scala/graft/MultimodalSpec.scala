package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the real BMP/WAV codecs: whatever the encoder
  * writes, the parser must recover — dims, sample counts, and channel/sample
  * statistics computed independently of the codec path. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import operators.Multimodal

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("malformed BMP/WAV payloads fail cleanly: no index errors, no hangs") {
    val bmp = Multimodal.encodeBmp(5, 4, Array.tabulate(5 * 4 * 3)(i => i.toByte))
    val wav = Multimodal.encodeWav(16000, Array.tabulate(200)(i => (i * 31).toShort))

    def diagnosable(body: => Any): Unit =
      try { body; () } catch {
        case _: IllegalArgumentException => () // the contract: require(...)
        case t: Throwable => fail(s"non-diagnosable failure ${t.getClass}: ${t.getMessage}")
      }

    // targeted corruptions the decoders must reject (not index-crash on):
    //  - truncation at every prefix length, including mid-header and
    //    mid-pixel-array / mid-data-chunk
    for (n <- 0 to bmp.length by 7) diagnosable(Multimodal.decodeBmp(1L, bmp.take(n)))
    for (n <- 0 to wav.length by 7) diagnosable(Multimodal.decodeWav(1L, wav.take(n)))
    //  - pixel-array offset pointing past the payload / negative
    for (off <- Seq(Int.MaxValue, -1, bmp.length)) {
      val b = bmp.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, off)
      diagnosable(Multimodal.decodeBmp(1L, b))
      diagnosable(Multimodal.decodeBmpPixels(b))
    }
    //  - hostile dims (overflow bait: width where w*3 overflows Int)
    for ((w, h) <- Seq((Int.MaxValue, 4), (-5, 4), (5, -4), (0x50000000, 2))) {
      val b = bmp.clone()
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(18, w); bb.putInt(22, h)
      diagnosable(Multimodal.decodeBmp(1L, b))
    }
    //  - RIFF chunk with negative length: the unguarded walk would loop
    //    forever (pos += 8 + len stops advancing); must throw instead
    for (len <- Seq(-8, -1, Int.MinValue, wav.length)) {
      val b = wav.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(16, len)
      diagnosable(Multimodal.decodeWav(1L, b))
      diagnosable(Multimodal.decodeWavSamples(b))
    }
    //  - random byte-flip fuzz (seeded): decode must either succeed or
    //    throw IllegalArgumentException, never anything else
    val rnd = new scala.util.Random(4242L)
    for (_ <- 1 to 300) {
      val b = bmp.clone(); val w2 = wav.clone()
      for (_ <- 1 to 4) {
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        w2(rnd.nextInt(w2.length)) = rnd.nextInt(256).toByte
      }
      diagnosable(Multimodal.decodeBmp(1L, b))
      diagnosable(Multimodal.decodeBmpPixels(b))
      diagnosable(Multimodal.decodeWav(1L, w2))
      diagnosable(Multimodal.decodeWavSamples(w2))
    }
  }

  test("BMP encode→decode round-trips dims and channel means (incl. padded rows)") {
    val widths = Seq(4, 5, 7, 16) // 5 and 7 force non-trivial row padding
    for (w <- widths; h <- Seq(4, 9)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val f = Multimodal.decodeBmp(1L, Multimodal.encodeBmp(w, h, rgb))
      assert(f.img_w == w && f.img_h == h && f.bpp == 24 && f.n_pixels == w * h)
      def mean(ch: Int): Double = {
        val s = rgb.indices.collect { case i if i % 3 == ch => rgb(i) & 0xFF }.sum
        math.rint(s.toDouble / (w * h) * 1e6) / 1e6
      }
      assert(f.mean_r == mean(0), s"w=$w h=$h r")
      assert(f.mean_g == mean(1), s"w=$w h=$h g")
      assert(f.mean_b == mean(2), s"w=$w h=$h b")
    }
  }

  test("WAV encode→decode round-trips rate, count, rms, peak (property)") {
    check(forAll(
      Gen.nonEmptyListOf(Gen.chooseNum[Short](Short.MinValue, Short.MaxValue)),
      Gen.chooseNum(8000, 48000)) { (xs, rate) =>
      val samples = xs.toArray
      val f = Multimodal.decodeWav(7L, Multimodal.encodeWav(rate, samples))
      val rms = math.rint(math.sqrt(
        samples.map(v => v.toDouble * v).sum / samples.length) * 1e6) / 1e6
      f.sample_rate == rate && f.n_samples == samples.length &&
        f.rms == rms && f.peak == samples.map(v => math.abs(v.toInt)).max
    })
  }

  test("image/audio decode queries run distributed over the fixture docs") {
    val img = Multimodal.imageDecode(spark, sf).collect()
    val aud = Multimodal.audioDecode(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(img.length == nDocs && aud.length == nDocs)
    assert(img.forall(r => r.n_pixels == r.img_w * r.img_h))
    assert(aud.forall(r => r.sample_rate == 16000 && r.peak <= 32768))
  }

  test("nearest-neighbor resize: identity at same dims, mean-exact on constant images") {
    import operators.Multimodal._
    val w = 7; val h = 5
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    // identity: resizing to the source dims copies every pixel
    assert(resizeRgb(w, h, rgb, w, h).toSeq == rgb.toSeq)
    // constant image: any resize preserves every channel value exactly
    val const = Array.fill(w * h * 3)(77.toByte)
    val small = resizeRgb(w, h, const, 3, 2)
    assert(small.forall(_ == 77.toByte))
    // thumbnail BMP geometry matches the oracle's constant
    val thumb = encodeBmp(8, 8, resizeRgb(w, h, rgb, 8, 8))
    assert(thumb.length == 246)
    // resized pixels are source pixels (nearest-neighbor never interpolates)
    val rs = resizeRgb(w, h, rgb, 3, 3)
    val srcPixels = rgb.grouped(3).map(_.toSeq).toSet
    assert(rs.grouped(3).map(_.toSeq).forall(srcPixels.contains))
  }

  test("audio frame sampling: every-2nd-frame count formula and RMS bounds") {
    val frames = operators.Multimodal.audioFrameSample(spark, sf).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val nChars = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, fs) =>
      val nSamples = (nChars(id) % 500).toInt + 100
      val total = (nSamples + 79) / 80
      val expected = (total + 1) / 2 // frames 0, 2, 4, ...
      assert(fs.length == expected, s"doc $id: ${fs.length} != $expected")
      assert(fs.forall(f => f.frame_idx % 2 == 0))
      assert(fs.forall(f => f.frame_rms >= 0.0 && f.frame_rms <= 32768.0))
    }
    assert(byDoc.size == nChars.size)
  }

  test("PNG encode→decode is the identity on arbitrary pixels (property)") {
    val gen = for {
      w <- Gen.choose(1, 20)
      h <- Gen.choose(1, 20) // h ≥ 5 exercises all five filter types
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    check(forAll(gen) { case (w, h, rgb) =>
      val (dw, dh, bd, ct, out) = Multimodal.decodePng(Multimodal.encodePng(w, h, rgb))
      dw == w && dh == h && bd == 8 && ct == 2 && out.sameElements(rgb)
    })
  }

  test("PNG decoder rejects malformed payloads cleanly: no index errors, no hangs") {
    val png = Multimodal.encodePng(7, 6, Array.tabulate(7 * 6 * 3)(i => (i * 37).toByte))

    def diagnosable(body: => Any): Unit =
      try { body; () } catch {
        case _: IllegalArgumentException => () // the contract: require(...)
        case t: Throwable => fail(s"non-diagnosable failure ${t.getClass}: ${t.getMessage}")
      }
    def failsWith(frag: String)(body: => Any): Unit =
      try { body; fail(s"expected rejection mentioning '$frag'") } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
        case t: Throwable => fail(s"non-diagnosable failure ${t.getClass}: ${t.getMessage}")
      }

    // truncation at every prefix length — mid-signature, mid-chunk, mid-CRC
    for (n <- 0 to png.length by 5) diagnosable(Multimodal.decodePng(png.take(n)))
    // bad signature
    failsWith("signature") {
      val b = png.clone(); b(0) = 0x7F.toByte; Multimodal.decodePng(b)
    }
    // single-byte corruption inside the first IDAT's data — CRC must catch it
    failsWith("CRC") {
      val b = png.clone()
      val idatPos = 8 + 12 + 13 // after signature + IHDR chunk
      b(idatPos + 8) = (b(idatPos + 8) ^ 0x55).toByte
      Multimodal.decodePng(b)
    }
    // hostile declared chunk length (points far past the payload)
    failsWith("corrupt PNG chunk") {
      val b = png.clone()
      java.nio.ByteBuffer.wrap(b).putInt(8, Int.MaxValue)
      Multimodal.decodePng(b)
    }
    // declared dims larger than the encoded stream: inflate comes up short
    failsWith("inflated") {
      val b = png.clone()
      val buf = java.nio.ByteBuffer.wrap(b)
      buf.putInt(8 + 8, 7).putInt(8 + 12, 600) // h: 6 → 600, re-CRC the IHDR
      val crc = new java.util.zip.CRC32
      crc.update(b, 8 + 4, 4 + 13)
      buf.putInt(8 + 8 + 13, crc.getValue.toInt)
      Multimodal.decodePng(b)
    }
  }

  test("PNG query means equal an independent per-doc pixel computation") {
    val feats = Multimodal.blobFeatures(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(feats.length == docs.size)
    feats.foreach { f =>
      val (text, nChars) = docs(f.doc_id)
      val (w, h) = (4 + (nChars % 13).toInt, 4 + (nChars % 11).toInt)
      assert(f.img_w == w && f.img_h == h && f.n_pixels == w * h)
      val src = text.getBytes("UTF-8")
      var sr = 0L; var p = 0
      while (p < w * h) { sr += src((3 * p) % src.length) & 0xFF; p += 1 }
      assert(f.mean_r == sr.toDouble / (w * h), s"doc ${f.doc_id} mean_r")
    }
  }

  test("phash: 32-bit halves, popcount consistent, constant image → zero") {
    val rows = Multimodal.imagePhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hi = r.hash_hi; val lo = r.hash_lo
      assert(hi >= 0 && hi <= 0xFFFFFFFFL && lo >= 0 && lo <= 0xFFFFFFFFL)
      assert(java.lang.Long.bitCount(hi) + java.lang.Long.bitCount(lo) == r.n_set)
      // a cell strictly above the mean implies another strictly below it
      assert(r.n_set < 64)
    }
    // constant-color image through the real codec: no cell exceeds the
    // mean, so the perceptual hash is exactly zero
    val w = 10; val h = 7
    val flat = Array.fill(w * h * 3)(77.toByte)
    val bmp = Multimodal.encodeBmp(w, h, flat)
    val (dw, dh, rgb) = Multimodal.decodeBmpPixels(bmp)
    val thumb = Multimodal.resizeRgb(dw, dh, rgb, 8, 8)
    assert(thumb.forall(_ == 77.toByte))
  }
}
