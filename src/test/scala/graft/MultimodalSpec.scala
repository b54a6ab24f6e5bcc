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
}
