package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: T.81 Annex G spectral selection +
  * successive approximation, encoder and decoder.
  *
  * The load-bearing identity: progressive transmission is a REORDERING
  * of the same quantized coefficients, and [[JpegCodec.encodeJpegProgressive]]
  * quantizes identically to [[JpegCodec.encodeJpeg]] — so the decoded
  * progressive raster must equal the decoded baseline raster
  * BIT-FOR-BIT, with no lossy tolerance anywhere. That one assertion
  * covers the whole Annex-G surface the scan script emits: interleaved
  * DC first + refinement, banded AC first scans with EOB runs, ZRL in
  * refinement, and the correction-bit buffering protocol.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def ramp(w: Int, h: Int): (Int, Int) => Int = (x, y) => {
    val r = (x * 255 / math.max(1, w - 1)) & 0xff
    val g = (y * 255 / math.max(1, h - 1)) & 0xff
    val b = ((x + y) * 7) & 0xff
    (r << 16) | (g << 8) | b
  }

  // high-frequency content: exercises deep AC bands, ZRL runs and both
  // refinement ladders (many coefficients are ±1 at some precision)
  private def busy(w: Int, h: Int): (Int, Int) => Int = (x, y) => {
    val v = ((x * 37 + y * 91) ^ (x * y)) & 0xff
    val u = (255 - v) & 0xff
    (v << 16) | (u << 8) | ((v + u) & 0xff)
  }

  test("progressive == baseline decode, bit-for-bit (4:4:4, smooth + busy, odd sizes)") {
    for ((w, h, px) <- Seq((24, 16, ramp(24, 16)), (17, 13, busy(17, 13)),
        (8, 8, ramp(8, 8)), (33, 9, busy(33, 9)))) {
      val base = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 85))
      val prog = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpegProgressive(w, h, px, quality = 85))
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"${w}x$h diverged")
    }
  }

  test("progressive == baseline decode, bit-for-bit (4:2:0 subsampled)") {
    for ((w, h) <- Seq((32, 32), (24, 20), (17, 15))) {
      val px = busy(w, h)
      val base = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(w, h, px, quality = 90, subsample420 = true))
      val prog = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpegProgressive(w, h, px, quality = 90, subsample420 = true))
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"${w}x$h (4:2:0) diverged")
    }
  }

  test("grayscale progressive == grayscale baseline, incl. restart markers in every scan") {
    val w = 48; val h = 16
    def px(x: Int, y: Int): Int = ((x * 11 + y * 29) ^ (x * y / 3)) & 0xff
    val base = JpegCodec.decodeJpeg(JpegCodec.encodeJpegGray(w, h, px, 90))
    val prog = JpegCodec.decodeJpeg(JpegCodec.encodeJpegProgressiveGray(w, h, px, 90))
    assert(prog.rgb.toSeq == base.rgb.toSeq, "gray progressive diverged")
    // restart interval 2 on a 6x2-block image: RST0..RST5 inside DC,
    // AC-first AND AC-refinement scans (EOB runs must flush + reset)
    val rst = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegProgressiveGray(w, h, px, 90, restartInterval = 2))
    assert(rst.rgb.toSeq == base.rgb.toSeq, "restarted progressive diverged")
  }

  test("block-constant fixture decodes bit-exactly through the progressive path (gate contract)") {
    val w = 24; val h = 16
    def level(bx: Int, by: Int): Int = 2 + 3 * ((bx + 2 * by) % 85)
    val px: (Int, Int) => Int = (x, y) => {
      val v = level(x / 8, y / 8); (v << 16) | (v << 8) | v
    }
    val img = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegProgressive(w, h, px, quality = 90))
    for (y <- 0 until h; x <- 0 until w) {
      val v = level(x / 8, y / 8)
      assert(img.rgb(y * w + x) == ((v << 16) | (v << 8) | v), s"($x,$y)")
    }
  }

  test("dHash is invariant across baseline and progressive re-encodes of one raster") {
    val w = 36; val h = 28
    val px = ramp(w, h)
    val base = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 90))
    val prog = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegProgressive(w, h, px, quality = 90))
    assert(Multimodal.dHash64(base) == Multimodal.dHash64(prog),
      "perceptual hash diverged across encodings of the same image")
  }

  test("dHash invariant baseline↔progressive on the CHROMATIC 4:2:0 gate fixture") {
    // the mm_jpeg_progressive_color contract, spec-side: the color
    // block-constant fixture decodes to the same raster (hence the same
    // perceptual hash) whether transmitted baseline or progressive,
    // with chroma subsampled
    val w = 32; val h = 32
    def level(bx: Int, by: Int): Int = 20 + 3 * ((2 * bx + by) % 71)
    val px: (Int, Int) => Int = (x, y) => {
      val v = level(x / 8, y / 8)
      ((v + 6) << 16) | (v << 8) | (v + 9)
    }
    val base = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, px, quality = 90, subsample420 = true))
    val prog = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegProgressive(w, h, px, quality = 90, subsample420 = true))
    assert(prog.rgb.toSeq == base.rgb.toSeq, "color 4:2:0 progressive diverged")
    assert(Multimodal.dHash64(base) == Multimodal.dHash64(prog))
    // and the decoded offsets are exactly the gate's (+6, +1, +8) algebra
    for (y <- 0 until h; x <- 0 until w) {
      val v = level(x / 8, y / 8)
      assert(prog.rgb(y * w + x) ==
        (((v + 6) << 16) | ((v + 1) << 8) | (v + 8)), s"($x,$y)")
    }
  }

  test("progressive truncation refuses loudly: mid-scan cuts and lost refinement scans") {
    val good = JpegCodec.encodeJpegProgressive(32, 24, busy(32, 24), quality = 85)
    // cut inside entropy data of an early scan
    intercept[RuntimeException] {
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(good, good.length / 3))
    }
    // EOI before any scan
    val noScan = good.takeWhile(_ != 0xda.toByte) // crude: cut before first SOS marker payload
    intercept[RuntimeException] {
      JpegCodec.decodeJpeg(noScan ++ Array(0xff.toByte, 0xd9.toByte))
    }
  }
}
