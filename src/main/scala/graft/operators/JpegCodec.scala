package graft.operators

import graft.operators.MediaCodec.ImageData

/** Pure-JVM baseline JFIF JPEG codec — the dominant real-world image
  * format, previously the loudest gap in [[Multimodal]]'s decode seam
  * (every JPEG payload stub-fell-back to fake features).
  *
  * Same honesty standard as the PNG inflate / GIF LZW in
  * [[MediaCodec]]: a REAL entropy decode (canonical Huffman per ITU
  * T.81 §F.2), real dequantize + 2-D IDCT, real chroma upsampling —
  * not a wrapper and not a stub. Scope is baseline sequential DCT
  * (SOF0/SOF1) AND progressive DCT (SOF2: spectral selection +
  * successive approximation per T.81 Annex G — the other half of real
  * web JPEGs), 8-bit, 1 or 3 components, sampling factors 1-2 (covers
  * 4:4:4, 4:2:2 and 4:2:0 — the layouts cameras and web encoders
  * actually emit), with restart-marker support in every scan shape.
  * Arithmetic coding, 12-bit and hierarchical refuse loudly — a silent
  * garbage decode is worse than a loud refusal.
  *
  * The encoder exists so tests and gates can synthesize deterministic
  * JPEGs without native libs (none are in this container): baseline,
  * Annex-K tables scaled by libjpeg's quality formula, 4:4:4 or
  * 4:2:0. JPEG is lossy, so round-trip pinning splits in two: 8x8
  * BLOCK-CONSTANT images whose DC coefficients are multiples of the
  * quant step survive BIT-EXACTLY (DCT of a constant block is DC-only
  * — that exactness is the `mm_jpeg_decode` gate's DuckDB oracle),
  * and full-frequency content is pinned by error bounds in
  * MultimodalSpec.
  *
  * All table constants are from the public JPEG standard (ITU T.81
  * Annex K) — the same tables every conforming encoder ships.
  */
object JpegCodec {

  private val MaxPixels = 1L << 26 // match MediaCodec's decode bound

  // ---- Annex K tables -------------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  private val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // (bits-per-length 1..16, symbol values) — T.81 Annex K.3
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** libjpeg quality scaling: natural-order base table → quantizer. */
  private[operators] def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality outside 1..100")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  // ---- Huffman code construction (shared by encode + decode) ----------

  /** Canonical codes per T.81 §C.2: (symbol → (code, length)). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        codes(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  /** Decode tables per T.81 §F.2.2.3: mincode/maxcode/valptr. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (bits(len) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.readBit()
      var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | in.readBit()
        len += 1
      }
      require(len <= 16, "corrupt Huffman stream: no code within 16 bits")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  // ---- bit IO ----------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  /** Entropy-segment reader: unstuffs FF00, refuses to run past a
    * marker (callers consume RSTn explicitly via [[syncRestart]]).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Set once a real marker inside entropy data starts feeding
      * substituted zero bits. Zero-fill WITHIN the final MCU is the
      * T.81-sanctioned way truncated streams terminate; the scan loop
      * checks this flag between MCUs and refuses to fabricate WHOLE
      * MCUs from it — a stream cut at a marker boundary (e.g. headers +
      * premature EOI) must fail loudly, not decode to flat gray.
      */
    var zeroFill = false
    def readBit(): Int = {
      if (nBits == 0) {
        require(pos < bytes.length, "entropy stream truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "entropy stream truncated at FF")
          val next = bytes(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed data byte
          else {
            // a real marker inside entropy data: T.81 allows the decoder
            // to substitute zero bits until the scan logic consumes the
            // marker (this is how truncated final MCUs terminate)
            pos -= 1
            b = 0
            zeroFill = true
          }
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def syncRestart(expected: Int): Unit = {
      nBits = 0
      require(pos + 1 < bytes.length, "truncated at restart marker")
      require((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + expected),
        f"expected RST$expected%d at $pos, got " +
          f"${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  // T.81 §F.2.2.1: extend a SIZE-bit magnitude to a signed value
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private def bitSize(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ---- DCT -------------------------------------------------------------

  /** Forward 2-D DCT-II, separable double-precision (64 + 64 dot
    * products of length 8 per block — exactness over speed; encode is a
    * test/gate synthesis path, not the 100 TB hot path).
    */
  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows
      var y = 0
      while (y < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * CosTab(x)(u); x += 1 }
        tmp(y * 8 + u) = s * Cn(u)
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // columns
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * CosTab(y)(v); y += 1 }
        out(v * 8 + u2) = s * Cn(v)
        u2 += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 2-D DCT, separable double-precision. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: sum over u
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Cn(u) * coef(y * 8 + u) * CosTab(x)(u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x2 = 0
    while (x2 < 8) { // columns: sum over v
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += Cn(v) * tmp(v * 8 + x2) * CosTab(y2)(v); v += 1 }
        out(y2 * 8 + x2) = s
        y2 += 1
      }
      x2 += 1
    }
    out
  }

  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) math.sqrt(0.125) else 0.5)

  // ---- encoder ----------------------------------------------------------

  /** Encode `pixel(x, y) → 0xRRGGBB` as baseline JFIF. `subsample420`
    * selects 2x2 chroma subsampling (the camera/web default layout);
    * false emits 4:4:4.
    */
  def encodeJpeg(width: Int, height: Int, pixel: (Int, Int) => Int,
      quality: Int = 90, subsample420: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPixels, s"bad dimensions ${width}x$height")
    // SOF0 carries dimensions as u16: larger values would silently
    // truncate into a corrupt-but-well-formed stream
    require(width <= 65535 && height <= 65535,
      s"JPEG dimensions cap at 65535, got ${width}x$height")
    val qLuma = scaledQuant(QLumaBase, quality)
    val qChroma = scaledQuant(QChromaBase, quality)

    // full-resolution YCbCr planes (JFIF/BT.601 full range)
    val n = width * height
    val yP = new Array[Double](n)
    val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        val p = pixel(xx, yy)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
        cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        i += 1; xx += 1
      }
      yy += 1
    }
    def sampleAt(p: Array[Double], x: Int, y: Int): Double =
      p(math.min(y, height - 1) * width + math.min(x, width - 1))

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u16(0x0101); u8(0); u16(1); u16(1); u8(0); u8(0)
    // DQT: both tables, 8-bit precision, ZIGZAG order on the wire
    marker(0xdb); u16(2 + 2 * 65)
    u8(0x00); ZigZag.foreach(z => u8(qLuma(z)))
    u8(0x01); ZigZag.foreach(z => u8(qChroma(z)))
    // SOF0
    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    marker(0xc0); u16(8 + 3 * 3); u8(8); u16(height); u16(width); u8(3)
    u8(1); u8((hY << 4) | vY); u8(0) // Y
    u8(2); u8(0x11); u8(1)           // Cb
    u8(3); u8(0x11); u8(1)           // Cr
    // DHT: all four Annex-K tables
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((cls << 4) | id)
      (1 to 16).foreach(l => u8(bits(l)))
      vals.foreach(u8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    // SOS
    marker(0xda); u16(6 + 2 * 3); u8(3)
    u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11)
    u8(0); u8(63); u8(0)

    val dcLumaC = buildCodes(DcLumaBits, DcLumaVals)
    val acLumaC = buildCodes(AcLumaBits, AcLumaVals)
    val dcChromaC = buildCodes(DcChromaBits, DcChromaVals)
    val acChromaC = buildCodes(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)

    def encodeBlock(samples: Array[Double], q: Array[Int], dcPred: Int,
        dcC: Array[(Int, Int)], acC: Array[(Int, Int)]): Int = {
      val shifted = samples.map(_ - 128.0)
      val coef = fdct(shifted)
      val zz = new Array[Int](64)
      var k = 0
      while (k < 64) {
        val nat = ZigZag(k)
        zz(k) = math.round(coef(nat) / q(nat)).toInt
        k += 1
      }
      val diff = zz(0) - dcPred
      val s = bitSize(diff)
      val (c, l) = dcC(s); bw.write(c, l)
      if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var run = 0
      k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acC(0xf0); bw.write(zc, zl); run -= 16 }
          val sz = bitSize(zz(k))
          val (ac, al) = acC((run << 4) | sz); bw.write(ac, al)
          bw.write(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = acC(0x00); bw.write(ec, el) } // EOB
      zz(0)
    }

    def blockAt(p: Array[Double], bx: Int, by: Int, step: Int): Array[Double] = {
      // step = 1: full-res block at pixel (bx, by); step = 2: 2x2-mean
      // downsampled chroma block covering 16x16 source pixels
      val blk = new Array[Double](64)
      var j = 0
      while (j < 8) {
        var i2 = 0
        while (i2 < 8) {
          blk(j * 8 + i2) =
            if (step == 1) sampleAt(p, bx + i2, by + j)
            else {
              val sx = bx + i2 * 2; val sy = by + j * 2
              (sampleAt(p, sx, sy) + sampleAt(p, sx + 1, sy) +
                sampleAt(p, sx, sy + 1) + sampleAt(p, sx + 1, sy + 1)) / 4.0
            }
          i2 += 1
        }
        j += 1
      }
      blk
    }

    var dcY = 0; var dcCb = 0; var dcCr = 0
    if (!subsample420) {
      val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
      var my = 0
      while (my < mcuH) {
        var mx = 0
        while (mx < mcuW) {
          dcY = encodeBlock(blockAt(yP, mx * 8, my * 8, 1), qLuma, dcY, dcLumaC, acLumaC)
          dcCb = encodeBlock(blockAt(cbP, mx * 8, my * 8, 1), qChroma, dcCb, dcChromaC, acChromaC)
          dcCr = encodeBlock(blockAt(crP, mx * 8, my * 8, 1), qChroma, dcCr, dcChromaC, acChromaC)
          mx += 1
        }
        my += 1
      }
    } else {
      val mcuW = (width + 15) / 16; val mcuH = (height + 15) / 16
      var my = 0
      while (my < mcuH) {
        var mx = 0
        while (mx < mcuW) {
          var by = 0
          while (by < 2) {
            var bx = 0
            while (bx < 2) {
              dcY = encodeBlock(blockAt(yP, mx * 16 + bx * 8, my * 16 + by * 8, 1),
                qLuma, dcY, dcLumaC, acLumaC)
              bx += 1
            }
            by += 1
          }
          dcCb = encodeBlock(blockAt(cbP, mx * 16, my * 16, 2), qChroma, dcCb, dcChromaC, acChromaC)
          dcCr = encodeBlock(blockAt(crP, mx * 16, my * 16, 2), qChroma, dcCr, dcChromaC, acChromaC)
          mx += 1
        }
        my += 1
      }
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Single-component (grayscale) baseline JFIF — the other SOF shape
    * real corpora contain (scanned documents, masks); exists mainly so
    * the decoder's 1-component path is pinned by a real stream, not
    * dead code. `pixel(x, y)` is the 0..255 luma level.
    */
  def encodeJpegGray(width: Int, height: Int, pixel: (Int, Int) => Int,
      quality: Int = 90, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPixels, s"bad dimensions ${width}x$height")
    require(width <= 65535 && height <= 65535,
      s"JPEG dimensions cap at 65535, got ${width}x$height")
    require(restartInterval >= 0, s"bad restart interval $restartInterval")
    val qLuma = scaledQuant(QLumaBase, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(2 + 65); u8(0x00); ZigZag.foreach(z => u8(qLuma(z)))
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xc0); u16(8 + 3); u8(8); u16(height); u16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((cls << 4) | id)
      (1 to 16).foreach(l => u8(bits(l)))
      vals.foreach(u8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0)
    val dcC = buildCodes(DcLumaBits, DcLumaVals)
    val acC = buildCodes(AcLumaBits, AcLumaVals)
    val bw = new BitWriter(out)
    var dc = 0
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align (1-padded), emit RSTn, reset the DC predictor —
          // the camera-JPEG resync structure the decoder must consume
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          dc = 0
        }
        mcu += 1
        val blk = new Array[Double](64)
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val sx = math.min(mx * 8 + i, width - 1)
            val sy = math.min(my * 8 + j, height - 1)
            blk(j * 8 + i) = (pixel(sx, sy) & 0xff).toDouble - 128.0
            i += 1
          }
          j += 1
        }
        val coef = fdct(blk)
        val zz = new Array[Int](64)
        var k = 0
        while (k < 64) {
          val nat = ZigZag(k)
          zz(k) = math.round(coef(nat) / qLuma(nat)).toInt
          k += 1
        }
        val diff = zz(0) - dc
        dc = zz(0)
        val s = bitSize(diff)
        val (c, l) = dcC(s); bw.write(c, l)
        if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        var run = 0
        k = 1
        while (k < 64) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = acC(0xf0); bw.write(zc, zl); run -= 16 }
            val sz = bitSize(zz(k))
            val (ac, al) = acC((run << 4) | sz); bw.write(ac, al)
            bw.write(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acC(0x00); bw.write(ec, el) }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  // ---- progressive encoder ---------------------------------------------

  /** Uniform-length Huffman tables for progressive scans. Annex K's AC
    * tables lack the EOBn (r = 1..14) run symbols §G.1.2.2 needs, so
    * the progressive encoder ships its own: every symbol a progressive
    * AC scan can emit — EOB0..EOB14, ZRL, (run, size 1..10) — at 8 bits
    * (176 codes < 256, canonical, all-ones code unused), and the 12 DC
    * categories at 4 bits. Deliberately suboptimal and trivially valid:
    * these streams exist to pin the DECODER, not to compress.
    */
  private val DcProgBits: Array[Int] = {
    val b = new Array[Int](17); b(4) = 12; b
  }
  private val DcProgVals: Array[Int] = (0 to 11).toArray
  private val AcProgVals: Array[Int] =
    (((0 to 14).map(r => r << 4) :+ 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray
  private val AcProgBits: Array[Int] = {
    val b = new Array[Int](17); b(8) = AcProgVals.length; b
  }

  /** One progressive scan's parameters: component indices (into the
    * frame component list), spectral band, successive approximation.
    */
  private final case class ProgScan(compIdx: Seq[Int], ss: Int, se: Int,
      ah: Int, al: Int)

  /** The scan script: a trimmed libjpeg-default shape that exercises
    * every Annex-G decode path — interleaved DC first + refinement,
    * per-component spectral-selection AC bands, and a two-step AC
    * successive-approximation ladder on every component.
    */
  private def progScript(nComp: Int): Seq[ProgScan] =
    if (nComp == 1) Seq(
      ProgScan(Seq(0), 0, 0, 0, 1),   // DC first, Al=1
      ProgScan(Seq(0), 1, 5, 0, 2),   // AC low band first, Al=2
      ProgScan(Seq(0), 6, 63, 0, 2),  // AC high band first, Al=2
      ProgScan(Seq(0), 1, 63, 2, 1),  // AC refine 2→1
      ProgScan(Seq(0), 0, 0, 1, 0),   // DC refine
      ProgScan(Seq(0), 1, 63, 1, 0))  // AC refine 1→0
    else Seq(
      ProgScan(0 until nComp, 0, 0, 0, 1),
      ProgScan(Seq(0), 1, 5, 0, 2),
      ProgScan(Seq(2), 1, 63, 0, 1),
      ProgScan(Seq(1), 1, 63, 0, 1),
      ProgScan(Seq(0), 6, 63, 0, 2),
      ProgScan(Seq(0), 1, 63, 2, 1),
      ProgScan(0 until nComp, 0, 0, 1, 0),
      ProgScan(Seq(2), 1, 63, 1, 0),
      ProgScan(Seq(1), 1, 63, 1, 0),
      ProgScan(Seq(0), 1, 63, 1, 0))

  /** Encode as progressive (SOF2) JFIF. Quantization is IDENTICAL to
    * [[encodeJpeg]] at the same quality (same fdct, same scaled Annex-K
    * tables, same MCU-padded sampling), so the decoded raster of the
    * progressive stream equals the decoded raster of the baseline
    * stream BIT-FOR-BIT — progressive is a reordering of the same
    * coefficients, and MultimodalSpec pins exactly that equality.
    */
  def encodeJpegProgressive(width: Int, height: Int,
      pixel: (Int, Int) => Int, quality: Int = 90,
      subsample420: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPixels, s"bad dimensions ${width}x$height")
    require(width <= 65535 && height <= 65535,
      s"JPEG dimensions cap at 65535, got ${width}x$height")
    val qLuma = scaledQuant(QLumaBase, quality)
    val qChroma = scaledQuant(QChromaBase, quality)
    val n = width * height
    val yP = new Array[Double](n)
    val cbP = new Array[Double](n)
    val crP = new Array[Double](n)
    var i = 0
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        val p = pixel(xx, yy)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
        cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        i += 1; xx += 1
      }
      yy += 1
    }
    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    val samp = Array((hY, vY), (1, 1), (1, 1))
    val quants = Array(qLuma, qChroma, qChroma)
    val planesIn = Array(yP, cbP, crP)
    encodeProgressiveCore(width, height, 3, samp, quants, planesIn, 0)
  }

  /** Grayscale progressive (SOF2), with optional restart markers so the
    * decoder's in-scan resync paths are pinned by a real stream.
    */
  def encodeJpegProgressiveGray(width: Int, height: Int,
      pixel: (Int, Int) => Int, quality: Int = 90,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 &&
      width.toLong * height <= MaxPixels, s"bad dimensions ${width}x$height")
    require(width <= 65535 && height <= 65535,
      s"JPEG dimensions cap at 65535, got ${width}x$height")
    require(restartInterval >= 0, s"bad restart interval $restartInterval")
    val qLuma = scaledQuant(QLumaBase, quality)
    val plane = Array.tabulate(width * height)(idx =>
      (pixel(idx % width, idx / width) & 0xff).toDouble)
    encodeProgressiveCore(width, height, 1, Array((1, 1)), Array(qLuma),
      Array(plane), restartInterval)
  }

  private def encodeProgressiveCore(width: Int, height: Int, nComp: Int,
      samp: Array[(Int, Int)], quants: Array[Array[Int]],
      planesIn: Array[Array[Double]],
      restartInterval: Int): Array[Byte] = {
    val maxH = samp.take(nComp).map(_._1).max
    val maxV = samp.take(nComp).map(_._2).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)

    def sampleAt(p: Array[Double], x: Int, y: Int): Double =
      p(math.min(y, height - 1) * width + math.min(x, width - 1))

    // quantize every (MCU-padded) block up front, zigzag order
    val coefZz = (0 until nComp).map { ci =>
      val (h, v) = samp(ci)
      val stride = mcusX * h; val rows = mcusY * v
      val stepX = maxH / h; val stepY = maxV / v
      val zz = new Array[Int](stride * rows * 64)
      var brow = 0
      while (brow < rows) {
        var bcol = 0
        while (bcol < stride) {
          val blk = new Array[Double](64)
          var j = 0
          while (j < 8) {
            var i2 = 0
            while (i2 < 8) {
              val sx = (bcol * 8 + i2) * stepX; val sy = (brow * 8 + j) * stepY
              blk(j * 8 + i2) =
                if (stepX == 1 && stepY == 1)
                  sampleAt(planesIn(ci), sx, sy) - 128.0
                else { // box-mean downsample, matching encodeJpeg's chroma
                  var s = 0.0; var dy = 0
                  while (dy < stepY) {
                    var dx = 0
                    while (dx < stepX) {
                      s += sampleAt(planesIn(ci), sx + dx, sy + dy); dx += 1
                    }
                    dy += 1
                  }
                  s / (stepX * stepY) - 128.0
                }
              i2 += 1
            }
            j += 1
          }
          val coef = fdct(blk)
          val off = (brow * stride + bcol) * 64
          var k = 0
          while (k < 64) {
            val nat = ZigZag(k)
            zz(off + k) = math.round(coef(nat) / quants(ci)(nat)).toInt
            k += 1
          }
          bcol += 1
        }
        brow += 1
      }
      zz
    }.toArray

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    if (nComp == 3) {
      marker(0xe0); u16(16)
      Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
      u16(0x0101); u8(0); u16(1); u16(1); u8(0); u8(0)
      marker(0xdb); u16(2 + 2 * 65)
      u8(0x00); ZigZag.foreach(z => u8(quants(0)(z)))
      u8(0x01); ZigZag.foreach(z => u8(quants(1)(z)))
    } else {
      marker(0xdb); u16(2 + 65); u8(0x00); ZigZag.foreach(z => u8(quants(0)(z)))
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xc2); u16(8 + 3 * nComp); u8(8); u16(height); u16(width); u8(nComp)
    var ci0 = 0
    while (ci0 < nComp) {
      u8(ci0 + 1); u8((samp(ci0)._1 << 4) | samp(ci0)._2)
      u8(if (ci0 == 0) 0 else 1)
      ci0 += 1
    }
    marker(0xc4); u16(2 + 1 + 16 + DcProgVals.length)
    u8(0x00); (1 to 16).foreach(l => u8(DcProgBits(l))); DcProgVals.foreach(u8)
    marker(0xc4); u16(2 + 1 + 16 + AcProgVals.length)
    u8(0x10); (1 to 16).foreach(l => u8(AcProgBits(l))); AcProgVals.foreach(u8)

    val dcC = buildCodes(DcProgBits, DcProgVals)
    val acC = buildCodes(AcProgBits, AcProgVals)

    progScript(nComp).foreach { scan =>
      marker(0xda); u16(6 + 2 * scan.compIdx.length); u8(scan.compIdx.length)
      scan.compIdx.foreach { ci => u8(ci + 1); u8(0x00) }
      u8(scan.ss); u8(scan.se); u8((scan.ah << 4) | scan.al)

      val bw = new BitWriter(out)
      val isDc = scan.ss == 0
      val preds = new Array[Int](nComp)
      var eobrun = 0
      val beBits = scala.collection.mutable.ArrayBuffer.empty[Int] // run-attached correction bits
      var rstIdx = 0

      def floorLog2(x: Int): Int = 31 - Integer.numberOfLeadingZeros(x)
      def flushEobrun(): Unit = if (eobrun > 0) {
        val r = floorLog2(eobrun)
        val (c, l) = acC(r << 4); bw.write(c, l)
        if (r > 0) bw.write(eobrun - (1 << r), r)
        beBits.foreach(b => bw.write(b, 1))
        beBits.clear()
        eobrun = 0
      }

      def encodeDcUnit(ci: Int, off: Int): Unit = {
        val v = coefZz(ci)(off) >> scan.al // DC point transform: arithmetic shift
        if (scan.ah == 0) {
          val diff = v - preds(ci); preds(ci) = v
          val s = bitSize(diff)
          val (c, l) = dcC(s); bw.write(c, l)
          if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        } else bw.write(v & 1, 1)
      }

      def encodeAcFirstUnit(ci: Int, off: Int): Unit = {
        val zz = coefZz(ci)
        var run = 0
        var k = scan.ss
        while (k <= scan.se) {
          val raw = zz(off + k)
          val mag = math.abs(raw) >> scan.al // AC point transform: magnitude shift
          if (mag == 0) run += 1
          else {
            flushEobrun()
            while (run > 15) { val (zc, zl) = acC(0xf0); bw.write(zc, zl); run -= 16 }
            val s = bitSize(mag)
            val (c, l) = acC((run << 4) | s); bw.write(c, l)
            val v = if (raw < 0) -mag else mag
            bw.write(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEobrun()
        }
      }

      def encodeAcRefineUnit(ci: Int, off: Int): Unit = {
        val zz = coefZz(ci)
        // absolute values after the point transform + last newly-nonzero
        val absV = new Array[Int](scan.se + 1)
        var eobPos = scan.ss - 1
        var k = scan.ss
        while (k <= scan.se) {
          absV(k) = math.abs(zz(off + k)) >> scan.al
          if (absV(k) == 1) eobPos = k
          k += 1
        }
        var run = 0
        val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
        k = scan.ss
        while (k <= scan.se) {
          val temp = absV(k)
          if (temp == 0) run += 1
          else {
            while (run > 15 && k <= eobPos) {
              flushEobrun()
              val (zc, zl) = acC(0xf0); bw.write(zc, zl)
              run -= 16
              brBits.foreach(b => bw.write(b, 1)); brBits.clear()
            }
            if (temp > 1) brBits += (temp & 1) // history coefficient: buffer its next bit
            else { // newly nonzero at this precision
              flushEobrun()
              val (c, l) = acC((run << 4) | 1); bw.write(c, l)
              bw.write(if (zz(off + k) < 0) 0 else 1, 1)
              brBits.foreach(b => bw.write(b, 1)); brBits.clear()
              run = 0
            }
          }
          k += 1
        }
        if (run > 0 || brBits.nonEmpty) {
          eobrun += 1
          beBits ++= brBits
          if (eobrun == 0x7fff || beBits.length > 900) flushEobrun()
        }
      }

      def encodeUnit(ci: Int, off: Int): Unit =
        if (isDc) encodeDcUnit(ci, off)
        else if (scan.ah == 0) encodeAcFirstUnit(ci, off)
        else encodeAcRefineUnit(ci, off)

      def restartIfDue(unit: Int): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          flushEobrun()
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }

      if (scan.compIdx.length > 1) { // interleaved DC scan
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          restartIfDue(mcu)
          val my = mcu / mcusX; val mx = mcu % mcusX
          scan.compIdx.foreach { ci =>
            val (h, v) = samp(ci)
            val stride = mcusX * h
            var by = 0
            while (by < v) {
              var bx = 0
              while (bx < h) {
                encodeUnit(ci, ((my * v + by) * stride + mx * h + bx) * 64)
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's own block raster
        val ci = scan.compIdx.head
        val (h, v) = samp(ci)
        val compW = (width * h + maxH - 1) / maxH
        val compH = (height * v + maxV - 1) / maxV
        val blocksW = (compW + 7) / 8
        val blocksH = (compH + 7) / 8
        val stride = mcusX * h
        var b = 0
        val total = blocksW * blocksH
        while (b < total) {
          restartIfDue(b)
          encodeUnit(ci, ((b / blocksW) * stride + b % blocksW) * 64)
          b += 1
        }
      }
      flushEobrun()
      bw.flush()
    }
    marker(0xd9)
    out.toByteArray
  }

  // ---- decoder ----------------------------------------------------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
      var dcTable: Int = 0, var acTable: Int = 0)

  /** Decode a baseline (SOF0/SOF1) or progressive (SOF2) JFIF/EXIF JPEG
    * to packed 0xRRGGBB. Progressive support is the full T.81 Annex G
    * Huffman feature set: spectral selection (multi-band AC scans),
    * successive approximation (DC and AC refinement scans, EOB-run
    * coding per §G.1.2.2-3), interleaved DC / non-interleaved AC scans,
    * and restart markers inside any scan. Coefficients accumulate
    * across scans into per-component integer buffers; dequantize + IDCT
    * run ONCE at EOI, so a fully-transmitted progressive stream decodes
    * to the same raster as the baseline encoding of the same quantized
    * coefficients (pinned exactly in MultimodalSpec).
    */
  def decodeJpeg(bytes: Array[Byte]): ImageData = {
    require(bytes.length > 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG (missing SOI)")
    var pos = 2
    def u8(): Int = {
      require(pos < bytes.length, "truncated JPEG header")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = {
      require(pos + 1 < bytes.length, "truncated JPEG header")
      val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v
    }

    val quant = new Array[Array[Int]](4)
    val dcHuff = new Array[HuffDecoder](4)
    val acHuff = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    // progressive state: per-component quantized-coefficient buffers on
    // the MCU-padded block grid, accumulated scan by scan
    var coefBufs: Array[Array[Int]] = null
    var anyScanSeen = false
    var eoiSeen = false

    def parseSof(): Unit = {
      val len = u16(); val end = pos - 2 + len
      val prec = u8()
      require(prec == 8, s"only 8-bit precision supported, got $prec")
      height = u16(); width = u16()
      require(width > 0 && height > 0 &&
        width.toLong * height <= MaxPixels,
        s"bad/oversized dimensions ${width}x$height")
      val nc = u8()
      require(nc == 1 || nc == 3, s"only 1 or 3 components, got $nc")
      comps = Array.fill(nc) {
        val id = u8(); val hv = u8(); val tq = u8()
        val h = hv >> 4; val v = hv & 0xf
        require(h >= 1 && h <= 2 && v >= 1 && v <= 2,
          s"sampling factors ${h}x$v outside the 1-2 baseline range")
        require(tq < 4, s"bad quant table id $tq")
        Component(id, h, v, tq)
      }
      require(pos == end, "SOF length mismatch")
    }

    /** Decode one progressive scan's entropy data starting at `start`;
      * returns the position of the next marker's FF. Implements T.81
      * Annex G Huffman progressive decoding: §G.1.2.1 (DC first +
      * refinement via the point transform), §G.1.2.2 (AC first with
      * EOB-run coding), §G.1.2.3 (AC refinement: correction bits on
      * nonzero-history coefficients, run-positioned newly-nonzero ±1·2^Al
      * insertions).
      */
    def decodeProgressiveScan(scanIdx: Array[Int], ss: Int, se: Int,
        ah: Int, al: Int, start: Int): Int = {
      val maxH = comps.map(_.h).max
      val maxV = comps.map(_.v).max
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      if (coefBufs == null)
        coefBufs = comps.map(c =>
          new Array[Int](mcusX * c.h * mcusY * c.v * 64))
      val isDc = ss == 0
      require(!isDc || se == 0, "DC scan must have Se = 0")
      require(isDc || scanIdx.length == 1,
        "AC progressive scans are single-component per T.81 §G.1.1")
      require(isDc || (ss >= 1 && se >= ss && se <= 63),
        s"bad spectral band $ss..$se")
      require(al >= 0 && al <= 13 && (ah == 0 || ah == al + 1),
        s"bad successive approximation Ah=$ah Al=$al")

      val in = new BitReader(bytes, start)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      var rstIdx = 0

      def decodeDcBlock(ci: Int, off: Int): Unit =
        if (ah == 0) {
          val dc = dcHuff(comps(ci).dcTable)
          require(dc != null, s"component ${comps(ci).id} references undefined DC table")
          val t = dc.decode(in)
          require(t <= 11, s"bad DC category $t")
          dcPred(ci) += extend(in.receive(t), t)
          coefBufs(ci)(off) = dcPred(ci) << al
        } else {
          if (in.readBit() == 1) coefBufs(ci)(off) |= (1 << al)
        }

      def decodeAcFirst(ci: Int, off: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val buf = coefBufs(ci)
        val ac = acHuff(comps(ci).acTable)
        require(ac != null, s"component ${comps(ci).id} references undefined AC table")
        var k = ss
        while (k <= se) {
          val rs = ac.decode(in)
          val r = rs >> 4; val s = rs & 0xf
          if (s == 0) {
            if (r != 15) { // EOBn: run of 2^r + extra blocks ending here
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += in.receive(r)
              k = se + 1
            } else k += 16 // ZRL
          } else {
            k += r
            require(k <= se, "AC coefficient past spectral band")
            buf(off + ZigZag(k)) = extend(in.receive(s), s) << al
            k += 1
          }
        }
      }

      def decodeAcRefine(ci: Int, off: Int): Unit = {
        val buf = coefBufs(ci)
        val p1 = 1 << al; val m1 = -1 << al
        var k = ss
        def correctionBit(idx: Int): Unit =
          if (in.readBit() == 1 && (buf(idx) & p1) == 0)
            buf(idx) += (if (buf(idx) >= 0) p1 else m1)
        if (eobrun == 0) {
          val ac = acHuff(comps(ci).acTable)
          require(ac != null, s"component ${comps(ci).id} references undefined AC table")
          var atEob = false
          while (k <= se && !atEob) {
            val rs = ac.decode(in)
            var r = rs >> 4; val s = rs & 0xf
            var newVal = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += in.receive(r)
                atEob = true // remaining band handled by the EOB branch
              }
              // r == 15: ZRL — skip 16 zero-history coefficients below
            } else {
              require(s == 1, s"refinement scan carries size-$s coefficient")
              newVal = if (in.readBit() == 1) p1 else m1
            }
            if (!atEob) {
              // advance over r zero-history coefficients, emitting
              // correction bits for every nonzero-history one passed;
              // land on the (r+1)-th zero-history slot and place newVal
              var landed = false
              while (!landed && k <= se) {
                val idx = off + ZigZag(k)
                if (buf(idx) != 0) { correctionBit(idx); k += 1 }
                else if (r == 0) {
                  if (newVal != 0) buf(idx) = newVal
                  landed = true
                  k += 1
                } else { r -= 1; k += 1 }
              }
              require(landed || newVal == 0,
                "refinement run overflows the spectral band")
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) { // EOB region: correction bits only
            val idx = off + ZigZag(k)
            if (buf(idx) != 0) correctionBit(idx)
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeUnit(ci: Int, off: Int): Unit =
        if (isDc) decodeDcBlock(ci, off)
        else if (ah == 0) decodeAcFirst(ci, off)
        else decodeAcRefine(ci, off)

      def restartIfDue(unit: Int, total: Int): Unit = {
        require(!in.zeroFill,
          s"entropy data ended at a marker after unit ${unit - 1} of " +
            s"$total — refusing to synthesize whole units")
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          in.syncRestart(rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
        }
      }

      if (scanIdx.length > 1) { // interleaved (DC) scan: frame MCU order
        val total = mcusX * mcusY
        var mcu = 0
        while (mcu < total) {
          restartIfDue(mcu, total)
          val my = mcu / mcusX; val mx = mcu % mcusX
          scanIdx.foreach { ci =>
            val c = comps(ci)
            val stride = mcusX * c.h
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeUnit(ci,
                  ((my * c.v + by) * stride + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's own block raster
        val ci = scanIdx(0)
        val c = comps(ci)
        val compW = (width * c.h + maxH - 1) / maxH
        val compH = (height * c.v + maxV - 1) / maxV
        val blocksW = (compW + 7) / 8
        val blocksH = (compH + 7) / 8
        val stride = mcusX * c.h
        val total = blocksW * blocksH
        var b = 0
        while (b < total) {
          restartIfDue(b, total)
          decodeUnit(ci, ((b / blocksW) * stride + b % blocksW) * 64)
          b += 1
        }
      }

      // re-sync to the next marker: skip fill bytes and any stray
      // trailing restart marker; anything else non-marker is corrupt
      var p = in.pos
      var scanning = true
      while (scanning) {
        require(p + 1 < bytes.length, "truncated after progressive scan")
        require((bytes(p) & 0xff) == 0xff,
          f"expected marker after scan, got ${bytes(p) & 0xff}%02x at $p")
        val mm = bytes(p + 1) & 0xff
        if (mm == 0xff) p += 1 // fill byte
        else if (mm == 0x00) sys.error(s"entropy bytes past declared scan units at $p")
        else if (mm >= 0xd0 && mm <= 0xd7) p += 2 // trailing restart
        else scanning = false
      }
      p
    }

    var sofSeen = false
    var scanStart = -1
    while (scanStart < 0 && !eoiSeen) {
      require(pos + 1 < bytes.length, "truncated before SOS")
      require(u8() == 0xff, s"expected marker at ${pos - 1}")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes are legal
      m match {
        case 0xd8 => // stray SOI: ignore
        case 0xc0 | 0xc1 => // baseline / extended sequential (huffman)
          parseSof()
          sofSeen = true
        case 0xc2 => // progressive (huffman)
          parseSof()
          sofSeen = true
          progressive = true
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          sys.error(f"unsupported SOF marker ff$m%02x (non-baseline coding)")
        case 0xc4 => // DHT
          val len = u16(); val end = pos - 2 + len
          while (pos < end) {
            val tc = u8()
            val cls = tc >> 4; val id = tc & 0xf
            require(cls <= 1 && id < 4, s"bad DHT header $tc")
            val bits = new Array[Int](17)
            var total = 0
            (1 to 16).foreach { l => bits(l) = u8(); total += bits(l) }
            require(total <= 256 && pos + total <= end, "DHT overflow")
            val vals = Array.fill(total)(u8())
            val d = new HuffDecoder(bits, vals)
            if (cls == 0) dcHuff(id) = d else acHuff(id) = d
          }
        case 0xdb => // DQT
          val len = u16(); val end = pos - 2 + len
          while (pos < end) {
            val pq = u8()
            val prec = pq >> 4; val id = pq & 0xf
            require(prec <= 1 && id < 4, s"bad DQT header $pq")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(ZigZag(k)) = if (prec == 0) u8() else u16()
              k += 1
            }
            quant(id) = t
          }
        case 0xdd => // DRI
          require(u16() == 4, "bad DRI length")
          restartInterval = u16()
        case 0xda => // SOS
          require(sofSeen, "SOS before SOF")
          val len = u16(); val end = pos - 2 + len
          val ns = u8()
          val scanIdx = new Array[Int](ns)
          (0 until ns).foreach { s =>
            val cs = u8(); val tt = u8()
            val ci = comps.indexWhere(_.id == cs)
            require(ci >= 0, s"scan references unknown component $cs")
            comps(ci).dcTable = tt >> 4; comps(ci).acTable = tt & 0xf
            scanIdx(s) = ci
          }
          val ss = u8(); val se = u8()
          val ahAl = u8(); val ah = ahAl >> 4; val al = ahAl & 0xf
          require(pos == end, "SOS length mismatch")
          if (!progressive) {
            require(ns == comps.length,
              s"scan components $ns != frame ${comps.length}")
            require(ss == 0 && se == 63 && ah == 0,
              "spectral selection / successive approximation: not baseline")
            scanStart = pos
          } else {
            pos = decodeProgressiveScan(scanIdx, ss, se, ah, al, pos)
            anyScanSeen = true
          }
        case 0xd9 =>
          if (progressive && anyScanSeen) eoiSeen = true
          else sys.error("EOI before any scan")
        case _ if m >= 0xd0 && m <= 0xd7 => sys.error("RST outside entropy data")
        case _ => // APPn, COM, anything skippable with a length
          val len = u16()
          require(len >= 2 && pos - 2 + len <= bytes.length, s"bad segment length $len")
          pos += len - 2
      }
    }

    // ---- pixel assembly ----
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component plane, at the component's own resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(ci =>
      new Array[Int](planeW(ci) * planeH(ci))).toArray

    def runScan(): Unit = if (progressive) {
      // all scans already accumulated into coefBufs — dequantize + IDCT
      // every block once (same arithmetic as the baseline path, so a
      // fully-transmitted progressive stream reproduces the baseline
      // raster bit-for-bit)
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        require(q != null, s"component ${c.id} references undefined quant table ${c.tq}")
        val buf = coefBufs(ci)
        val stride = mcusX * c.h
        val rows = mcusY * c.v
        val pw = planeW(ci)
        var brow = 0
        while (brow < rows) {
          var bcol = 0
          while (bcol < stride) {
            val off = (brow * stride + bcol) * 64
            val coef = new Array[Double](64)
            var nat = 0
            while (nat < 64) {
              val v = buf(off + nat)
              if (v != 0) coef(nat) = v.toDouble * q(nat)
              nat += 1
            }
            val px = idct(coef)
            val bxo = bcol * 8; val byo = brow * 8
            var j = 0
            while (j < 8) {
              var i2 = 0
              while (i2 < 8) {
                val v = math.round(px(j * 8 + i2) + 128.0).toInt
                planes(ci)((byo + j) * pw + bxo + i2) =
                  if (v < 0) 0 else if (v > 255) 255 else v
                i2 += 1
              }
              j += 1
            }
            bcol += 1
          }
          brow += 1
        }
        ci += 1
      }
    } else {
    val in = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](comps.length)
    var mcu = 0
    var rstIdx = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      // marker-boundary truncation guard: zero-bit substitution that
      // began in an EARLIER MCU means every bit of this one would be
      // synthesized — that is data loss, not the sanctioned tail-of-
      // final-MCU termination, and this decoder refuses it loudly
      require(!in.zeroFill,
        s"entropy data ended at a marker after MCU ${mcu - 1} of " +
          s"$totalMcus — refusing to synthesize whole MCUs")
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        in.syncRestart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        require(q != null, s"component ${c.id} references undefined quant table ${c.tq}")
        val dc = dcHuff(c.dcTable); val ac = acHuff(c.acTable)
        require(dc != null && ac != null,
          s"component ${c.id} references undefined Huffman tables")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // decode one block
            val coef = new Array[Double](64)
            val t = dc.decode(in)
            require(t <= 11, s"bad DC category $t")
            dcPred(ci) += extend(in.receive(t), t)
            coef(0) = dcPred(ci).toDouble * q(0)
            var k = 1
            var done = false
            while (k < 64 && !done) {
              val rs = ac.decode(in)
              val run = rs >> 4; val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else done = true // EOB
              } else {
                k += run
                require(k < 64, "AC coefficient index past 63")
                val nat = ZigZag(k)
                coef(nat) = extend(in.receive(size), size).toDouble * q(nat)
                k += 1
              }
            }
            val px = idct(coef)
            val bxo = (mx * c.h + bx) * 8; val byo = (my * c.v + by) * 8
            val pw = planeW(ci)
            var j = 0
            while (j < 8) {
              var i2 = 0
              while (i2 < 8) {
                val v = math.round(px(j * 8 + i2) + 128.0).toInt
                planes(ci)((byo + j) * pw + bxo + i2) =
                  if (v < 0) 0 else if (v > 255) 255 else v
                i2 += 1
              }
              j += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    } // end runScan (progressive assembly | baseline entropy scan)
    runScan()

    // ---- upsample + color convert ----
    val rgb = new Array[Int](width * height)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          rgb(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      def planeSample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        val sx = x * c.h / maxH; val sy = y * c.v / maxV
        planes(ci)(sy * planeW(ci) + sx)
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = planeSample(0, x, y).toDouble
          val cb = planeSample(1, x, y) - 128.0
          val cr = planeSample(2, x, y) - 128.0
          def clamp(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = clamp(yv + 1.402 * cr)
          val g = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          val b = clamp(yv + 1.772 * cb)
          rgb(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    ImageData(width, height, rgb)
  }
}
