package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the container formats a training-data
  * pipeline actually meets as raw bytes — WAV/PCM audio, BMP / PPM
  * images, and uncompressed-DIB AVI video — so [[Multimodal]]'s decode
  * seam is REAL for all three modalities (the stub now only covers
  * compressed codecs that need native libs).
  *
  * Decoders are strict: every header field is validated against the
  * payload length and unsupported variants throw with the reason
  * (compressed WAV, paletted/compressed BMP, 16-bit PPM) — a silent
  * garbage decode is worse than a loud refusal. Encoders exist so
  * tests and gates can synthesize bit-exact deterministic media; both
  * directions are roundtrip-pinned in MultimodalSpec and the
  * `mm_wav_decode` / `mm_bmp_decode` gates hash-check decoded sample /
  * pixel aggregates against a DuckDB replay of the generator formula.
  */
object MediaCodec {

  /** Upper bound on decoded pixel count (64 Mpixel ≈ 256 MB of ints).
    * All dimension arithmetic runs in LONG against this bound before
    * any allocation: header fields are attacker-controlled, and Int
    * products like `width * 3` wrap for crafted dimensions — a tiny
    * payload would pass every byte-length check and then OOM the
    * executor on a multi-GB array (OutOfMemoryError is fatal, so the
    * decodeAny Try would NOT contain it).
    */
  private val MaxPixels = 1L << 26

  private def checkDims(width: Int, height: Int, what: String): Unit = {
    require(width > 0 && height > 0, s"bad $what dimensions ${width}x$height")
    require(width.toLong * height <= MaxPixels,
      s"$what ${width}x$height exceeds the $MaxPixels-pixel decode bound")
  }

  /** Padded 24bpp row stride, computed in Long (see [[MaxPixels]]). */
  private def rowStride(width: Int): Long = (width.toLong * 3 + 3) / 4 * 4

  /** Shared 24bpp DIB raster decode (BMP pixel data and AVI `00db`
    * frame chunks are byte-identical formats): row padding, bottom-up
    * or top-down order, BGR → packed 0xRRGGBB.
    */
  private def readDib24(bytes: Array[Byte], offset: Int,
      width: Int, height: Int, topDown: Boolean): Array[Int] = {
    val rowBytes = rowStride(width).toInt // safe: dims pre-checked
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val base = offset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        rgb(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    rgb
  }

  final case class WavData(sampleRate: Int, channels: Int, samples: Array[Short])
  final case class ImageData(width: Int, height: Int, rgb: Array[Int]) {
    def r(i: Int): Int = (rgb(i) >> 16) & 0xff
    def g(i: Int): Int = (rgb(i) >> 8) & 0xff
    def b(i: Int): Int = rgb(i) & 0xff
  }

  // ---- WAV (RIFF / PCM16) ---------------------------------------------

  /** Canonical 44-byte-header mono/stereo PCM16 WAV. `samples` is
    * frame-interleaved when channels > 1.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "ragged frames")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF chunk walk: any chunk order, unknown chunks skipped (word
    * aligned per the spec), PCM16 required.
    */
  def decodeWav(bytes: Array[Byte]): WavData = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    val riffLen = buf.getInt
    // Long arithmetic: riffLen near Int.MaxValue wraps `riffLen + 8`
    // negative and the bound would pass vacuously
    require(riffLen >= 4 && riffLen.toLong + 8 <= bytes.length,
      s"RIFF length $riffLen overruns payload")
    require(tag() == "WAVE", "RIFF is not WAVE")
    var rate = -1; var channels = -1; var bits = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = tag(); val len = buf.getInt
      require(len >= 0 && buf.remaining() >= len, s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          require(len >= 16, "fmt chunk too short")
          val p0 = buf.position()
          val fmt = buf.getShort
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = buf.getShort
          rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          buf.position(p0 + len)
        case "data" =>
          require(len % 2 == 0, "odd PCM16 data length")
          data = new Array[Short](len / 2)
          var i = 0
          while (i < data.length) { data(i) = buf.getShort; i += 1 }
        case _ =>
          buf.position(buf.position() + len)
      }
      if (len % 2 == 1 && buf.remaining() > 0) buf.get() // chunk word padding
    }
    require(rate > 0 && channels > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    require(data.length % channels == 0, "ragged final frame")
    WavData(rate, channels, data)
  }

  // ---- BMP (BITMAPINFOHEADER, 24bpp uncompressed) ---------------------

  /** Bottom-up 24bpp BMP with the standard 4-byte row padding.
    * `pixel(x, y)` returns packed 0xRRGGBB with y=0 the TOP row.
    */
  def encodeBmp24(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataLen = rowBytes * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    buf.putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
    buf.putShort(1).putShort(24) // planes, bpp
    buf.putInt(0).putInt(dataLen) // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = height - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        buf.put((p & 0xff).toByte) // B
        buf.put(((p >> 8) & 0xff).toByte) // G
        buf.put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Handles bottom-up (positive height) and top-down (negative height)
    * storage and the row padding; rgb is row-major with y=0 the top row.
    */
  def decodeBmp(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    val fileSize = buf.getInt
    require(fileSize == bytes.length, s"declared size $fileSize != ${bytes.length}")
    buf.getInt // reserved
    val dataOffset = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    val width = buf.getInt
    val rawHeight = buf.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    checkDims(width, height, "BMP")
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 24, s"only 24bpp supported, got $bpp")
    val compression = buf.getInt
    require(compression == 0, s"only BI_RGB supported, got compression $compression")
    // lower bound too: dataOffset < 54 would silently decode header
    // bytes as pixels (and a negative one would AIOOBE, not refuse)
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad pixel-data offset $dataOffset")
    require(dataOffset + rowStride(width) * height <= bytes.length,
      "pixel data overruns payload")
    ImageData(width, height, readDib24(bytes, dataOffset, width, height, topDown))
  }

  // ---- PPM (P6, 8-bit) ------------------------------------------------

  /** Binary P6 PPM, maxval 255; `pixel(x, y)` packed 0xRRGGBB. */
  def encodePpm(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        out(i) = ((p >> 16) & 0xff).toByte
        out(i + 1) = ((p >> 8) & 0xff).toByte
        out(i + 2) = (p & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Tokenized header parse (whitespace runs + `#` comment lines per
    * the netpbm spec), then exactly width*height*3 raster bytes.
    */
  def decodePpm(bytes: Array[Byte]): ImageData = {
    require(bytes.length > 2 && bytes(0) == 'P'.toByte && bytes(1) == '6'.toByte,
      "not a binary PPM (P6)")
    var pos = 2
    def nextToken(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
          (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#'.toByte)) {
        if (bytes(pos) == '#'.toByte) inComment = true
        else if (bytes(pos) == '\n'.toByte) inComment = false
        pos += 1
      }
      var v = 0; var any = false
      while (pos < bytes.length && bytes(pos) >= '0'.toByte && bytes(pos) <= '9'.toByte) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, "truncated PPM header")
      v
    }
    val width = nextToken()
    val height = nextToken()
    val maxval = nextToken()
    require(maxval == 255, s"only 8-bit PPM supported, got maxval $maxval")
    checkDims(width, height, "PPM")
    pos += 1 // single whitespace byte after maxval per spec
    require((bytes.length - pos).toLong == width.toLong * height * 3,
      s"raster is ${bytes.length - pos} bytes, expected ${width.toLong * height * 3}")
    val rgb = new Array[Int](width * height)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = ((bytes(pos) & 0xff) << 16) | ((bytes(pos + 1) & 0xff) << 8) |
        (bytes(pos + 2) & 0xff)
      pos += 3; i += 1
    }
    ImageData(width, height, rgb)
  }

  // ---- PNG (8-bit truecolor, non-interlaced; java.util.zip DEFLATE) --

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Standards-correct minimal PNG: 8-bit RGB (color type 2),
    * non-interlaced, filter-0 scanlines, one zlib IDAT, CRC'd chunks.
    * `pixel(x, y)` packed 0xRRGGBB with y=0 the TOP row.
    */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] =
    encodePngFiltered(width, height, pixel, _ => 0)

  /** Full-control variant for tests (MultimodalSpec): caller-chosen
    * scanline filter per row (forward-applied per the spec's filter
    * math) and overridable IHDR fields, so the decoder's unfilter
    * paths and refusal branches can be exercised without duplicating
    * the container framing in test code.
    */
  private[graft] def encodePngFiltered(width: Int, height: Int,
      pixel: (Int, Int) => Int, filterFor: Int => Int,
      depth: Int = 8, colorType: Int = 2, interlace: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val bpp = 3
    val rowLen = width * bpp
    val raw = new Array[Byte]((1 + rowLen) * height)
    val prev = new Array[Byte](rowLen)
    val cur = new Array[Byte](rowLen)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        cur(x * 3) = ((p >> 16) & 0xff).toByte
        cur(x * 3 + 1) = ((p >> 8) & 0xff).toByte
        cur(x * 3 + 2) = (p & 0xff).toByte
        x += 1
      }
      val ft = filterFor(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw(y * (1 + rowLen)) = ft.toByte
      var i = 0
      while (i < rowLen) {
        val xv = cur(i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val f = ft match {
          case 0 => xv
          case 1 => xv - a
          case 2 => xv - b
          case 3 => xv - ((a + b) >> 1)
          case _ =>
            val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
            val p0 = a + b - c
            val pa = math.abs(p0 - a); val pb = math.abs(p0 - b)
            val pc = math.abs(p0 - c)
            xv - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (1 + rowLen) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowLen)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished())
      zipped.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(interlace.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Strict PNG decode for the subset the encoder writes plus anything
    * standards-equivalent: 8-bit truecolor, non-interlaced, ALL five
    * scanline filters (None/Sub/Up/Average/Paeth — real encoders pick
    * per row), ancillary chunks skipped, every chunk CRC-verified, the
    * inflate bounded to exactly the raster size (a zip-bomb IDAT is
    * refused, not inflated). Palette/alpha/16-bit/interlaced variants
    * refuse with the reason.
    */
  def decodePng(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= PngSig.length + 12,
      s"PNG too short: ${bytes.length} bytes")
    require(PngSig.indices.forall(i => bytes(i) == PngSig(i)), "not a PNG")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    buf.position(PngSig.length)
    var width = 0; var height = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(buf.remaining >= 12, "truncated chunk stream (no IEND)")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining - 8, s"bad chunk length $len")
      val typeBytes = new Array[Byte](4)
      buf.get(typeBytes)
      val typ = new String(typeBytes, "US-ASCII")
      val dataStart = buf.position()
      val crc = new java.util.zip.CRC32()
      crc.update(typeBytes); crc.update(bytes, dataStart, len)
      buf.position(dataStart + len)
      require(buf.getInt == crc.getValue.toInt, s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"IHDR is $len bytes, expected 13")
          val h = ByteBuffer.wrap(bytes, dataStart, 13).order(ByteOrder.BIG_ENDIAN)
          width = h.getInt; height = h.getInt
          checkDims(width, height, "PNG")
          val depth = h.get(); val color = h.get()
          val comp = h.get(); val filt = h.get(); val inter = h.get()
          require(depth == 8, s"only bit depth 8 supported, got $depth")
          require(color == 2, s"only truecolor RGB (color type 2) supported, got $color")
          require(comp == 0 && filt == 0,
            s"nonstandard compression/filter method $comp/$filt")
          require(inter == 0, "interlaced (Adam7) PNG not supported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, dataStart, len)
        case "IEND" =>
          require(len == 0, "non-empty IEND"); seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) skipped
      }
    }
    require(seenIhdr, "missing IHDR")
    val stride = 1 + width * 3 // dims pre-checked: fits Int
    val raw = new Array[Byte](stride * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && !inf.finished()) {
          // zero progress must REFUSE, never spin: a preset-dictionary
          // (FDICT) zlib header makes inflate return 0 with input still
          // buffered — without this check one crafted payload wedges
          // the executor task in an infinite loop
          require(!inf.needsDictionary(),
            "preset-dictionary (FDICT) zlib streams not supported")
          require(!inf.needsInput(), "truncated IDAT stream")
          throw new IllegalArgumentException("stalled IDAT inflate")
        }
        off += n
      }
      require(off == raw.length,
        s"IDAT inflated to $off bytes, expected ${raw.length}")
      // exactly the raster, no more: an over-long stream is refused
      require(inf.finished() || inf.inflate(new Array[Byte](1)) == 0,
        "IDAT stream longer than the image raster")
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT zlib stream: ${e.getMessage}")
    } finally inf.end()
    // unfilter: each scanline is filter-type byte + width*3 samples;
    // a/b/c are the RECONSTRUCTED left/up/up-left bytes per the spec
    val bpp = 3
    val rowLen = width * bpp
    val rgb = new Array[Int](width * height)
    val prev = new Array[Byte](rowLen)
    val cur = new Array[Byte](rowLen)
    var y = 0
    while (y < height) {
      val rowStart = y * stride
      val ft = raw(rowStart) & 0xff
      require(ft <= 4, s"bad scanline filter type $ft")
      var i = 0
      while (i < rowLen) {
        val x = raw(rowStart + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val rec = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case _ =>
            val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        cur(i) = (rec & 0xff).toByte
        i += 1
      }
      var px = 0
      while (px < width) {
        rgb(y * width + px) = ((cur(px * 3) & 0xff) << 16) |
          ((cur(px * 3 + 1) & 0xff) << 8) | (cur(px * 3 + 2) & 0xff)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, rowLen)
      y += 1
    }
    ImageData(width, height, rgb)
  }

  // ---- AVI (RIFF, uncompressed 24bpp DIB frames) ----------------------

  final case class AviData(width: Int, height: Int,
      microSecPerFrame: Int, frames: IndexedSeq[ImageData])

  /** Minimal standard-layout AVI: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh 'vids'/'DIB ', strf BITMAPINFOHEADER}} →
    * LIST(movi){'00db' DIB frames, bottom-up rows, 4-byte padding}.
    * `pixel(frame, x, y)` packed 0xRRGGBB with y=0 the TOP row.
    */
  def encodeAvi(width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Int, pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "empty video")
    val rowBytes = (width * 3 + 3) / 4 * 4
    val frameBytes = rowBytes * height
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(microSecPerFrame).putInt( // bytes/sec, Long math: Int overflows past ~26x26 frames
      math.min(frameBytes.toLong * 1000000L / math.max(microSecPerFrame, 1),
        Int.MaxValue.toLong).toInt)
    buf.putInt(0).putInt(0) // padding granularity; flags 0 (no idx1 written)
    buf.putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fourcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putInt(0) // flags, priority+language
    buf.putInt(0) // initial frames
    buf.putInt(microSecPerFrame).putInt(1000000) // scale/rate = fps
    buf.putInt(0).putInt(nFrames)
    buf.putInt(frameBytes).putInt(-1).putInt(0) // buffer, quality, sampleSize
    buf.putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, bottom-up
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(frameBytes)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); buf.putInt(frameBytes)
      var y = height - 1
      while (y >= 0) { // bottom-up rows, like BMP
        var x = 0
        while (x < width) {
          val p = pixel(f, x, y)
          buf.put((p & 0xff).toByte)
          buf.put(((p >> 8) & 0xff).toByte)
          buf.put(((p >> 16) & 0xff).toByte)
          x += 1
        }
        var pad = rowBytes - width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    buf.array()
  }

  /** Strict single-stream uncompressed-DIB AVI reader: walks the RIFF
    * tree, takes geometry from the strf BITMAPINFOHEADER, decodes every
    * `00db`/`00dc` movi chunk as a bottom-up 24bpp raster. Compressed
    * streams (non-zero biCompression / non-DIB handlers) are refused.
    */
  def decodeAvi(bytes: Array[Byte]): AviData = {
    require(bytes.length >= 12, s"AVI too short: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    val riffLen = buf.getInt
    require(riffLen >= 4 && riffLen.toLong + 8 <= bytes.length,
      s"RIFF length $riffLen overruns payload")
    require(tag() == "AVI ", "RIFF is not AVI")
    var width = -1; var height = -1; var usPerFrame = 0
    var compression = -1; var bpp = -1
    val frames = IndexedSeq.newBuilder[ImageData]
    def walkList(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val id = tag(); val len = buf.getInt
        // Long bound: a chunk len near Int.MaxValue wraps the Int sum
        // and would pass the overrun check vacuously
        val nextL = buf.position().toLong + len + (len % 2) // word-aligned
        require(len >= 0 && buf.position().toLong + len <= end,
          s"chunk $id overruns list")
        val next = math.min(nextL, end.toLong).toInt
        id match {
          case "LIST" =>
            tag() // list type (hdrl / strl / movi) — contents self-identify
            walkList(next)
          case "avih" =>
            usPerFrame = buf.getInt
          case "strf" =>
            require(len >= 40, "strf too short for BITMAPINFOHEADER")
            buf.getInt // biSize
            width = buf.getInt; height = buf.getInt
            checkDims(width, height, "AVI stream")
            buf.getShort // planes
            bpp = buf.getShort
            compression = buf.getInt
            require(bpp == 24 && compression == 0,
              s"only uncompressed 24bpp DIB supported, got bpp=$bpp compression=$compression")
          case "00db" | "00dc" =>
            require(width > 0 && height > 0, "frame chunk before strf header")
            require(len.toLong == rowStride(width) * height,
              s"frame chunk is $len bytes, expected ${rowStride(width) * height}")
            frames += ImageData(width, height,
              readDib24(bytes, buf.position(), width, height, topDown = false))
          case _ => // skip unknown chunks (idx1, INFO, junk)
        }
        buf.position(next)
      }
    }
    walkList(8 + riffLen)
    require(width > 0, "missing strf stream format")
    val fs = frames.result()
    require(fs.nonEmpty, "no frame chunks in movi list")
    AviData(width, height, usPerFrame, fs)
  }

  // ---- GIF87a (palette-indexed, REAL LZW) -----------------------------

  /** Standards-correct minimal GIF87a: one image, global color table,
    * non-interlaced, REAL variable-width LZW (clear/EOI codes, code
    * width growth, 4096-entry dictionary reset, LSB-first bit packing,
    * ≤255-byte sub-blocks). `palette` must be a power-of-two size in
    * [2, 256]; `index(x, y)` returns the palette index of the pixel at
    * (x, y) with y=0 the top row. LZW here is the OTHER compressed
    * family next to PNG's DEFLATE — dictionary coding instead of
    * LZ77+Huffman — so the decode seam covers both.
    */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int): Array[Byte] = {
    checkDims(width, height, "GIF")
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"GIF palette must be a power-of-two size in [2,256], got ${palette.length}")
    val bits = math.max(1, 31 - Integer.numberOfLeadingZeros(palette.length))
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present, size
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0) // no local table, not interlaced
    // LZW minimum code size (GIF mandates >= 2 even for 2-color images)
    val minCode = math.max(2, bits)
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    // bit packer: LSB-first into sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitLen = 0
    def putCode(code: Int, width0: Int): Unit = {
      bitBuf |= code.toLong << bitLen; bitLen += width0
      while (bitLen >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitLen -= 8 }
    }
    // dictionary: (prefix code, next byte) -> code, reset on clear
    var codeWidth = minCode + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    def dictKey(prefix: Int, k: Int): Integer = Integer.valueOf((prefix << 8) | k)
    putCode(clear, codeWidth)
    var cur = -1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = index(x, y)
        require(k >= 0 && k < palette.length,
          s"pixel index $k outside the ${palette.length}-entry palette")
        if (cur < 0) cur = k
        else {
          val hit = dict.get(dictKey(cur, k))
          if (hit != null) cur = hit.intValue()
          else {
            putCode(cur, codeWidth)
            dict.put(dictKey(cur, k), Integer.valueOf(next))
            if (next == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
            next += 1
            if (next > 4095) { // dictionary full: reset (exercises decoder clears)
              putCode(clear, codeWidth)
              dict.clear(); next = eoi + 1; codeWidth = minCode + 1
            }
            cur = k
          }
        }
        x += 1
      }
      y += 1
    }
    if (cur >= 0) putCode(cur, codeWidth)
    putCode(eoi, codeWidth)
    if (bitLen > 0) data.write((bitBuf & 0xff).toInt)
    // package into <=255-byte sub-blocks
    val payload = data.toByteArray
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      out.write(n); out.write(payload, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Strict GIF87a/89a decoder for the single-image shapes a data
    * pipeline meets: global or local color table, extensions skipped,
    * REAL LZW decompression (deferred-clear tolerant, KwKwK case,
    * width growth mirrored with the encoder, 12-bit cap). Interlaced
    * images and truncated streams are refused loudly.
    */
  def decodeGif(bytes: Array[Byte]): ImageData = {
    require(bytes.length >= 13, "truncated GIF header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (per-image descriptor dims are authoritative)
    val flags = bytes(pos) & 0xff; pos += 3
    var palette: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      require(bytes.length >= pos + 3 * n, "truncated global color table")
      palette = Array.tabulate(n)(i => ((bytes(pos + 3 * i) & 0xff) << 16) |
        ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) {
      pos += 2 // extension introducer + label
      while ({ require(pos < bytes.length, "truncated extension"); (bytes(pos) & 0xff) != 0 })
        pos += 1 + (bytes(pos) & 0xff)
      pos += 1
    }
    require(pos < bytes.length && (bytes(pos) & 0xff) == 0x2c,
      "no image descriptor (animated/exotic layout not supported)")
    val width = u16(pos + 5); val height = u16(pos + 7)
    val iflags = bytes(pos + 9) & 0xff
    pos += 10
    require((iflags & 0x40) == 0, "interlaced GIF not supported")
    if ((iflags & 0x80) != 0) { // local color table wins
      val n = 2 << (iflags & 7)
      require(bytes.length >= pos + 3 * n, "truncated local color table")
      palette = Array.tabulate(n)(i => ((bytes(pos + 3 * i) & 0xff) << 16) |
        ((bytes(pos + 3 * i + 1) & 0xff) << 8) | (bytes(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    require(palette != null, "GIF has neither global nor local color table")
    checkDims(width, height, "GIF")
    val minCode = bytes(pos) & 0xff; pos += 1
    require(minCode >= 2 && minCode <= 11, s"bad LZW minimum code size $minCode")
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while ({ require(pos < bytes.length, "truncated image data"); (bytes(pos) & 0xff) != 0 }) {
      val n = bytes(pos) & 0xff
      require(bytes.length >= pos + 1 + n, "truncated data sub-block")
      data.write(bytes, pos + 1, n); pos += 1 + n
    }
    val lzw = data.toByteArray
    // LZW decode: table of (prefix, suffix) chains
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var codeWidth = minCode + 1
    var bitBuf = 0L; var bitLen = 0; var bp = 0
    def readCode(): Int = {
      while (bitLen < codeWidth) {
        if (bp >= lzw.length) return eoi // truncation ends the stream
        bitBuf |= (lzw(bp) & 0xffL) << bitLen; bitLen += 8; bp += 1
      }
      val c = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth; bitLen -= codeWidth
      c
    }
    val pixels = new Array[Int](width * height)
    var nOut = 0
    val stack = new Array[Int](4097)
    def emitChain(code: Int): Int = { // returns the chain's FIRST byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c
      require(nOut + sp + 1 <= pixels.length, "LZW output overruns the raster")
      pixels(nOut) = first; nOut += 1
      while (sp > 0) { sp -= 1; pixels(nOut) = stack(sp); nOut += 1 }
      first
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = readCode()
      if (code == eoi) done = true
      else if (code == clear) {
        next = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (prev < 0) {
        require(code < clear, s"first code after clear must be literal, got $code")
        require(nOut < pixels.length, "LZW output overruns the raster")
        pixels(nOut) = code; nOut += 1
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table size $next")
        val first =
          if (code == next) { // KwKwK: output = chain(prev) ++ [firstOf(prev)]
            val f = emitChain(prev)
            require(nOut < pixels.length, "LZW output overruns the raster")
            pixels(nOut) = f; nOut += 1
            f
          } else emitChain(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          if (next + 1 == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          next += 1
        }
        prev = code
      }
    }
    require(nOut == pixels.length,
      s"LZW stream produced $nOut pixels for a ${width}x$height raster")
    val rgb = new Array[Int](pixels.length)
    var i = 0
    while (i < pixels.length) {
      val k = pixels(i)
      require(k < palette.length, s"pixel index $k outside the palette")
      rgb(i) = palette(k); i += 1
    }
    ImageData(width, height, rgb)
  }

  // ---- raster transforms ----------------------------------------------

  /** Bilinear resize of a decoded raster — the REAL pixel path behind
    * [[Multimodal.resizePayload]] (pixel-center-aligned sampling, the
    * convention imaging libraries use, so a same-size "resize" is the
    * identity). Per-channel interpolation in fixed source space; output
    * dims validated against the same decode bound as the codecs.
    */
  def resizeBilinear(img: ImageData, outW: Int, outH: Int): ImageData = {
    checkDims(outW, outH, "resize target")
    if (outW == img.width && outH == img.height) return img
    val out = new Array[Int](outW * outH)
    val xScale = img.width.toDouble / outW
    val yScale = img.height.toDouble / outH
    var y = 0
    while (y < outH) {
      // pixel-center alignment: output center maps to source center
      val sy = math.min(math.max((y + 0.5) * yScale - 0.5, 0.0), img.height - 1.0)
      val y0 = sy.toInt
      val y1 = math.min(y0 + 1, img.height - 1)
      val fy = sy - y0
      var x = 0
      while (x < outW) {
        val sx = math.min(math.max((x + 0.5) * xScale - 0.5, 0.0), img.width - 1.0)
        val x0 = sx.toInt
        val x1 = math.min(x0 + 1, img.width - 1)
        val fx = sx - x0
        val p00 = img.rgb(y0 * img.width + x0); val p01 = img.rgb(y0 * img.width + x1)
        val p10 = img.rgb(y1 * img.width + x0); val p11 = img.rgb(y1 * img.width + x1)
        def ch(shift: Int): Int = {
          val c00 = (p00 >> shift) & 0xff; val c01 = (p01 >> shift) & 0xff
          val c10 = (p10 >> shift) & 0xff; val c11 = (p11 >> shift) & 0xff
          val top = c00 + (c01 - c00) * fx
          val bot = c10 + (c11 - c10) * fx
          val v = math.round(top + (bot - top) * fy).toInt
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        out(y * outW + x) = (ch(16) << 16) | (ch(8) << 8) | ch(0)
        x += 1
      }
      y += 1
    }
    ImageData(outW, outH, out)
  }

  // ---- dispatch -------------------------------------------------------

  /** Decode when the payload's leading bytes AND validated structure
    * mark a format this module handles; None otherwise. Strict (full
    * header validation, size fields must match) so arbitrary
    * text/binary payloads never false-positive into a garbage decode.
    */
  def decodeAny(bytes: Array[Byte]): Option[DecodedMedia] = {
    if (bytes == null || bytes.length < 12) None
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
      val form = new String(bytes, 8, 4, "US-ASCII")
      if (form == "WAVE") scala.util.Try(decodeWav(bytes)).toOption.map(DecodedAudio)
      else if (form == "AVI ") scala.util.Try(decodeAvi(bytes)).toOption.map(DecodedVideo)
      else None
    }
    else if (bytes(0) == 'B' && bytes(1) == 'M')
      scala.util.Try(decodeBmp(bytes)).toOption.map(DecodedImage)
    else if (bytes(0) == 'P' && bytes(1) == '6')
      scala.util.Try(decodePpm(bytes)).toOption.map(DecodedImage)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      scala.util.Try(decodeGif(bytes)).toOption.map(DecodedImage)
    else if (bytes(0) == PngSig(0) && bytes(1) == PngSig(1) &&
        bytes(2) == PngSig(2) && bytes(3) == PngSig(3))
      scala.util.Try(decodePng(bytes)).toOption.map(DecodedImage)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
        (bytes(2) & 0xff) == 0xff)
      scala.util.Try(JpegCodec.decodeJpeg(bytes)).toOption.map(DecodedImage)
    else None
  }

  sealed trait DecodedMedia
  final case class DecodedAudio(wav: WavData) extends DecodedMedia
  final case class DecodedImage(img: ImageData) extends DecodedMedia
  final case class DecodedVideo(avi: AviData) extends DecodedMedia
}
