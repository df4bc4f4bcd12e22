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
    else None
  }

  sealed trait DecodedMedia
  final case class DecodedAudio(wav: WavData) extends DecodedMedia
  final case class DecodedImage(img: ImageData) extends DecodedMedia
  final case class DecodedVideo(avi: AviData) extends DecodedMedia
}
