package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val media =
    Multimodal.syntheticMedia(Tables.load(spark, sf, "documents")).cache()

  test("synthetic media: payload round-trips the source text") {
    val roundTrip = media
      .select($"media_id", decode($"payload", "UTF-8").as("text2"))
      .join(Tables.load(spark, sf, "documents")
        .select($"doc_id".as("media_id"), $"text"), "media_id")
      .filter($"text" =!= $"text2")
    assert(roundTrip.count() == 0)
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }

  test("extractFeatures: mapPartitions batch keeps schema, drops payload, deterministic") {
    val feats = Multimodal.extractFeatures(media, k = 8)
    assert(!feats.columns.contains("payload"))
    assert(feats.columns.contains("features"))
    assert(feats.count() == media.count())
    // deterministic: same input -> same features
    val a = feats.select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Multimodal.extractFeatures(media, k = 8)
      .select($"media_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.values.forall(f => f.length == 8 && f.forall(x => x >= 0 && x <= 130)))
  }

  test("frameSample explodes only video rows, every 5th frame") {
    val frames = Multimodal.frameSample(media, everyNth = 5)
    val videos = media.filter($"modality" === "video")
      .select($"media_id", ($"meta.n_frames").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(videos.nonEmpty)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == videos.keySet)
    videos.foreach { case (id, n) =>
      assert(counts(id) == (n + 4) / 5, s"media $id n_frames=$n")
    }
    assert(frames.filter($"frame_idx" % 5 =!= 0).count() == 0)
  }

  test("resizeMeta scales down to max dim, preserves aspect-ish, never upscales") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
    val bad = resized.filter(
      $"meta.width" > 256 || $"meta.height" > 256 ||
        $"meta.width" < 1 || $"meta.height" < 1)
    assert(bad.count() == 0)
    // small assets unchanged
    val unchanged = media.filter($"meta.width" <= 256 && $"meta.height" <= 256)
      .select($"media_id", $"meta.width".as("w"), $"meta.height".as("h"))
    val after = resized.select($"media_id", $"meta.width".as("w2"), $"meta.height".as("h2"))
    assert(unchanged.join(after, "media_id")
      .filter($"w" =!= $"w2" || $"h" =!= $"h2").count() == 0)
  }

  // ---- real codecs (MediaCodec) --------------------------------------

  test("WAV roundtrip: mono and stereo PCM16, samples bit-exact") {
    val mono = Array.tabulate(777)(i => ((i * 131) % 30000 - 15000).toShort)
    val w1 = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(16000, mono))
    assert(w1.sampleRate === 16000 && w1.channels === 1)
    assert(w1.samples.toSeq === mono.toSeq)
    val stereo = Array.tabulate(400)(i => (i - 200).toShort) // 200 frames x 2ch
    val w2 = MediaCodec.decodeWav(MediaCodec.encodeWavPcm16(44100, stereo, channels = 2))
    assert(w2.channels === 2 && w2.samples.toSeq === stereo.toSeq)
  }

  test("WAV decode walks unknown chunks and refuses non-PCM loudly") {
    // splice a LIST chunk (odd length -> word padding) between fmt and data
    val base = MediaCodec.encodeWavPcm16(8000, Array[Short](1, -2, 3))
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 4, 5, 0) // 5 data bytes + 1 pad byte
    val spliced = java.nio.ByteBuffer
      .allocate(base.length + extra.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(base, 0, 36) // RIFF..fmt chunk end
      .put(extra)
      .put(base, 36, base.length - 36)
      .array()
    // fix the RIFF size field for the added bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    assert(MediaCodec.decodeWav(spliced).samples.toSeq === Seq[Short](1, -2, 3))
    // format code 3 (IEEE float) must be refused, not garbled
    val nonPcm = base.clone()
    nonPcm(20) = 3
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(nonPcm))
    assert(e.getMessage.contains("PCM"))
  }

  test("BMP roundtrip: odd widths exercise row padding; top-down height decodes too") {
    for (w <- Seq(1, 3, 5, 7); h <- Seq(1, 2, 4)) {
      def px(x: Int, y: Int): Int = ((x * 37 + y * 91) % 256 << 16) |
        ((x + y) % 256 << 8) | ((x * y + 7) % 256)
      val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(w, h, px))
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.rgb(y * w + x) === px(x, y), s"($x,$y) of ${w}x$h")
    }
    // hand-build a top-down variant (negative height, rows not flipped)
    val bottomUp = MediaCodec.encodeBmp24(3, 2, (x, y) => x + y * 10)
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -2) // height := -2
    // flip the two pixel rows so the image content stays identical
    val rowBytes = (3 * 3 + 3) / 4 * 4
    System.arraycopy(bottomUp, 54 + rowBytes, topDown, 54, rowBytes)
    System.arraycopy(bottomUp, 54, topDown, 54 + rowBytes, rowBytes)
    assert(MediaCodec.decodeBmp(topDown).rgb.toSeq ===
      MediaCodec.decodeBmp(bottomUp).rgb.toSeq)
  }

  test("BMP with a header-overlapping pixel offset is refused, not decoded as garbage") {
    val bytes = MediaCodec.encodeBmp24(3, 2, (x, y) => x + y)
    val broken = bytes.clone()
    java.nio.ByteBuffer.wrap(broken).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 0) // dataOffset := 0 — points into the headers
    val e = intercept[IllegalArgumentException](MediaCodec.decodeBmp(broken))
    assert(e.getMessage.contains("offset"))
  }

  test("AVI byte-rate header survives frames past the Int overflow size") {
    // 30x30 frames: frameBytes*1e6 overflows Int; field must stay positive
    val bytes = MediaCodec.encodeAvi(30, 30, 1, 40000, (_, _, _) => 0)
    val rate = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getInt(24 + 4) // avih payload starts at 24; dwMaxBytesPerSec is its 2nd int
    assert(rate > 0, s"overflowed byte rate $rate")
    assert(MediaCodec.decodeAvi(bytes).frames.head.rgb.length === 900)
  }

  test("PPM roundtrip, comment-bearing headers, and strict raster length") {
    def px(x: Int, y: Int): Int = (x % 256 << 16) | (y % 256 << 8) | 200
    val img = MediaCodec.decodePpm(MediaCodec.encodePpm(4, 3, px))
    assert(img.width === 4 && img.height === 3 && img.rgb(5) === px(1, 1))
    val withComment = ("P6\n# a comment line\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6))
    val c = MediaCodec.decodePpm(withComment)
    assert(c.width === 2 && c.rgb.toSeq === Seq(0x010203, 0x040506))
    val truncated = MediaCodec.encodePpm(4, 3, px).dropRight(1)
    intercept[IllegalArgumentException](MediaCodec.decodePpm(truncated))
  }

  test("AVI roundtrip: frames bit-exact incl. padding; compressed streams refused") {
    for (w <- Seq(1, 3, 5); h <- Seq(1, 2); nf <- Seq(1, 4)) {
      def px(f: Int, x: Int, y: Int): Int =
        ((f * 31 + x) % 256 << 16) | ((x + y * 7) % 256 << 8) | ((f + y) % 256)
      val avi = MediaCodec.decodeAvi(MediaCodec.encodeAvi(w, h, nf, 40000, px))
      assert(avi.width === w && avi.height === h && avi.frames.length === nf)
      assert(avi.microSecPerFrame === 40000)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        assert(avi.frames(f).rgb(y * w + x) === px(f, x, y), s"f$f ($x,$y) ${w}x$h")
    }
    // flip biCompression in strf to a non-zero codec id → loud refusal
    val bytes = MediaCodec.encodeAvi(3, 2, 2, 40000, (_, _, _) => 0x123456)
    val strf = { // locate 'strf' fourcc, compression sits at +8(hdr)+16
      var i = 0
      while (!(bytes(i) == 's' && bytes(i + 1) == 't' &&
        bytes(i + 2) == 'r' && bytes(i + 3) == 'f')) i += 1
      i
    }
    val broken = bytes.clone()
    java.nio.ByteBuffer.wrap(broken).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(strf + 8 + 16, 0x44495658) // 'XVID'
    val e = intercept[IllegalArgumentException](MediaCodec.decodeAvi(broken))
    assert(e.getMessage.contains("uncompressed"))
  }

  test("decodeFeatures recognizes AVI payloads as video") {
    val avi = MediaCodec.encodeAvi(2, 2, 3, 50000, (_, _, _) => 0x0A141E)
    val fv = Multimodal.decodeFeatures(avi, 8)
    assert(fv(0) === 3.0 && fv(1) === 2.0 && fv(2) === 2.0 && fv(3) === 3.0)
    assert(fv(4) === 50000.0)
    // constant-color frames: mean luma = (77*10+150*20+29*30)>>8 = 18
    assert(fv(5) === 18.0 && fv(6) === 18.0 && fv(7) === 18.0)
  }

  test("decodeFeatures dispatches on validated magic; text still takes the stub path") {
    val wav = MediaCodec.encodeWavPcm16(8000, Array[Short](100, -100, 100, -100))
    val fa = Multimodal.decodeFeatures(wav, 8)
    assert(fa(0) === 1.0 && fa(1) === 8000.0 && fa(3) === 4.0)
    assert(fa(4) === 0.0 && fa(7) === 100.0) // mean, max
    val bmp = MediaCodec.encodeBmp24(2, 2, (_, _) => 0x0A141E)
    val fi = Multimodal.decodeFeatures(bmp, 8)
    assert(fi(0) === 2.0 && fi(3) === 10.0 && fi(4) === 20.0 && fi(5) === 30.0)
    // plain text (even one starting like a magic string) stays on the stub
    for (s <- Seq("hello world", "BMX bikes are great, really great stuff",
        "P6 is a chess opening?? no idea honestly",
        "RIFFle shuffle technique described at length")) {
      val bytes = s.getBytes("UTF-8")
      assert(Multimodal.decodeFeatures(bytes, 8).toSeq ===
        Multimodal.stubDecodeFeatures(bytes, 8).toSeq, s)
    }
  }

  test("crafted overflow dimensions are refused, never allocated") {
    import java.nio.{ByteBuffer, ByteOrder}
    // BMP: width*3 wraps to 2 in Int, so a 58-byte payload used to pass
    // every bounds check and then allocate a ~5.7 GB pixel array
    val w = 1431655766 // (w * 3) wraps to 2
    val bmp = ByteBuffer.allocate(58).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
    bmp.putInt(40).putInt(w).putInt(1).putShort(1).putShort(24)
    bmp.putInt(0).putInt(4).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val eBmp = intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmp.array()))
    assert(eBmp.getMessage.contains("pixel"), eBmp.getMessage)

    val ppm = (s"P6\n$w 1\n255\n" + "xx").getBytes("US-ASCII")
    val ePpm = intercept[IllegalArgumentException](MediaCodec.decodePpm(ppm))
    assert(ePpm.getMessage.contains("pixel"), ePpm.getMessage)

    // lying RIFF length near Int.MaxValue used to wrap the bound check
    val wav = MediaCodec.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    val lying = wav.clone()
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN).putInt(4, Int.MaxValue)
    val eWav = intercept[IllegalArgumentException](MediaCodec.decodeWav(lying))
    assert(eWav.getMessage.contains("overruns"), eWav.getMessage)
    // and the strict dispatcher turns all of these into None, not OOM
    assert(MediaCodec.decodeAny(bmp.array()).isEmpty)
    assert(MediaCodec.decodeAny(lying).isEmpty)
  }

  test("frameSample: zero-frame videos emit no phantom indices; everyNth must be positive") {
    import spark.implicits._
    val media = Seq(
      (1L, "video", 0), (2L, "video", 3), (3L, "image", 5))
      .toDF("media_id", "modality", "nf")
      .withColumn("meta", struct(col("nf").as("n_frames")))
    val out = Multimodal.frameSample(media, everyNth = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out === Set((2L, 0), (2L, 1), (2L, 2))) // no rows for n_frames=0
    intercept[IllegalArgumentException](Multimodal.frameSample(media, everyNth = 0))
  }

  // ---- PNG ------------------------------------------------------------

  /** PNG with a caller-chosen filter type per scanline and overridable
    * IHDR fields — delegates to the codec's own container framing
    * ([[MediaCodec.encodePngFiltered]]) so the test can never validate
    * a stale format.
    */
  private def buildPng(width: Int, height: Int, rgb: (Int, Int) => Int,
      filterFor: Int => Int, depth: Int = 8, colorType: Int = 2,
      interlace: Int = 0): Array[Byte] =
    MediaCodec.encodePngFiltered(width, height, rgb, filterFor,
      depth, colorType, interlace)

  test("PNG roundtrip: deflate+unfilter bit-exact over odd sizes") {
    for (w <- Seq(1, 3, 5, 13); h <- Seq(1, 2, 7)) {
      def px(x: Int, y: Int): Int = ((x * 53 + y * 17) % 256 << 16) |
        ((x * y + 3) % 256 << 8) | ((x + 7 * y) % 256)
      val img = MediaCodec.decodePng(MediaCodec.encodePng(w, h, px))
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.rgb(y * w + x) === px(x, y), s"($x,$y) of ${w}x$h")
    }
  }

  test("PNG: all five scanline filters reconstruct identically") {
    def px(x: Int, y: Int): Int = ((x * 37 + y * 91) % 256 << 16) |
      ((x * x + y) % 256 << 8) | ((255 - x * y) % 256 + 256) % 256
    val w = 9; val h = 10
    val expected = MediaCodec.decodePng(buildPng(w, h, px, _ => 0)).rgb.toSeq
    // one filter type per row, cycling through all five — a real
    // encoder's per-row heuristic choice looks exactly like this
    val mixed = MediaCodec.decodePng(buildPng(w, h, px, y => y % 5))
    assert(mixed.rgb.toSeq === expected)
    for (ft <- 1 to 4) {
      val one = MediaCodec.decodePng(buildPng(w, h, px, _ => ft))
      assert(one.rgb.toSeq === expected, s"filter $ft")
    }
  }

  test("PNG refusals: corrupt CRC, unsupported color/depth/interlace, oversize IDAT") {
    def px(x: Int, y: Int): Int = (x + y) % 256
    val good = MediaCodec.encodePng(5, 4, px)
    // flip one IDAT byte, leave the stale CRC — must refuse, not garbage-decode
    val corrupt = good.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodePng(corrupt))
    assert(e1.getMessage.contains("CRC mismatch"))
    val e2 = intercept[IllegalArgumentException](
      MediaCodec.decodePng(buildPng(5, 4, px, _ => 0, colorType = 6)))
    assert(e2.getMessage.contains("color type"))
    val e3 = intercept[IllegalArgumentException](
      MediaCodec.decodePng(buildPng(5, 4, px, _ => 0, depth = 16)))
    assert(e3.getMessage.contains("bit depth"))
    val e4 = intercept[IllegalArgumentException](
      MediaCodec.decodePng(buildPng(5, 4, px, _ => 0, interlace = 1)))
    assert(e4.getMessage.contains("interlaced"))
    // an IDAT that inflates LONGER than the declared raster is refused:
    // build 4 rows of data but declare height 3 via a hand-patched IHDR
    val tall = buildPng(5, 4, px, _ => 0)
    val short = {
      val b = tall.clone()
      java.nio.ByteBuffer.wrap(b).putInt(8 + 8 + 4, 3) // IHDR height := 3
      // recompute the IHDR CRC so only the length lie remains
      val crc = new java.util.zip.CRC32()
      crc.update(b, 8 + 4, 4 + 13)
      java.nio.ByteBuffer.wrap(b).putInt(8 + 8 + 13, crc.getValue.toInt)
      b
    }
    val e5 = intercept[IllegalArgumentException](MediaCodec.decodePng(short))
    assert(e5.getMessage.contains("longer than the image raster"))
    // dispatch: a PNG payload is recognized as an image
    assert(MediaCodec.decodeAny(good).exists {
      case MediaCodec.DecodedImage(img) => img.width == 5 && img.height == 4
      case _ => false
    })
  }

  test("GIF roundtrip: LZW bit-exact across sizes, widths, and palette sizes") {
    for ((w, h, palBits) <- Seq((1, 1, 1), (3, 2, 2), (7, 5, 4), (41, 17, 6),
        (64, 64, 8), (255, 31, 6))) {
      val pal = Array.tabulate(1 << palBits)(i =>
        (((7 * i) % 256) << 16) | (((11 * i) % 256) << 8) | ((5 * i + 3) % 256))
      def idx(x: Int, y: Int): Int = (x * 31 + y * 7 + x * y) % pal.length
      val img = MediaCodec.decodeGif(MediaCodec.encodeGif(w, h, pal, idx))
      assert(img.width == w && img.height == h)
      var i = 0
      while (i < w * h) {
        val x = i % w; val y = i / w
        assert(img.rgb(i) == pal(idx(x, y)), s"pixel ($x,$y) at ${w}x$h/$palBits")
        i += 1
      }
    }
  }

  test("GIF: dictionary-reset path (>4096 LZW entries) decodes bit-exact") {
    // a large noisy image forces the 12-bit table to fill and the
    // encoder to emit mid-stream clear codes
    val pal = Array.tabulate(256)(i => (i << 16) | (((i * 31) % 256) << 8) | ((i * 7) % 256))
    def idx(x: Int, y: Int): Int = ((x * 2654435761L + y * 40503L) % 256).toInt
    val (w, h) = (200, 150)
    val bytes = MediaCodec.encodeGif(w, h, pal, idx)
    val img = MediaCodec.decodeGif(bytes)
    var i = 0
    while (i < w * h) {
      assert(img.rgb(i) == pal(idx(i % w, i / w)), s"pixel $i after dict reset")
      i += 1
    }
  }

  test("GIF: KwKwK runs (immediate repeat patterns) decode bit-exact") {
    // constant rasters hit the code==next case on the very first steps
    val pal = Array.tabulate(4)(i => i * 0x010101 * 80)
    for (c <- 0 until 4) {
      val img = MediaCodec.decodeGif(MediaCodec.encodeGif(9, 7, pal, (_, _) => c))
      assert(img.rgb.forall(_ == pal(c)), s"constant raster of palette index $c")
    }
  }

  test("GIF refusals: interlace, truncation, bad palette sizes, raster mismatch") {
    val pal = Array.tabulate(4)(i => i * 40)
    val good = MediaCodec.encodeGif(6, 4, pal, (x, y) => (x + y) % 4)
    // interlace flag set in the image descriptor
    val inter = good.clone()
    // image descriptor starts right after header(13) + GCT(12)
    inter(13 + 12 + 9) = (inter(13 + 12 + 9) | 0x40).toByte
    intercept[IllegalArgumentException] { MediaCodec.decodeGif(inter) }
    // truncated mid-data
    intercept[IllegalArgumentException] {
      MediaCodec.decodeGif(java.util.Arrays.copyOf(good, good.length - 4))
    }
    // non-power-of-two palette refused at encode time
    intercept[IllegalArgumentException] {
      MediaCodec.encodeGif(2, 2, Array.tabulate(3)(identity), (_, _) => 0)
    }
    // decodeAny dispatches GIFs and stays None for near-miss magic
    assert(MediaCodec.decodeAny(good).collect {
      case MediaCodec.DecodedImage(i) => (i.width, i.height) }.contains((6, 4)))
    val bad = good.clone(); bad(2) = 'X'.toByte
    assert(MediaCodec.decodeAny(bad).isEmpty)
  }

  // ---- JPEG (lossy: exactness on DC-only fixtures, bounds elsewhere) ---

  // smooth in all three channels — chroma subsampling averages 2x2
  // neighborhoods, so a wrapping sawtooth would be a step edge, not a
  // "smooth content" fixture
  private def mkRamp(w: Int, h: Int): (Int, Int) => Int = (x, y) => {
    val r = (x * 255 / math.max(w - 1, 1)) & 0xff
    val g = (y * 255 / math.max(h - 1, 1)) & 0xff
    val b = ((x + y) * 255 / math.max(w + h - 2, 1)) & 0xff
    (r << 16) | (g << 8) | b
  }

  private def maxChannelError(a: MediaCodec.ImageData, px: (Int, Int) => Int): Int = {
    var worst = 0
    for (y <- 0 until a.height; x <- 0 until a.width) {
      val got = a.rgb(y * a.width + x); val want = px(x, y)
      worst = math.max(worst, math.abs(((got >> 16) & 0xff) - ((want >> 16) & 0xff)))
      worst = math.max(worst, math.abs(((got >> 8) & 0xff) - ((want >> 8) & 0xff)))
      worst = math.max(worst, math.abs((got & 0xff) - (want & 0xff)))
    }
    worst
  }

  test("JPEG 4:4:4 roundtrip: smooth content within tight error bounds, q100 tighter than q50") {
    for ((w, h) <- Seq((16, 16), (17, 13), (8, 24))) {
      val px = mkRamp(w, h)
      val q90 = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 90))
      assert(q90.width == w && q90.height == h)
      // smooth gradients survive q90 within a small bound (not exact — lossy)
      assert(maxChannelError(q90, px) <= 12,
        s"q90 error ${maxChannelError(q90, px)} on ${w}x$h")
      val e100 = maxChannelError(
        JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 100)), px)
      val e50 = maxChannelError(
        JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 50)), px)
      assert(e100 <= e50, s"quality must be monotone: q100=$e100 q50=$e50")
      assert(e100 <= 4, s"q100 error $e100 too high for a smooth ramp")
    }
  }

  test("JPEG block-constant fixture decodes BIT-exactly (the gate's oracle contract)") {
    // levels ≡ 2 (mod 3): DC is a multiple of the q90 luma quant step
    val w = 24; val h = 16
    def level(bx: Int, by: Int): Int = 2 + 3 * ((bx + 2 * by) % 85)
    val px: (Int, Int) => Int = (x, y) => {
      val v = level(x / 8, y / 8); (v << 16) | (v << 8) | v
    }
    val img = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, px, quality = 90))
    for (y <- 0 until h; x <- 0 until w)
      assert(img.rgb(y * w + x) == px(x, y), s"pixel ($x,$y)")
  }

  test("JPEG 4:2:0 subsampling: decoder upsamples, luma detail survives") {
    val w = 32; val h = 24
    val px = mkRamp(w, h)
    val bytes = JpegCodec.encodeJpeg(w, h, px, quality = 90, subsample420 = true)
    val img = JpegCodec.decodeJpeg(bytes)
    assert(img.width == w && img.height == h)
    // chroma is halved so bounds loosen, but a gradient must still track
    assert(maxChannelError(img, px) <= 24,
      s"4:2:0 error ${maxChannelError(img, px)}")
    // and the stream really declares 2x2 sampling (SOF byte check)
    val sof = bytes.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    assert((bytes(sof + 11) & 0xff) == 0x22, "Y component must be 2x2 sampled")
  }

  test("JPEG non-multiple-of-MCU sizes decode at declared dims (edge replication)") {
    val w = 19; val h = 11
    val px = mkRamp(w, h)
    val img = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, px, quality = 90, subsample420 = true))
    assert(img.width == w && img.height == h)
    assert(maxChannelError(img, px) <= 24)
  }

  test("JPEG grayscale (1-component SOF) decodes: block-constant exact, ramp bounded") {
    // block-constant levels ≡ 2 (mod 3): DC-exact at q90, like the gate
    val w = 16; val h = 16
    def level(bx: Int, by: Int): Int = 2 + 3 * ((bx + 2 * by) % 85)
    val exact = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(w, h, (x, y) => level(x / 8, y / 8), quality = 90))
    assert(exact.width == w && exact.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = level(x / 8, y / 8)
      assert(exact.rgb(y * w + x) == ((v << 16) | (v << 8) | v), s"($x,$y)")
    }
    // smooth ramp within lossy bounds
    val ramp = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(17, 13, (x, y) => (x * 10 + y * 5) & 0xff, 90))
    var worst = 0
    for (y <- 0 until 13; x <- 0 until 17)
      worst = math.max(worst,
        math.abs(((ramp.rgb(y * 17 + x) >> 16) & 0xff) - ((x * 10 + y * 5) & 0xff)))
    assert(worst <= 12, s"gray ramp error $worst")
  }

  test("JPEG restart markers (DRI/RSTn): decoder resyncs and resets DC prediction") {
    // 6x2 = 12 MCUs with restarts every 2: exercises RST0..RST5 and the
    // DC-predictor reset; DC-exact fixture so the decode must be
    // bit-equal to the restart-free stream
    val w = 48; val h = 16
    def level(bx: Int, by: Int): Int = 2 + 3 * ((5 * bx + 2 * by) % 85)
    val px: (Int, Int) => Int = (x, y) => level(x / 8, y / 8)
    val plain = JpegCodec.decodeJpeg(JpegCodec.encodeJpegGray(w, h, px, 90))
    val restarted = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpegGray(w, h, px, 90, restartInterval = 2))
    assert(restarted.rgb.toSeq == plain.rgb.toSeq)
    for (y <- 0 until h; x <- 0 until w) {
      val v = level(x / 8, y / 8)
      assert(restarted.rgb(y * w + x) == ((v << 16) | (v << 8) | v), s"($x,$y)")
    }
  }

  test("JPEG refusals: frame/scan mismatch, truncation, bad SOI — loud, never garbage") {
    val good = JpegCodec.encodeJpeg(16, 16, mkRamp(16, 16))
    // flip SOF0 to SOF2: the baseline full-band scan header is illegal
    // inside a progressive frame (DC scans must have Se = 0) — the
    // decoder must refuse the inconsistent stream, not guess
    val prog = good.clone()
    val sof = prog.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[RuntimeException] { JpegCodec.decodeJpeg(prog) }
    assert(e.getMessage.toLowerCase.contains("dc scan"))
    // truncated entropy stream
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(java.util.Arrays.copyOf(good, good.length / 2))
    }
    // not a JPEG at all
    intercept[IllegalArgumentException] {
      JpegCodec.decodeJpeg(Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("JPEG payloads take the REAL decode path in decodeFeatures — stub unreachable") {
    val w = 16; val h = 8
    // constant mid-gray: decodes exactly, so the luma features are exact
    val bytes = JpegCodec.encodeJpeg(w, h, (_, _) => 0x808080, quality = 90)
    MediaCodec.decodeAny(bytes) match {
      case Some(MediaCodec.DecodedImage(img)) =>
        assert(img.width == w && img.height == h)
        assert(img.rgb.forall(_ == 0x808080))
      case other => fail(s"JPEG did not dispatch as an image: $other")
    }
    val feats = Multimodal.decodeFeatures(bytes, 8)
    assert(feats(0) == 2.0 && feats(1) == w && feats(2) == h,
      s"JPEG fell back to the stub: ${feats.toSeq}")
    // and the stub is provably different on these bytes
    assert(feats.toSeq != Multimodal.stubDecodeFeatures(bytes, 8).toSeq)
  }

  test("resizeBilinear: identity at same size, exact on linear ramps, bounds checked") {
    val src = MediaCodec.ImageData(16, 16,
      Array.tabulate(256)(i => { val v = 2 * (i % 16) + 2 * (i / 16); (v << 16) | (v << 8) | v }))
    assert(MediaCodec.resizeBilinear(src, 16, 16) eq src)
    val half = MediaCodec.resizeBilinear(src, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = 4 * x + 4 * y + 2 // bilinear of a linear ramp is exact
      assert(half.rgb(y * 8 + x) == ((v << 16) | (v << 8) | v), s"($x,$y)")
    }
    intercept[IllegalArgumentException] {
      MediaCodec.resizeBilinear(src, 0, 8)
    }
    intercept[IllegalArgumentException] {
      MediaCodec.resizeBilinear(src, 1 << 20, 1 << 20) // pixel bound
    }
  }

  test("dHash: stable under re-encode and scaling, distinct across content, null for non-images") {
    import spark.implicits._
    def grad(scale: Int): (Int, Int) => Int = (x, y) => {
      val v = math.min(255, (x * 28 / scale + y * 3 / scale))
      (v << 16) | (v << 8) | v
    }
    val base = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(9, 8, grad(1)))
    val h0 = Multimodal.dHash64(base)
    // the same CONTENT at 4x resolution hashes identically (dHash's
    // whole point: the 9x8 resample normalizes scale)
    val big = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(36, 32, grad(4)))
    assert(Multimodal.dHash64(big) == h0,
      s"scale changed the hash: $h0 vs ${Multimodal.dHash64(big)}")
    // lossless re-encode through PNG: identical
    val png = MediaCodec.decodePng(MediaCodec.encodePng(9, 8, grad(1)))
    assert(Multimodal.dHash64(png) == h0)
    // different content: different hash (a vertical vs horizontal ramp)
    val other = MediaCodec.decodeBmp(MediaCodec.encodeBmp24(9, 8,
      (x, y) => { val v = y * 30; (v << 16) | (v << 8) | v }))
    assert(Multimodal.dHash64(other) != h0)
    // perceptualHash: image rows get the hash, text rows get NULL
    val media = Seq(
        (1L, MediaCodec.encodeBmp24(9, 8, grad(1))),
        (2L, "just text".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.perceptualHash(media).orderBy("media_id").collect()
    assert(out(0).getLong(1) == h0 && out(0).schema.fieldNames.toSeq ==
      Seq("media_id", "phash"))
    assert(out(1).isNullAt(1))
  }

  test("videoBandFingerprints: pigeonhole sub-bands recall bit-perturbed re-encodes exact mode misses") {
    import spark.implicits._
    def mix(a: Long, b: Long): Long = {
      var z = a * 0x9E3779B97F4A7C15L + b
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def base(f: Int, x: Int, y: Int): Int =
      30 + (((mix(7L, f * 1024L + y * 9 + x) % 180) + 180) % 180).toInt
    // clip A: 12 original frames; clip B: the lossy re-encode — ONE
    // dHash bit flipped per frame (pixel (8, y) of an even row inverts
    // comparison (7, y), the only bit that pixel feeds)
    def encode(noisy: Boolean, us: Int) =
      MediaCodec.encodeAvi(9, 8, 12, us, (f, x, y) => {
        val flipRow = 2 * (((mix(99L, f) % 4) + 4) % 4).toInt
        val v =
          if (noisy && x == 8 && y == flipRow) {
            val v7 = base(f, 7, y)
            if (base(f, 8, y) > v7) v7 - 8 else v7 + 8
          } else base(f, x, y)
        (v << 16) | (v << 8) | v
      })
    val media = Seq(
        (1L, encode(noisy = false, 40000)),
        (2L, encode(noisy = true, 33333)))
      .toDF("media_id", "payload")
    def pairs(subBands: Int): Long = {
      val fp = Multimodal.videoBandFingerprints(media, everyNth = 2,
        bandSize = 3, subBands = subBands)
      fp.as("a").join(fp.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.sub_idx") === col("b.sub_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.media_id") < col("b.media_id"))
        .select("a.band_idx").distinct().count()
    }
    // exact mode: every band carries ≥ 1 flipped bit — zero recall
    assert(pairs(subBands = 1) == 0L)
    // 4 pigeonhole lanes: ≤ 3 flips per 3-frame band leave ≥ 1 lane
    // untouched — BOTH bands collide (guaranteed, not probabilistic)
    assert(pairs(subBands = 4) == 2L)

    // worst-case pigeonhole: 3 flips per band landing in 3 DISTINCT
    // lanes (rows 0, 2, 4 → lanes 0, 1, 2) still leave lane 3 clean —
    // the guarantee's tight edge, not an average case
    def encodeSpread(us: Int) =
      MediaCodec.encodeAvi(9, 8, 12, us, (f, x, y) => {
        val flipRow = 2 * ((f / 2) % 3) // sampled frames hit rows 0,2,4
        val v =
          if (x == 8 && y == flipRow) {
            val v7 = base(f, 7, y)
            if (base(f, 8, y) > v7) v7 - 8 else v7 + 8
          } else base(f, x, y)
        (v << 16) | (v << 8) | v
      })
    val spread = Seq(
        (1L, encode(noisy = false, 40000)),
        (2L, encodeSpread(29997)))
      .toDF("media_id", "payload")
    val fp = Multimodal.videoBandFingerprints(spread, everyNth = 2,
      bandSize = 3, subBands = 4)
    val hits = fp.as("a").join(fp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sub_idx") === col("b.sub_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.band_idx"), col("a.sub_idx"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    // every band survives on exactly the untouched lane 3
    assert(hits === Set((0, 3), (1, 3)), hits.toString)
  }

  test("resizePayload: real pixels shrink, metadata tracks truth, non-images pass through") {
    import spark.implicits._
    val bmp = MediaCodec.encodeBmp24(20, 10, (x, y) => ((x * 12) << 16) | ((y * 25) << 8) | 7)
    val textPayload = "not an image".getBytes("UTF-8")
    val media = Seq(
        (1L, "image", bmp, (20, 10, 16000, 1)),
        (2L, "image", textPayload, (20, 10, 16000, 1)))
      .toDF("media_id", "modality", "payload", "meta")
      .select(col("media_id"), col("modality"), col("payload"),
        col("meta").cast("struct<width:int,height:int,sample_rate:int,n_frames:int>").as("meta"))
    val out = Multimodal.resizePayload(media, maxDim = 10)
      .orderBy("media_id").collect()
    // row 1: really resized — payload is a decodable 10x5 PPM
    assert(out(0).getAs[Boolean]("resized"))
    val resized = MediaCodec.decodePpm(out(0).getAs[Array[Byte]]("payload"))
    assert(resized.width == 10 && resized.height == 5)
    assert(out(0).getStruct(3).getInt(0) == 10 && out(0).getStruct(3).getInt(1) == 5)
    // row 2: undecodable payload passes through untouched
    assert(!out(1).getAs[Boolean]("resized"))
    assert(out(1).getAs[Array[Byte]]("payload").toSeq == textPayload.toSeq)
  }
}
