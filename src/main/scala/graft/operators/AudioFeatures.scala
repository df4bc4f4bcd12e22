package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio feature extraction over decoded PCM — the analysis stage a
  * multimodal training-data pipeline runs after [[MediaCodec.decodeWav]]:
  * framing, energy/zero-crossing/peak stats, an EXACT integer
  * Walsh–Hadamard spectrum (the oracle-able stand-in for the FFT — same
  * butterfly structure, ±1 basis, so every coefficient is an integer sum
  * both engines reproduce bit-for-bit), and a real radix-2 FFT
  * spectrogram for the float path (spec-verified: Parseval, impulse
  * flatness, sinusoid peak-bin; see AudioFeaturesSpec).
  *
  * Plan shape at 100 TB: everything here is MAP-ONLY over the binary
  * audio column — decode, frame, transform inside one `flatMap` per
  * partition, no shuffle, embarrassingly parallel; output volume is
  * O(frames), a fixed fan-out of the input. Aggregations the caller adds
  * on top group on the media id (uniform).
  */
object AudioFeatures {

  /** Fast Walsh–Hadamard transform (natural/Hadamard order):
    * H[j] = Σ_t x[t]·(−1)^popcount(j AND t). Pure Long butterflies —
    * EXACT for any |x| ≤ 2^47/n, no rounding anywhere. O(n log n).
    */
  def fwht(xs: Array[Long]): Array[Long] = {
    val n = xs.length
    require(n > 0 && (n & (n - 1)) == 0,
      s"WHT length must be a power of two, got $n")
    val a = xs.clone()
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + h) {
          val x = a(j); val y = a(j + h)
          a(j) = x + y
          a(j + h) = x - y
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
    a
  }

  /** Definition-form WHT (popcount signs) — the spec cross-check for
    * [[fwht]]'s butterflies. O(n²); test-only.
    */
  private[operators] def whtNaive(xs: Array[Long]): Array[Long] = {
    val n = xs.length
    Array.tabulate(n) { j =>
      var acc = 0L
      var t = 0
      while (t < n) {
        acc += (if (java.lang.Integer.bitCount(j & t) % 2 == 0) xs(t) else -xs(t))
        t += 1
      }
      acc
    }
  }

  /** In-place iterative radix-2 complex FFT (decimation-in-time, negative
    * exponent convention). Powers of two only.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0,
      s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Per-frame exact features of one PCM channel-0 signal. Frames are
    * non-overlapping `frameSize`-sample windows; the ragged tail is
    * dropped (a fixed analysis hop, the standard convention). All fields
    * are integers: sum of squares (energy), strict sign-flip
    * zero-crossings, peak |amplitude|, and three WHT band sums —
    * |H[0]| (DC), Σ|H[j]| for j in [1, n/8) (low band), Σ|H[j]| for
    * j in [n/2, n) (high band).
    */
  final case class FrameStats(
      frameIdx: Int, sumSq: Long, zeroCross: Int, peak: Int,
      whtDc: Long, whtLow: Long, whtHigh: Long)

  def frameStats(samples: Array[Short], channels: Int,
      frameSize: Int): IndexedSeq[FrameStats] = {
    require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
      s"frame size must be a power of two, got $frameSize")
    require(channels >= 1, s"bad channel count $channels")
    val mono = if (channels == 1) samples
      else Array.tabulate(samples.length / channels)(i => samples(i * channels))
    val nFrames = mono.length / frameSize
    (0 until nFrames).map { f =>
      val off = f * frameSize
      var sumSq = 0L; var zc = 0; var peak = 0
      val frame = new Array[Long](frameSize)
      var t = 0
      while (t < frameSize) {
        val v = mono(off + t).toLong
        frame(t) = v
        sumSq += v * v
        val a = math.abs(mono(off + t).toInt)
        if (a > peak) peak = a
        if (t > 0 && mono(off + t - 1).toLong * v < 0) zc += 1
        t += 1
      }
      val h = fwht(frame)
      var lo = 0L; var hi = 0L
      var jj = 1
      while (jj < frameSize / 8) { lo += math.abs(h(jj)); jj += 1 }
      jj = frameSize / 2
      while (jj < frameSize) { hi += math.abs(h(jj)); jj += 1 }
      FrameStats(f, sumSq, zc, peak, math.abs(h(0)), lo, hi)
    }
  }

  /** DataFrame form: decode a WAV binary column and emit one row per
    * analysis frame. Map-only (decode + transform inside the scan); the
    * id column must be integral.
    */
  def frameFeatures(df: DataFrame, idCol: String, wavCol: String,
      frameSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wavCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val wav = MediaCodec.decodeWav(bytes)
        frameStats(wav.samples, wav.channels, frameSize).map(s =>
          (id, s.frameIdx, s.sumSq, s.zeroCross, s.peak,
            s.whtDc, s.whtLow, s.whtHigh))
      }
      .toDF(idCol, "frame_idx", "sum_sq", "zero_cross", "peak",
        "wht_dc", "wht_low", "wht_high")
  }

  /** Spectral fingerprint (the Haitsma–Kalker shape on the exact WHT):
    * per 64-sample frame, the 64 WHT coefficients collapse to 8 band
    * |magnitude| sums, and bit b of the frame's byte is set iff band b's
    * energy EXCEEDS the previous frame's (frame 0 → all-zero byte).
    * Temporal band-energy comparisons survive re-encoding and small
    * gain changes — the audio near-dup key, completing the modality
    * set next to MinHash (text) and dHash (images). Exact integer
    * arithmetic end to end, so the gate oracle replays every bit.
    */
  def spectralFingerprint(samples: Array[Short], channels: Int,
      frameLen: Int = 64): Array[Int] = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0 && frameLen >= 8,
      s"frame length must be a power of two >= 8, got $frameLen")
    val mono = if (channels == 1) samples
      else Array.tabulate(samples.length / channels)(i => samples(i * channels))
    val nFrames = mono.length / frameLen
    val out = new Array[Int](nFrames)
    val prev = new Array[Long](8)
    var f = 0
    while (f < nFrames) {
      val xs = Array.tabulate(frameLen)(t => mono(f * frameLen + t).toLong)
      val h = fwht(xs)
      val e = new Array[Long](8)
      var j = 0
      while (j < frameLen) { e(j * 8 / frameLen) += math.abs(h(j)); j += 1 }
      var byte = 0
      if (f > 0) {
        var b = 0
        while (b < 8) { if (e(b) > prev(b)) byte |= 1 << b; b += 1 }
      }
      Array.copy(e, 0, prev, 0, 8)
      out(f) = byte
      f += 1
    }
    out
  }

  /** DataFrame form of [[spectralFingerprint]]: (id, n_frames, fp) with
    * fp the per-frame byte sequence. Map-only, like [[frameFeatures]].
    */
  def audioFingerprints(df: DataFrame, idCol: String, wavCol: String,
      frameLen: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wavCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val wav = MediaCodec.decodeWav(bytes)
        val fp = spectralFingerprint(wav.samples, wav.channels, frameLen)
        (id, fp.length, fp.toSeq)
      }
      .toDF(idCol, "n_frames", "fp")
  }

  /** FFT magnitude spectrogram: one row per (frame, bin) for bins
    * 0..frameSize/2 (real input ⇒ the upper half mirrors). Float path —
    * correctness is pinned by AudioFeaturesSpec (Parseval vs the exact
    * integer energy, impulse flatness, pure-tone peak bin), and the
    * integer WHT twin `mm_audio_wht` is the hash-green oracle gate for
    * the shared framing/decode plumbing.
    */
  def spectrogram(df: DataFrame, idCol: String, wavCol: String,
      frameSize: Int): DataFrame = {
    require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
      s"frame size must be a power of two, got $frameSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wavCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val wav = MediaCodec.decodeWav(bytes)
        val mono = if (wav.channels == 1) wav.samples
          else Array.tabulate(wav.samples.length / wav.channels)(i =>
            wav.samples(i * wav.channels))
        val nFrames = mono.length / frameSize
        (0 until nFrames).flatMap { f =>
          val re = Array.tabulate(frameSize)(t =>
            mono(f * frameSize + t).toDouble)
          val im = new Array[Double](frameSize)
          fft(re, im)
          (0 to frameSize / 2).map { bin =>
            (id, f, bin, math.sqrt(re(bin) * re(bin) + im(bin) * im(bin)))
          }
        }
      }
      .toDF(idCol, "frame_idx", "bin", "magnitude")
  }
}
