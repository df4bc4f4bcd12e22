package graft.operators

import graft.SparkSpec

/** Pins the audio DSP kernels: the fast WHT against its popcount
  * definition and involution identity, the radix-2 FFT against Parseval
  * / impulse / pure-tone invariants (the float path has no DuckDB
  * oracle — these ARE its correctness contract), and the DataFrame
  * framing plumbing end-to-end through a real encode→decode roundtrip.
  */
class AudioFeaturesSpec extends SparkSpec {

  test("fwht equals the popcount-sign definition on random frames") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 8, 64)) {
      val xs = Array.fill(n)(rnd.nextInt(4001) - 2000L)
      assert(AudioFeatures.fwht(xs).toSeq ==
        AudioFeatures.whtNaive(xs).toSeq, s"n=$n")
    }
  }

  test("fwht is an involution up to the n scale factor") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(64)(rnd.nextInt(4001) - 2000L)
    val twice = AudioFeatures.fwht(AudioFeatures.fwht(xs))
    assert(twice.toSeq == xs.map(_ * 64).toSeq)
  }

  test("fwht refuses non-power-of-two lengths") {
    intercept[IllegalArgumentException] {
      AudioFeatures.fwht(Array(1L, 2L, 3L))
    }
  }

  test("fft satisfies Parseval against the exact integer energy") {
    val rnd = new scala.util.Random(3)
    val samples = Array.fill(64)(rnd.nextInt(4093) - 2046)
    val exactEnergy = samples.map(v => v.toLong * v).sum
    val re = samples.map(_.toDouble)
    val im = new Array[Double](64)
    AudioFeatures.fft(re, im)
    val specEnergy = (0 until 64).map(k => re(k) * re(k) + im(k) * im(k)).sum / 64.0
    assert(math.abs(specEnergy - exactEnergy) / exactEnergy < 1e-9)
  }

  test("fft of an impulse is flat; pure tone peaks at its bin (and mirror)") {
    val re = new Array[Double](64); re(0) = 1.0
    val im = new Array[Double](64)
    AudioFeatures.fft(re, im)
    (0 until 64).foreach { k =>
      assert(math.abs(math.hypot(re(k), im(k)) - 1.0) < 1e-12, s"bin $k")
    }
    val re2 = Array.tabulate(64)(t => math.cos(2 * math.Pi * 5 * t / 64))
    val im2 = new Array[Double](64)
    AudioFeatures.fft(re2, im2)
    val mags = (0 until 64).map(k => math.hypot(re2(k), im2(k)))
    val top2 = mags.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top2 == Set(5, 59))
    assert(math.abs(mags(5) - 32.0) < 1e-9) // N/2 for a unit cosine
  }

  test("frameStats: hand-checked frame, ragged tail dropped, stereo takes channel 0") {
    // 8-sample frame + 3-sample tail (dropped)
    val s = Array[Short](100, -100, 200, -200, 0, 50, -50, 25, 9, 9, 9)
    val out = AudioFeatures.frameStats(s, channels = 1, frameSize = 8)
    assert(out.length == 1)
    val f = out.head
    assert(f.sumSq == 100L * 100 + 100 * 100 + 200 * 200 + 200 * 200 + 0 + 50 * 50 + 50 * 50 + 25 * 25)
    assert(f.zeroCross == 5) // strict sign flips; the 0 breaks the -200→0→50 run
    assert(f.peak == 200)
    val h = AudioFeatures.whtNaive(s.take(8).map(_.toLong))
    assert(f.whtDc == math.abs(h(0)))
    assert(f.whtLow == 0L) // frameSize/8 = 1: empty low band by construction
    assert(f.whtHigh == (4 until 8).map(j => math.abs(h(j))).sum)
    // stereo: channel 0 only
    val st = Array[Short](1, 99, 2, 99, 3, 99, 4, 99, 5, 99, 6, 99, 7, 99, 8, 99)
    val so = AudioFeatures.frameStats(st, channels = 2, frameSize = 8)
    assert(so.head.peak == 8)
  }

  test("frameFeatures decodes real WAV bytes and frames them (DataFrame path)") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("id").as[Long]
      .map { id =>
        val samples = Array.tabulate(130)(i => ((id * 31 + i * 17) % 4093 - 2046).toShort)
        (id, MediaCodec.encodeWavPcm16(8000, samples))
      }
      .toDF("id", "wav")
    val out = AudioFeatures.frameFeatures(df, "id", "wav", 64)
    assert(out.count() == 4) // 130 samples → 2 full frames per doc
    // parity with the array-level kernel
    val expect = AudioFeatures.frameStats(
      Array.tabulate(130)(i => ((31 + i * 17) % 4093 - 2046).toShort), 1, 64)
    val got = out.filter($"id" === 1L).orderBy("frame_idx").collect()
    assert(got.map(_.getLong(2)).toSeq == expect.map(_.sumSq))
    assert(got.map(_.getLong(5)).toSeq == expect.map(_.whtDc))
  }

  test("spectrogram bins obey Parseval per frame against frameFeatures energy") {
    import spark.implicits._
    val df = Seq(5L).toDF("id").as[Long]
      .map { id =>
        val samples = Array.tabulate(64)(i => ((id * 31 + i * 17) % 4093 - 2046).toShort)
        (id, MediaCodec.encodeWavPcm16(8000, samples))
      }
      .toDF("id", "wav")
    val energy = AudioFeatures.frameFeatures(df, "id", "wav", 64)
      .select("sum_sq").as[Long].head()
    // bins 0..32: double the 1..31 interior (mirror), keep 0 and 32 once
    val mags = AudioFeatures.spectrogram(df, "id", "wav", 64)
      .orderBy("bin").select("bin", "magnitude")
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    val specEnergy = mags.map { case (bin, m) =>
      val w = if (bin == 0 || bin == 32) 1.0 else 2.0
      w * m * m
    }.sum / 64.0
    assert(math.abs(specEnergy - energy) / energy < 1e-9)
  }

  test("spectralFingerprint: gain-invariant, content-sensitive, frame-0 zero, stereo folds") {
    val rnd = new scala.util.Random(7)
    val mono = Array.fill(64 * 5)((rnd.nextInt(4000) - 2000).toShort)
    val fp = AudioFeatures.spectralFingerprint(mono, channels = 1)
    assert(fp.length == 5 && fp(0) == 0)
    assert(fp.forall(b => b >= 0 && b <= 255))
    // positive gain scales every band energy equally: comparisons — and
    // therefore the fingerprint — are unchanged (the near-dup property)
    val louder = mono.map(s => (s * 4).toShort)
    assert(AudioFeatures.spectralFingerprint(louder, 1).toSeq == fp.toSeq)
    // different content fingerprints differently
    val other = Array.tabulate(64 * 5)(i => ((i * 37) % 3000 - 1500).toShort)
    assert(AudioFeatures.spectralFingerprint(other, 1).toSeq != fp.toSeq)
    // stereo: channel 0 is the analysis channel (frameStats convention)
    val stereo = new Array[Short](mono.length * 2)
    for (i <- mono.indices) {
      stereo(2 * i) = mono(i)
      stereo(2 * i + 1) = (rnd.nextInt(100) - 50).toShort
    }
    assert(AudioFeatures.spectralFingerprint(stereo, 2).toSeq == fp.toSeq)
    // too-short audio: zero frames, no phantom bytes
    assert(AudioFeatures.spectralFingerprint(mono.take(63), 1).isEmpty)
  }
}
