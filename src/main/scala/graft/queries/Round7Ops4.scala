package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AudioFeatures, MediaCodec}

/** Round-7 batch 4: audio ANALYSIS over decoded PCM — the feature
  * stage after the round-6 WAV decode gate. Per-document WAVs are
  * synthesized with the `mm_wav_decode` sample formula, decoded through
  * the real [[MediaCodec.decodeWav]], framed, and transformed.
  *
  * `mm_audio_wht` is hash-green end-to-end: framing, energy,
  * zero-crossings, peaks, and a 64-point Walsh–Hadamard spectrum are
  * ALL exact integer arithmetic, so DuckDB replays every coefficient
  * bit-for-bit (`bit_count(j & t)` parity signs over generate_series) —
  * a slip in the butterfly network, frame offsets, or band edges
  * hash-fails. The float FFT path (`AudioFeatures.spectrogram`) rides
  * the same framing/decode plumbing and is pinned by AudioFeaturesSpec
  * (Parseval against this gate's exact energies, impulse flatness,
  * pure-tone peak bin); `mm_audio_spectrogram` is its rows-only gate.
  */
object Round7Ops4 {

  private def wavs(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val rate = 8000 + (d % 5).toInt * 1000
        val n = 50 + (d % 101).toInt
        val samples = Array.tabulate(n)(i =>
          ((d * 31 + i * 17) % 4093 - 2046).toShort)
        (d, MediaCodec.encodeWavPcm16(rate, samples))
      })
      .toDF("media_id", "wav")
  }

  val mm_audio_wht = OpQuery(
    "mm_audio_wht",
    """WITH g AS (
      |  SELECT doc_id, 50 + CAST(doc_id % 101 AS INT) AS n
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, i.i // 64 AS f, i.i % 64 AS t,
      |         (doc_id * 31 + i.i * 17) % 4093 - 2046 AS v
      |  FROM g, unnest(generate_series(0, (n // 64) * 64 - 1)) AS i(i)
      |), wht AS (
      |  SELECT s.doc_id, s.f, j.j,
      |         SUM(CASE WHEN bit_count(j.j & s.t) % 2 = 0 THEN s.v ELSE -s.v END) AS hj
      |  FROM s, unnest(generate_series(0, 63)) AS j(j)
      |  GROUP BY s.doc_id, s.f, j.j
      |), bands AS (
      |  SELECT doc_id,
      |         SUM(CASE WHEN j = 0 THEN ABS(hj) ELSE 0 END) AS wht_dc,
      |         SUM(CASE WHEN j BETWEEN 1 AND 7 THEN ABS(hj) ELSE 0 END) AS wht_low,
      |         SUM(CASE WHEN j >= 32 THEN ABS(hj) ELSE 0 END) AS wht_high
      |  FROM wht GROUP BY doc_id
      |), feat AS (
      |  SELECT doc_id, f,
      |         SUM(v * v) AS sum_sq,
      |         MAX(ABS(v)) AS peak,
      |         SUM(CASE WHEN v * lag_v < 0 THEN 1 ELSE 0 END) AS zc
      |  FROM (SELECT *, LAG(v) OVER (PARTITION BY doc_id, f ORDER BY t) AS lag_v FROM s)
      |  GROUP BY doc_id, f
      |), agg AS (
      |  SELECT doc_id, COUNT(*) AS n_frames, SUM(sum_sq) AS sum_sq,
      |         SUM(zc) AS zero_cross, SUM(peak) AS peak_sum
      |  FROM feat GROUP BY doc_id
      |)
      |SELECT a.doc_id AS media_id,
      |       CAST(a.n_frames AS INT) AS n_frames,
      |       CAST(a.sum_sq AS BIGINT) AS sum_sq,
      |       CAST(a.zero_cross AS BIGINT) AS zero_cross,
      |       CAST(a.peak_sum AS BIGINT) AS peak_sum,
      |       CAST(b.wht_dc AS BIGINT) AS wht_dc,
      |       CAST(b.wht_low AS BIGINT) AS wht_low,
      |       CAST(b.wht_high AS BIGINT) AS wht_high
      |FROM agg a JOIN bands b USING (doc_id)
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    AudioFeatures.frameFeatures(wavs(spark, dir), "media_id", "wav", 64)
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("sum_sq")).cast("long").as("sum_sq"),
        sum(col("zero_cross")).cast("long").as("zero_cross"),
        sum(col("peak")).cast("long").as("peak_sum"),
        sum(col("wht_dc")).cast("long").as("wht_dc"),
        sum(col("wht_low")).cast("long").as("wht_low"),
        sum(col("wht_high")).cast("long").as("wht_high"))
      .orderBy(col("media_id"))
  }

  /** Rows-only: the FFT path's gate. Float magnitudes can't hash-match
    * across engines (libm ulps); the exact-integer twin above pins the
    * shared decode/framing, and AudioFeaturesSpec pins the FFT math
    * (Parseval vs the twin's sum_sq, impulse, pure-tone peak bin).
    */
  val mm_audio_spectrogram = OpQuery.noOracle("mm_audio_spectrogram") {
    (spark, dir) =>
      val spec = AudioFeatures.spectrogram(wavs(spark, dir), "media_id", "wav", 64)
      val perBin = spec
        .groupBy(col("media_id"), col("bin"))
        .agg(sum(col("magnitude")).as("mag"),
          countDistinct(col("frame_idx")).as("nf"))
      val w = Window.partitionBy(col("media_id"))
        .orderBy(col("mag").desc, col("bin").asc)
      perBin
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("media_id"), col("bin").as("peak_bin"),
          col("nf").cast("int").as("n_frames"))
        .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(mm_audio_wht, mm_audio_spectrogram)
}
