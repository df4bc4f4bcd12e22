package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AudioFeatures, MediaCodec}

/** Round-8 batch 3: audio spectral fingerprinting — near-dup detection
  * for the third modality (text has MinHash, images have dHash).
  */
object Round8Ops3 {

  /** Audio fingerprint through the REAL path (WAV decode → 64-sample
    * framing → exact integer WHT → 8 band sums → temporal comparison
    * bits): every stage is integer arithmetic, so DuckDB replays the
    * complete per-frame byte sequence — the butterfly network
    * (`bit_count(j & t)` parity signs), band edges, frame offsets, and
    * the LAG comparison all hash-fail on a slip. Same deterministic
    * WAV fixture as `mm_audio_wht` (shared framing plumbing).
    */
  val mm_audio_fingerprint = OpQuery(
    "mm_audio_fingerprint",
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
      |), bandsum AS (
      |  SELECT doc_id, f, j // 8 AS b, SUM(ABS(hj)) AS e
      |  FROM wht GROUP BY doc_id, f, j // 8
      |), bits AS (
      |  SELECT doc_id, f, b,
      |         CASE WHEN e > LAG(e) OVER (PARTITION BY doc_id, b ORDER BY f)
      |              THEN 1 ELSE 0 END AS bit
      |  FROM bandsum
      |), bytes AS (
      |  SELECT doc_id, f, CAST(SUM(bit * (1 << b)) AS INT) AS byte
      |  FROM bits GROUP BY doc_id, f
      |)
      |SELECT doc_id AS media_id,
      |       CAST(COUNT(*) AS INT) AS n_frames,
      |       string_agg(CAST(byte AS VARCHAR), '-' ORDER BY f) AS fp
      |FROM bytes GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val wavs = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val rate = 8000 + (d % 5).toInt * 1000
        val n = 50 + (d % 101).toInt
        val samples = Array.tabulate(n)(i =>
          ((d * 31 + i * 17) % 4093 - 2046).toShort)
        (d, MediaCodec.encodeWavPcm16(rate, samples))
      })
      .toDF("media_id", "wav")
    AudioFeatures.audioFingerprints(wavs, "media_id", "wav", frameLen = 64)
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        array_join(transform(col("fp"), _.cast("string")), "-").as("fp"))
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(mm_audio_fingerprint)
}
