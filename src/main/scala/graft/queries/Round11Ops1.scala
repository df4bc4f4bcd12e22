package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityModel

/** Round-11 batch 1: Hamming-tolerant video near-dup (pigeonhole
  * sub-banding over frame dHashes — VERDICT r10 item 2) and the gated
  * LOGISTIC quality filter (VERDICT r10 item 3).
  */
object Round11Ops1 {

  private def mix(a: Long, b: Long): Int = Round9Ops1.mix(a, b)

  /** Noisy video near-dup: a REAL lossy re-encode does not keep rasters
    * bit-exact — it flips 1–2 dHash bits per frame, and the r10 exact
    * band key (`mm_video_fingerprint`) then misses every band. This
    * gate runs [[graft.operators.Multimodal.videoBandFingerprints]]
    * with `subBands = 4` (each 64-bit frame hash split into four
    * 16-bit pigeonhole lanes, one folded key per lane) over a fixture
    * with PLANTED BIT PERTURBATIONS:
    *
    * quartets g = doc_id/4 of really-encoded 9×8 AVIs (12 frames) —
    *   - p0: the original clip;
    *   - p1: the noisy re-encode — per frame, EXACTLY one dHash bit
    *     flipped (pixel (8, y) of an even row y inverts comparison
    *     (7, y), the one bit that pixel feeds), at a different frame
    *     rate so the bytes differ everywhere;
    *   - p2: the over-perturbed decoy — per frame, one bit flipped in
    *     EVERY lane (odd rows 1/3/5/7 → lanes 0/1/2/3), so no lane
    *     survives on any frame;
    *   - p3: unrelated content.
    *
    * Known by construction: each band holds 3 sampled frames, so p0–p1
    * accumulates ≤ 3 flipped bits per band across 4 lanes — the
    * pigeonhole guarantees ≥ 1 untouched lane per band and the pair
    * collides on EVERY band (2 complete bands); p1's even-row flips
    * and p2's odd-row flips are disjoint, so p2 shares no lane key
    * with either p0 or p1; p3 collides with nothing (splitmix content
    * keys, 2⁻⁶⁴-scale chance). The oracle replays pairs and
    * distinct-shared-band counts from doc_id arithmetic alone. The
    * exact-mode twin (`mm_video_fingerprint`, subBands = 1) would find
    * NOTHING here — pinned in MultimodalSpec, which is the whole
    * point of the lane split.
    */
  val mm_video_fingerprint_noisy: OpQuery = OpQuery(
    "mm_video_fingerprint_noisy",
    """WITH d AS (SELECT doc_id FROM documents)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |       CAST(2 AS BIGINT) AS shared_bands
      |FROM d a JOIN d b
      |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id + 1 = b.doc_id
      |WHERE a.doc_id % 4 = 0
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val corpus = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val g = d / 4; val p = (d % 4).toInt
        val contentKey = if (p == 3) 2000000000L + d else g
        // base luma in [30, 209]: room for the ±8 comparison inversion
        def base(f: Int, x: Int, y: Int): Int =
          30 + ((mix(contentKey, f * 1024L + y * 9 + x) % 180) + 180) % 180
        // rows whose (8, y) pixel must invert its (7, y) comparison:
        // p1 flips ONE even row per frame; p2 flips one odd row per
        // lane (1,3,5,7) — disjoint from p1's by parity
        def flippedRows(f: Int): Set[Int] = p match {
          case 1 => Set(2 * ((((mix(g * 7 + 13, f) % 4) + 4) % 4)))
          case 2 => Set(1, 3, 5, 7)
          case _ => Set.empty
        }
        val usPerFrame = p match {
          case 1 => 33333; case 2 => 25000; case _ => 40000
        }
        val payload = MediaCodec.encodeAvi(9, 8, 12, usPerFrame,
          (f, x, y) => {
            val v =
              if (x == 8 && flippedRows(f).contains(y)) {
                // invert the (7, y) comparison: bit was set iff
                // base(8) > base(7); push the pixel 8 levels past the
                // other side (luma of a gray pixel is exact)
                val v7 = base(f, 7, y)
                if (base(f, 8, y) > v7) v7 - 8 else v7 + 8
              } else base(f, x, y)
            (v << 16) | (v << 8) | v
          })
        (d, payload)
      })
      .toDF("media_id", "payload")
      .localCheckpoint(true)
    val fp = Multimodal.videoBandFingerprints(corpus, everyNth = 2,
      bandSize = 3, subBands = 4)
    fp.as("a").join(fp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sub_idx") === col("b.sub_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      // DISTINCT bands, not raw lane hits: how many lanes survive a
      // band is data-dependent (1–3 of 4); that ≥ 1 survives per band
      // is the pigeonhole guarantee the oracle replays
      .agg(countDistinct(col("a.band_idx")).as("shared_bands"))
      .orderBy("id1", "id2")
  }

  val all: Seq[OpQuery] = Seq(mm_video_fingerprint_noisy)
}
