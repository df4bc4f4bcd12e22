package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 batch 1: block power iteration — the wide-vector PCA path
  * (VERDICT r9 item 2). Past [[graft.operators.Similarity.GramEnvelopeDim]]
  * the one-scan Gram triangle no longer fits task memory, and the only
  * prior path was sequential deflation at r·iterations corpus scans;
  * the block walk gets ALL r components in `iterations` scans — an r×
  * scan reduction exactly where scans are most expensive.
  */
object Round10Ops1 {

  /** Top-3 components by quantized block power iteration, hash-replayed
    * end-to-end: [[BlockWalkSql]] regenerates every pass (per-row
    * contributions rounded to 9dp and summed in DECIMAL —
    * order-independent), the classical Gram–Schmidt
    * re-orthonormalization (coefficients from the Gram output against
    * the same iteration's earlier columns; ≤ 2 IEEE addends per
    * per-dimension correction at r = 3), and the final-pass Rayleigh
    * eigenvalues / full-operator residuals. The gate runs the RAW
    * embeddings (the same regime as `emb_pca_quantized`): each
    * contribution is one IEEE multiply, bit-identical in any engine,
    * so the truncated 3-iteration
    * walk replays exactly (VERDICT r10 item 7: the 8-iteration gate
    * spent 3% of the suite re-proving an already-stationary subspace —
    * the oracle replays whatever length the gate runs, and convergence
    * semantics live in PcaBlockSpec's early-exit pin, not here). Block≡deflation
    * component parity and the iterations-not-r·iterations scan count
    * are PcaBlockSpec territory.
    */
  val emb_pca_block: OpQuery = {
    val iters = 3
    val r = 3
    val finals = (0 until r).map { c =>
      s"""SELECT CAST($c AS INT) AS comp_idx, CAST(g.i - 1 AS INT) AS dim,
         |       CAST(ROUND(cc.v[CAST(g.i AS INT)], 6) AS DOUBLE) AS component,
         |       CAST(ROUND(cc.lambda, 3) AS DOUBLE) AS eigenvalue,
         |       (SELECT resid FROM res$c) < 0.1 AS converged
         |FROM comp$c cc,
         |     (SELECT unnest(range(1, (SELECT n FROM d) + 1)) AS i) g""".stripMargin
    }.mkString("\nUNION ALL\n")
    val sql = BlockWalkSql.walk(r, iters) +
      "\n" + finals + "\nORDER BY comp_idx, dim"
    OpQuery("emb_pca_block", sql) { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val comps = graft.operators.Similarity.topPrincipalComponentsBlock(
        emb, "embedding", r = r, iterations = iters, quantizeDp = 9)
      import spark.implicits._
      comps.zipWithIndex.flatMap { case ((lambda, v, resid), c) =>
        v.zipWithIndex.map { case (x, dimIdx) =>
          (c, dimIdx, x, lambda, resid < 0.1)
        }
      }.toDF("comp_idx", "dim", "component", "eigenvalue", "converged")
        .select(
          col("comp_idx").cast("int").as("comp_idx"),
          col("dim").cast("int").as("dim"),
          round(col("component"), 6).as("component"),
          round(col("eigenvalue"), 3).as("eigenvalue"),
          col("converged"))
        .orderBy("comp_idx", "dim")
    }
  }

  /** splitmix64 finalizer (public-domain constants) — the fixture
    * content generator, same rationale as Round9Ops1's: 64-bit content
    * keys must not collide accidentally at larger scale factors.
    */
  private def mix(a: Long, b: Long): Int = Round9Ops1.mix(a, b)

  /** Video near-dup via the frame-sampled dHash band fingerprint
    * (VERDICT r9 item 3 — the fourth modality: AVI frames were really
    * decoded since r8 but video dup detection reduced to exact-byte
    * dedup). Fixture: documents group into quartets (g = doc_id/4) of
    * really-encoded 9×8 uncompressed AVIs — p0 the original clip
    * (12 frames @ 40000 µs), p1 the RE-ENCODE (same rasters, different
    * frame rate → different bytes, so exact dedup misses it), p2 the
    * TRUNCATION (first 9 frames at yet another rate), p3 unrelated
    * content. The operator decodes, dHashes every 2nd frame, bands 3
    * hashes per key, and joins on (band_idx, band_key): p0–p1 share
    * BOTH bands, pairs with p2 share exactly the prefix band, p3 pairs
    * with nothing — all known by construction, so the oracle replays
    * pairs and shared-band counts from doc_id arithmetic alone. Chance
    * cross-content band collisions are 2⁻⁶⁴-scale by the splitmix
    * content keys.
    */
  val mm_video_fingerprint: OpQuery = OpQuery(
    "mm_video_fingerprint",
    """WITH d AS (SELECT doc_id FROM documents)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |       CAST(CASE WHEN a.doc_id % 4 < 2 AND b.doc_id % 4 < 2
      |            THEN 2 ELSE 1 END AS INT) AS shared_bands
      |FROM d a JOIN d b
      |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 4 < 3 AND b.doc_id % 4 < 3
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val corpus = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val g = d / 4; val p = (d % 4).toInt
        val contentKey = if (p == 3) 1000000000L + d else g
        val nFrames = if (p == 2) 9 else 12
        val usPerFrame = p match {
          case 1 => 33333; case 2 => 29997; case _ => 40000
        }
        val payload = MediaCodec.encodeAvi(9, 8, nFrames, usPerFrame,
          (f, x, y) => {
            val v = mix(contentKey, f * 1024L + y * 9 + x) % 256
            (v << 16) | (v << 8) | v
          })
        (d, payload)
      })
      .toDF("media_id", "payload")
      .localCheckpoint(true)
    val fp = Multimodal.videoBandFingerprints(corpus, everyNth = 2,
      bandSize = 3, subBands = 1) // exact mode: bit-identical rasters
    fp.as("a").join(fp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sub_idx") === col("b.sub_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      .agg(count(lit(1)).cast("int").as("shared_bands"))
      .orderBy("id1", "id2")
  }

  /** COLOR progressive (SOF2) JPEG decode — the chroma path of the
    * Annex-G decoder under a real multi-component progressive stream
    * (VERDICT r9 item 6: the progressive gate fixture was
    * grayscale-content-only, leaving interleaved-DC + chroma-subsampled
    * scans gate-uncovered). Fixture algebra, derived once and pinned
    * in-gate per pixel: block-constant luma levels v ≡ 2 (mod 3) in
    * [20, 230] with a CONSTANT chromatic offset — pixel
    * (v+6, v, v+9). The channel offsets cancel v in the chroma planes
    * (YCbCr coefficients sum to 0 across equal shifts), so Cb/Cr are
    * image-constant; the quality-90 quant ladder then lands exactly:
    * Y DC = 8(3m + 2.82) → quantized 8m+8 → decoded luma plane v+3;
    * Cb = 128+3.487584 → quantized 9·3 → plane offset +3;
    * Cr = 128+2.268192 → quantized 6·3 → plane offset +2; the decoder's
    * integer rounding of (y′ + 1.402·cr′, y′ − 0.344136·cb′ −
    * 0.714136·cr′, y′ + 1.772·cb′) gives EXACTLY (v+6, v+1, v+8) for
    * every block — no clamp ever fires in [20, 230]. Odd docs encode
    * 4:2:0 (dims are multiples of 16, constant chroma survives the box
    * downsample and nearest upsample exactly), even docs 4:4:4 — both
    * chroma layouts hash through one oracle. The in-gate requires pin
    * SOF2 and the per-pixel formula, so a quant-ladder change fails
    * loudly instead of hash-mismatching obscurely.
    */
  val mm_jpeg_progressive_color: OpQuery = OpQuery(
    "mm_jpeg_progressive_color",
    """WITH g AS (
      |  SELECT doc_id,
      |         16 * (1 + CAST(doc_id % 3 AS INT)) AS w,
      |         16 * (1 + CAST(doc_id % 2 AS INT)) AS h
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h,
      |         20 + 3 * CAST((doc_id + 2 * bx.bx + by.by) % 71 AS INT) AS v
      |  FROM g,
      |       LATERAL unnest(generate_series(0, w // 8 - 1)) AS bx(bx),
      |       LATERAL unnest(generate_series(0, h // 8 - 1)) AS by(by))
      |SELECT doc_id AS media_id,
      |       CAST(MAX(w) AS INT) AS width,
      |       CAST(MAX(h) AS INT) AS height,
      |       CAST(SUM(64 * (v + 6)) AS BIGINT) AS sum_r,
      |       CAST(SUM(64 * (v + 1)) AS BIGINT) AS sum_g,
      |       CAST(SUM(64 * (v + 8)) AS BIGINT) AS sum_b
      |FROM blocks GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.JpegCodec
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val w = 16 * (1 + (d % 3).toInt)
        val h = 16 * (1 + (d % 2).toInt)
        def level(bx: Int, by: Int): Int =
          20 + 3 * (((d + 2 * bx + by) % 71).toInt)
        val payload = JpegCodec.encodeJpegProgressive(w, h, (x, y) => {
          val v = level(x / 8, y / 8)
          ((v + 6) << 16) | (v << 8) | (v + 9)
        }, quality = 90, subsample420 = d % 2 == 1)
        require((0 until payload.length - 1).exists(i =>
          (payload(i) & 0xff) == 0xff && (payload(i + 1) & 0xff) == 0xc2),
          "fixture payload is not SOF2")
        val img = JpegCodec.decodeJpeg(payload) // the real Annex-G decoder
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = level(x / 8, y / 8)
            val p = img.rgb(y * w + x)
            val r = (p >> 16) & 0xff; val gg = (p >> 8) & 0xff; val b = p & 0xff
            require(r == v + 6 && gg == v + 1 && b == v + 8,
              s"pixel ($x,$y) of doc $d decoded ($r,$gg,$b), expected " +
                s"(${v + 6},${v + 1},${v + 8}) — quant ladder drifted")
            sr += r; sg += gg; sb += b
            x += 1
          }
          y += 1
        }
        (d, img.width, img.height, sr, sg, sb)
      })
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] =
    Seq(emb_pca_block, mm_video_fingerprint, mm_jpeg_progressive_color)
}
