package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 batch 1: the non-quadratic scale path for the Hodges–Lehmann
  * estimator (VERDICT r8 item 7 — `a54_hodges_lehmann` is
  * O(n²)-by-definition on the slow register; this gate is the variant a
  * 100 TB pipeline would actually run).
  */
object Round9Ops1 {

  /** Approximate Hodges–Lehmann via a deterministic quantile-grid
    * subsample: per group, rank the values once (one partitioned
    * window), keep every `step`-th order statistic so ~40 survive, and
    * compute the exact Walsh-average median over the SAMPLE — O(m²) on
    * a FIXED m per group, so total cost is the O(n log n) rank pass
    * plus a constant per group, vs the exact gate's per-group n²/2
    * fan-out. The grid is rank-deterministic (no RNG): both engines
    * select identical rows, so the gate is hash-oracled end-to-end.
    * When a group has ≤ 40 values the step is 1 and the estimate is
    * EXACTLY the full Hodges–Lehmann (pinned in HlApproxSpec, which
    * also pins the grid-gap error bound on a 2000-row group).
    */
  /** The approx-HL walk as Spark SQL over `view` (c_nationkey /
    * c_acctbal / c_custkey columns) — shared by the gate and
    * HlApproxSpec so the error-bound assertions exercise the EXACT
    * query text the gate ships.
    */
  private[graft] def hlApproxSparkSql(view: String): String =
    s"""WITH vals AS (
       |  SELECT c_nationkey AS nation,
       |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
       |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
       |           ORDER BY c_acctbal, c_custkey) AS i,
       |         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
       |  FROM $view),
       |samp AS (
       |  SELECT nation, c,
       |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY i) AS j
       |  FROM vals
       |  WHERE (i - 1) % GREATEST(1L, CAST(FLOOR(n / 40.0) AS BIGINT)) = 0),
       |walsh AS (
       |  SELECT a.nation, a.c + b.c AS s2
       |  FROM samp a JOIN samp b ON a.nation = b.nation AND a.j <= b.j),
       |ranked AS (
       |  SELECT nation, s2,
       |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY s2) AS r,
       |         COUNT(*) OVER (PARTITION BY nation) AS np
       |  FROM walsh)
       |SELECT nation, CAST(MAX(np) AS BIGINT) AS n_pairs,
       |       CAST(MAX(CASE WHEN r = CAST(FLOOR((np + 1) / 2) AS BIGINT) THEN s2 END) AS DOUBLE)
       |         / 200 AS hl_estimate
       |FROM ranked
       |GROUP BY nation
       |ORDER BY nation""".stripMargin

  /** The exact (O(n²)-per-group) walk over the same column contract —
    * spec-side ground truth for the bound assertions.
    */
  private[graft] def hlExactSparkSql(view: String): String =
    s"""WITH vals AS (
       |  SELECT c_nationkey AS nation,
       |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
       |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
       |           ORDER BY c_acctbal, c_custkey) AS i
       |  FROM $view),
       |walsh AS (
       |  SELECT a.nation, a.c + b.c AS s2
       |  FROM vals a JOIN vals b ON a.nation = b.nation AND a.i <= b.i),
       |ranked AS (
       |  SELECT nation, s2,
       |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY s2) AS r,
       |         COUNT(*) OVER (PARTITION BY nation) AS n
       |  FROM walsh)
       |SELECT nation, CAST(MAX(n) AS BIGINT) AS n_pairs,
       |       CAST(MAX(CASE WHEN r = CAST(FLOOR((n + 1) / 2) AS BIGINT) THEN s2 END) AS DOUBLE)
       |         / 200 AS hl_estimate
       |FROM ranked
       |GROUP BY nation
       |ORDER BY nation""".stripMargin

  val a54_hl_approx = OpQuery(
    "a54_hl_approx",
    """WITH vals AS (
      |  SELECT c_nationkey AS nation,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |           ORDER BY c_acctbal, c_custkey) AS i,
      |         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM customer),
      |samp AS (
      |  SELECT nation, c,
      |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY i) AS j
      |  FROM vals
      |  WHERE (i - 1) % GREATEST(1, CAST(FLOOR(n / 40.0) AS BIGINT)) = 0),
      |walsh AS (
      |  SELECT a.nation, a.c + b.c AS s2
      |  FROM samp a JOIN samp b ON a.nation = b.nation AND a.j <= b.j),
      |ranked AS (
      |  SELECT nation, s2,
      |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY s2) AS r,
      |         COUNT(*) OVER (PARTITION BY nation) AS np
      |  FROM walsh)
      |SELECT nation, CAST(MAX(np) AS BIGINT) AS n_pairs,
      |       CAST(MAX(CASE WHEN r = CAST(FLOOR((np + 1) / 2) AS BIGINT) THEN s2 END) AS DOUBLE)
      |         / 200 AS hl_estimate
      |FROM ranked
      |GROUP BY nation
      |ORDER BY nation""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "customer").createOrReplaceTempView("graft_hla_customer")
    spark.sql(hlApproxSparkSql("graft_hla_customer"))
  }

  /** splitmix64 finalizer (public-domain constants) — the fixture's
    * content generator. Strong mixing matters here: modality keys are
    * 64-bit content hashes (dHash bits, fingerprint comparison bits),
    * and a weak generator with a short period would plant ACCIDENTAL
    * cross-cluster collisions at larger scale factors (a `% 200` luma
    * formula repeats every 200 groups — sf0.1 has 1,667 image groups).
    */
  private[queries] def mix(a: Long, b: Long): Int = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0x7fffffffL).toInt
  }

  /** Cross-modal dedup end-to-end (VERDICT r8 item 3, extended with the
    * FOURTH modality in round 10 per VERDICT r9 item 3): the four
    * per-modality near-dup keys — MinHash-LSH over text
    * ([[graft.operators.Dedup.minHashNearDups]]), dHash-64 over decoded
    * rasters ([[graft.operators.Multimodal.perceptualHash]]), the WHT
    * band-energy fingerprint over decoded WAVs
    * ([[graft.operators.AudioFeatures.audioFingerprints]]), and the
    * frame-sampled dHash band fingerprint over decoded AVIs
    * ([[graft.operators.Multimodal.videoBandFingerprints]]) — composed
    * over ONE mixed-media corpus into unified duplicate clusters via
    * [[graft.operators.Dedup.connectedComponents]]. This is the
    * LLM-curation shape the parts were built for: a syndicated web page
    * re-hosts the same image under different prose, the same audio under
    * a re-written transcript, the same clip re-encoded and cut short —
    * only the UNION of modality edges finds the full cluster.
    *
    * Fixture: documents group into OCTETS (s = doc_id/8); within an
    * octet the chain is 0–1 same text, 1–2 same image, 2–3 same audio,
    * 3–4 same text, 4–5 same image, 5–6 same VIDEO (doc 6 is the
    * truncated re-encode of doc 5's clip: 9 of its 12 frames at a
    * different frame rate — the fingerprint's two robustness claims
    * exercised inside the cluster gate), 6–7 same text — so the eight
    * docs form ONE component IFF all four modalities contribute edges;
    * drop any modality and the cluster splits (pinned in
    * MultimodalDedupSpec). Ground truth is known by construction
    * (component = 8·(doc_id/8), tail chains stay prefixes), so the
    * oracle replays clusters without recursive SQL.
    *
    * Scale: text edges are banded LSH (bucket-join, never all-pairs);
    * image/audio/video edges are equality joins on 64-bit content keys;
    * the component step is the adaptive union-find/pointer-jumping CC.
    * No stage is quadratic in the corpus.
    */
  val dedup_multimodal = OpQuery(
    "dedup_multimodal",
    """WITH d AS (
      |  SELECT doc_id, CAST(doc_id - doc_id % 8 AS BIGINT) AS component
      |  FROM documents),
      |c AS (
      |  SELECT component, CAST(COUNT(*) AS INT) AS cluster_size
      |  FROM d GROUP BY component)
      |SELECT d.doc_id AS media_id, d.component, c.cluster_size
      |FROM d JOIN c USING (component)
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Dedup
    val corpus = mmCorpus(spark, Tables.load(spark, dir, "documents")
      .select("doc_id"))
    val cc = Dedup.connectedComponents(
      mmTextPairs(corpus)
        .unionByName(mmImagePairs(corpus))
        .unionByName(mmAudioPairs(corpus))
        .unionByName(mmVideoPairs(corpus)))
    val labeled = corpus.select(col("media_id"))
      .join(cc.withColumnRenamed("node", "media_id"), Seq("media_id"), "left")
      // edge-less docs are their own singleton cluster
      .withColumn("component", coalesce(col("component"), col("media_id")))
    val sizes = labeled.groupBy(col("component"))
      .agg(count(lit(1)).cast("int").as("cluster_size"))
    labeled.join(sizes, "component")
      .select(col("media_id"), col("component"), col("cluster_size"))
      .orderBy(col("media_id"))
  }

  /** The mixed-media fixture: one row per doc with (text, image, audio,
    * video payloads) planted on the octet chain described at
    * [[dedup_multimodal]]. Exposed for MultimodalDedupSpec, which pins
    * that each single-modality edge set alone SPLITS the octet and
    * only the union recovers it.
    */
  private[graft] def mmCorpus(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.operators.MediaCodec
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val s = d / 8; val p = (d % 8).toInt
        // unique-text keys live at 1e9+d, disjoint from group keys (~3s)
        val textKey = p match {
          case 0 | 1 => 3 * s
          case 3 | 4 => 3 * s + 1
          case 6 | 7 => 3 * s + 2
          case _     => 1000000000L + d
        }
        val text =
          (0 until 16).map(i => "w" + mix(textKey, i) % 100000).mkString(" ")
        val imgKey: Option[Long] = p match {
          case 1 | 2 => Some(2 * s)
          case 4 | 5 => Some(2 * s + 1)
          case _     => None
        }
        val img = imgKey.map { g =>
          MediaCodec.encodeBmp24(9, 8, (x, y) => {
            val v = mix(g, x * 8 + y) % 256
            (v << 16) | (v << 8) | v
          })
        }.orNull
        // 768 samples = 12 WHT frames = 88 comparison bits per asset
        val wav = (if (p == 2 || p == 3) Some(s) else None).map { g =>
          MediaCodec.encodeWavPcm16(8000,
            Array.tabulate(768)(i => (mix(g, i) % 4093 - 2046).toShort))
        }.orNull
        // video chain link 5–6: SAME clip content; doc 6 is the
        // truncated re-encode (9 of 12 frames, different frame rate) —
        // exact-byte dedup misses it, the band fingerprint must not
        val aviSpec: Option[(Long, Int, Int)] = p match {
          case 5 => Some((s, 12, 40000))
          case 6 => Some((s, 9, 33333))
          case _ => None
        }
        val avi = aviSpec.map { case (g, nFrames, usPerFrame) =>
          MediaCodec.encodeAvi(9, 8, nFrames, usPerFrame, (f, x, y) => {
            val v = mix(g, f * 1024 + y * 9 + x) % 256
            (v << 16) | (v << 8) | v
          })
        }.orNull
        (d, text, img, wav, avi)
      })
      .toDF("media_id", "text", "img", "wav", "avi")
      // encode once: four modality passes re-read this frame
      .localCheckpoint(true)
  }

  private[graft] def mmTextPairs(corpus: org.apache.spark.sql.DataFrame) =
    graft.operators.Dedup.minHashNearDups(
      corpus.select("media_id", "text"), "media_id", "text",
      numHashes = 32, bands = 8, threshold = 0.9).select("id1", "id2")

  private[graft] def mmImagePairs(corpus: org.apache.spark.sql.DataFrame) = {
    val ph = graft.operators.Multimodal.perceptualHash(
      corpus.filter(col("img").isNotNull)
        .select(col("media_id"), col("img").as("payload")))
    ph.as("a").join(ph.as("b"),
        col("a.phash") === col("b.phash") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
  }

  private[graft] def mmAudioPairs(corpus: org.apache.spark.sql.DataFrame) = {
    val fp = graft.operators.AudioFeatures.audioFingerprints(
      corpus.filter(col("wav").isNotNull).select("media_id", "wav"),
      "media_id", "wav")
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
  }

  private[graft] def mmVideoPairs(corpus: org.apache.spark.sql.DataFrame) = {
    // subBands = 4: the Hamming-tolerant production mode (VERDICT r10
    // item 2) — a lossy re-encode flipping ≤ 3 dHash bits per band
    // still collides on at least one pigeonhole lane, while exact
    // rasters (this fixture's octet chain) collide on every lane, so
    // the recovered components are unchanged
    val fp = graft.operators.Multimodal.videoBandFingerprints(
      corpus.filter(col("avi").isNotNull)
        .select(col("media_id"), col("avi").as("payload")),
      everyNth = 2, bandSize = 3, subBands = 4)
    // candidates share any (band_idx, sub_idx, band_key); distinct
    // because a full-length duplicate collides in EVERY band and lane
    fp.as("a").join(fp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sub_idx") === col("b.sub_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      .distinct()
  }

  /** Top-3 principal components through the DEFAULT entry point —
    * which, at d = 64, width-dispatches to the ONE-SCAN Gram path
    * ([[graft.operators.Similarity.topPrincipalComponentsGram]];
    * VERDICT r9 item 1: this gate previously pinned the 36-scan
    * multi-pass walk as the production recipe while the repo's own
    * StressGramScale measured the one-scan path 17× faster — the gate
    * now pins what a 100 TB pipeline should actually run; the
    * multi-pass arithmetic stays pinned by `emb_pca_quantized`). The
    * oracle replays the ENTIRE walk in DuckDB off its own pair-joined
    * Gram matrix ([[GramWalkSql]]): 1dp input quantization makes G
    * exact-integer on both engines, every walk step's G_jk·v_k
    * contribution rounds to 9dp and sums in DECIMAL
    * (order-independent), and the projection deflation
    * w ← w − Σ (v_k·w) v_k is generated as explicit left-to-right
    * terms matching the driver's accumulation order — so eigenvalues
    * AND all 3 component vectors hash-match at 6 dp, and orthogonality
    * is checked by the oracle arithmetic itself (a drifted v₂ changes
    * every later coefficient). r = 3 keeps every per-dimension
    * projection sum at ≤ 2 IEEE-754 addends (bit-commutative); larger
    * r and gram≡multi-pass dispatch equality are PcaToprSpec territory.
    */
  val emb_pca_topr: OpQuery = {
    val iters = 12
    val r = 3
    // the walk CTEs (Gram / deflation / normalization / residual) live
    // in [[GramWalkSql]], shared with emb_whiten
    val finals = (0 until r).map { c =>
      s"""SELECT CAST($c AS INT) AS comp_idx, CAST(g.i - 1 AS INT) AS dim,
         |       CAST(ROUND(vv.v[CAST(g.i AS INT)], 6) AS DOUBLE) AS component,
         |       CAST(ROUND(vv.lambda, 3) AS DOUBLE) AS eigenvalue,
         |       (SELECT resid FROM res$c) < 0.1 AS converged
         |FROM v${c}_$iters vv,
         |     (SELECT unnest(range(1, (SELECT n FROM d) + 1)) AS i) g""".stripMargin
    }.mkString("\nUNION ALL\n")
    val sql = GramWalkSql.walk(r, iters) +
      "\n" + finals + "\nORDER BY comp_idx, dim"
    OpQuery("emb_pca_topr", sql) { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
        .select(transform(col("embedding").cast("array<double>"),
          y => round(y * 10, 0)).as("qv"))
      // the DEFAULT dispatcher — d = 64 ≤ GramEnvelopeDim routes to the
      // one-scan Gram path, which is exactly what the oracle replays
      val comps = graft.operators.Similarity.topPrincipalComponents(
        emb, "qv", r = r, iterations = iters, quantizeDp = 9)
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

  /** Progressive (SOF2) JPEG decode through the REAL Annex-G pipeline
    * (VERDICT r8 item 2): multi-scan spectral selection + successive
    * approximation, coefficient accumulation, one dequantize+IDCT at
    * EOI ([[graft.operators.JpegCodec.decodeJpeg]]). Same DC-exact
    * fixture algebra as `mm_jpeg_decode`: block-constant grayscale
    * levels ≡ 2 (mod 3) survive quantization exactly, and the DC
    * successive-approximation ladder (send dc≫1, then the low bit)
    * reconstructs the predictor-chained DC losslessly — so DuckDB
    * replays the block formula against a stream that exercises every
    * progressive scan shape (interleaved DC first/refine, banded AC
    * first, AC refinement). The in-gate require pins that the payload
    * really is SOF2, so this can never silently regress to baseline.
    */
  val mm_jpeg_progressive = OpQuery(
    "mm_jpeg_progressive",
    """WITH g AS (
      |  SELECT doc_id,
      |         8 * (1 + CAST(doc_id % 4 AS INT)) AS w,
      |         8 * (1 + CAST(doc_id % 3 AS INT)) AS h
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h,
      |         2 + 3 * CAST((2 * doc_id + 3 * bx.bx + by.by) % 85 AS INT) AS v
      |  FROM g,
      |       LATERAL unnest(generate_series(0, w // 8 - 1)) AS bx(bx),
      |       LATERAL unnest(generate_series(0, h // 8 - 1)) AS by(by))
      |SELECT doc_id AS media_id,
      |       CAST(MAX(w) AS INT) AS width,
      |       CAST(MAX(h) AS INT) AS height,
      |       CAST(SUM(64 * v) AS BIGINT) AS sum_luma
      |FROM blocks GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.JpegCodec
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val w = 8 * (1 + (d % 4).toInt)
        val h = 8 * (1 + (d % 3).toInt)
        def level(bx: Int, by: Int): Int = (2 + 3 * ((2 * d + 3 * bx + by) % 85)).toInt
        val payload = JpegCodec.encodeJpegProgressive(w, h, (x, y) => {
          val v = level(x / 8, y / 8)
          (v << 16) | (v << 8) | v
        }, quality = 90)
        // the stream under test must be genuinely progressive (SOF2)
        require((0 until payload.length - 1).exists(i =>
          (payload(i) & 0xff) == 0xff && (payload(i + 1) & 0xff) == 0xc2),
          "fixture payload is not SOF2")
        val img = JpegCodec.decodeJpeg(payload) // the real Annex-G decoder
        var sum = 0L
        var i = 0
        while (i < img.rgb.length) {
          val r = (img.rgb(i) >> 16) & 0xff
          val g = (img.rgb(i) >> 8) & 0xff
          val b = img.rgb(i) & 0xff
          require(r == g && g == b, s"grayscale fixture decoded chromatic: $r/$g/$b")
          sum += r
          i += 1
        }
        (d, img.width, img.height, sum)
      })
      .toDF("media_id", "width", "height", "sum_luma")
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] =
    Seq(a54_hl_approx, dedup_multimodal, emb_pca_topr, mm_jpeg_progressive)
}
