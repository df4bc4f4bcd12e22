package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Similarity, TableStore}

/** Round-6 batch 4: the persistent ANN index as a warehouse artifact.
  *
  * `sim_ivf_persisted` runs the FULL lifecycle — build the IVF index
  * from the embeddings table, persist centroids + cell-partitioned
  * postings through [[TableStore]], REOPEN the index as a fresh handle
  * (as a later session would), and serve a query batch off the pruned
  * postings scan. The oracle is the same deterministic SQL replay as
  * the in-memory `sim_ivf_topk` gate: persistence must be invisible in
  * the results, bit for bit, while the physical read prunes to the
  * probed `cell_id=N/` partitions (asserted in AnnIndexSpec).
  */
object Round6Ops4 {

  private def t = Tables.load _

  private val ivfOracle =
    """WITH cents AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell_id,
      |         embedding::DOUBLE[] AS centroid
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
      |), assigned AS (
      |  SELECT vec_id, embedding, cell_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |             ORDER BY -list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1
      |), probes AS (
      |  SELECT query_id, qvec, cell_id FROM (
      |    SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS qvec, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |             ORDER BY -list_cosine_similarity(q.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 8)
      |  WHERE rn <= 4
      |), scored AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id,
      |         list_cosine_similarity(a.embedding::DOUBLE[], p.qvec) AS score
      |  FROM assigned a JOIN probes p ON p.cell_id = a.cell_id
      |  WHERE a.vec_id <> p.query_id
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY score DESC, corpus_id ASC) AS INT) AS rank,
      |         score
      |  FROM scored)
      |SELECT query_id, corpus_id, rank, CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  val sim_ivf_persisted = OpQuery(
    "sim_ivf_persisted", ivfOracle) { (spark, dir) =>
    val emb = t(spark, dir, "embeddings")
    val root = graft.queries.GateScratch.dir("graft-annidx-").toString
    val store = new TableStore(spark, root)
    AnnIndex.build(store, "emb", emb, numCells = 16)
    // reopen from disk — nothing of the build survives but the tables
    val idx = AnnIndex.open(store, "emb")
    AnnIndex.search(idx, emb.filter(col("vec_id") < 8), k = 5, nprobe = 4)
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The quantized persisted index (IVF-SQ8): postings hold int8 codes
    * (4x smaller), probe selection stays full-precision, in-cell
    * scoring is the integer dot product. Both the IVF cell logic and
    * the q8 arithmetic (`FLOOR(x + 0.5)` = Java Math.round) already
    * have exact SQL replays, so their composition is hash-green too.
    */
  val sim_ivf_persisted_q8 = OpQuery(
    "sim_ivf_persisted_q8",
    """WITH cents AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell_id,
      |         embedding::DOUBLE[] AS centroid
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
      |), assigned AS (
      |  SELECT vec_id, cell_id FROM (
      |    SELECT e.vec_id, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |             ORDER BY -list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1
      |), u AS (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[],
      |           x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
      |                                          embedding::DOUBLE[]))) AS u
      |  FROM embeddings
      |), qz AS (
      |  SELECT vec_id, m,
      |         list_transform(u, x -> CAST(FLOOR(x * (127.0 / m) + 0.5) AS BIGINT)) AS q
      |  FROM (SELECT vec_id, u,
      |               list_max(list_transform(u, x -> abs(x))) AS m FROM u)
      |  WHERE m > 0
      |), probes AS (
      |  SELECT query_id, cell_id FROM (
      |    SELECT q.vec_id AS query_id, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |             ORDER BY -list_cosine_similarity(q.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 8)
      |  WHERE rn <= 4
      |), scored AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id,
      |         list_dot_product(cz.q, qz2.q) * (cz.m / 127.0) * (qz2.m / 127.0)
      |           AS score
      |  FROM assigned a
      |  JOIN probes p ON p.cell_id = a.cell_id
      |  JOIN qz cz ON cz.vec_id = a.vec_id
      |  JOIN qz qz2 ON qz2.vec_id = p.query_id
      |  WHERE a.vec_id <> p.query_id
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY score DESC, corpus_id ASC) AS INT) AS rank,
      |         score
      |  FROM scored)
      |SELECT query_id, corpus_id, rank, CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = t(spark, dir, "embeddings")
    val root = graft.queries.GateScratch.dir("graft-annq8-").toString
    val store = new TableStore(spark, root)
    AnnIndex.buildQuantized(store, "embq", emb, numCells = 16)
    val idx = AnnIndex.open(store, "embq")
    AnnIndex.searchQuantized(idx, emb.filter(col("vec_id") < 8), k = 5, nprobe = 4)
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** REAL audio decode end-to-end: per document, synthesize a PCM16
    * mono WAV (deterministic sawtooth-ish formula in doc_id), run it
    * through [[graft.operators.MediaCodec.decodeWav]] — a genuine RIFF
    * chunk-walk parser — and emit integer sample aggregates. The oracle
    * replays the GENERATOR formula in SQL over generate_series, so the
    * gate hash-matches iff header layout, little-endian int16 decode,
    * and sample order are all exactly right. This is the round-6 flip
    * of the decode seam from stub to real (WAV leg).
    */
  val mm_wav_decode = OpQuery(
    "mm_wav_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         8000 + CAST(doc_id % 5 AS INT) * 1000 AS rate,
      |         50 + CAST(doc_id % 101 AS INT) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, rate, n,
      |         (doc_id * 31 + i.i * 17) % 4093 - 2046 AS v
      |  FROM g, LATERAL unnest(generate_series(0, n - 1)) AS i(i))
      |SELECT doc_id AS media_id,
      |       CAST(MAX(rate) AS INT) AS sample_rate,
      |       CAST(COUNT(*) AS INT) AS n_samples,
      |       CAST(SUM(v) AS BIGINT) AS s_sum,
      |       CAST(MIN(v) AS INT) AS s_min,
      |       CAST(MAX(v) AS INT) AS s_max,
      |       CAST(SUM(ABS(v)) AS BIGINT) AS s_abs
      |FROM s GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.MediaCodec
    t(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val rate = 8000 + (d % 5).toInt * 1000
        val n = 50 + (d % 101).toInt
        val samples = Array.tabulate(n)(i => ((d * 31 + i * 17) % 4093 - 2046).toShort)
        (d, MediaCodec.encodeWavPcm16(rate, samples))
      })
      .map { case (d, payload) =>
        val wav = MediaCodec.decodeWav(payload) // the real parser under test
        val s = wav.samples
        (d, wav.sampleRate, s.length,
          s.foldLeft(0L)(_ + _), s.min.toInt, s.max.toInt,
          s.foldLeft(0L)((a, x) => a + math.abs(x.toLong)))
      }
      .toDF("media_id", "sample_rate", "n_samples", "s_sum", "s_min", "s_max", "s_abs")
      .orderBy(col("media_id"))
  }

  /** REAL image decode end-to-end, both raster formats: even doc_ids
    * become 24bpp bottom-up BMPs (row padding, BGR byte order), odd
    * ones binary P6 PPMs (text header); both decode through
    * [[graft.operators.MediaCodec]] to the same pixel grid, so ONE
    * SQL replay oracles both container formats — any padding,
    * row-order, or channel-order slip in either codec hash-fails.
    */
  val mm_bmp_decode = OpQuery(
    "mm_bmp_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         3 + CAST(doc_id % 13 AS INT) AS w,
      |         2 + CAST(doc_id % 7 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |         (doc_id + 3 * x.x + 7 * y.y) % 256 AS r,
      |         (2 * doc_id + 5 * x.x + y.y) % 256 AS gg,
      |         (x.x * y.y + doc_id) % 256 AS b
      |  FROM g,
      |       LATERAL unnest(generate_series(0, w - 1)) AS x(x),
      |       LATERAL unnest(generate_series(0, h - 1)) AS y(y))
      |SELECT doc_id AS media_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS container,
      |       CAST(MAX(w) AS INT) AS width,
      |       CAST(MAX(h) AS INT) AS height,
      |       CAST(SUM(r) AS BIGINT) AS sum_r,
      |       CAST(SUM(gg) AS BIGINT) AS sum_g,
      |       CAST(SUM(b) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.MediaCodec
    t(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val w = 3 + (d % 13).toInt
        val h = 2 + (d % 7).toInt
        def pixel(x: Int, y: Int): Int = {
          val r = ((d + 3 * x + 7 * y) % 256).toInt
          val g = ((2 * d + 5 * x + y) % 256).toInt
          val b = ((x.toLong * y + d) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        val payload =
          if (d % 2 == 0) MediaCodec.encodeBmp24(w, h, pixel)
          else MediaCodec.encodePpm(w, h, pixel)
        (d, if (d % 2 == 0) "bmp" else "ppm", payload)
      })
      .map { case (d, container, payload) =>
        val img = // the real parsers under test
          if (container == "bmp") MediaCodec.decodeBmp(payload)
          else MediaCodec.decodePpm(payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.rgb.length) {
          sr += img.r(i); sg += img.g(i); sb += img.b(i); i += 1
        }
        (d, container, img.width, img.height, sr, sg, sb)
      }
      .toDF("media_id", "container", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("media_id"))
  }

  /** REAL video decode end-to-end: synthesize an uncompressed-DIB AVI
    * per document (RIFF hdrl/strl/movi tree, bottom-up padded frames),
    * decode through [[graft.operators.MediaCodec.decodeAvi]], and emit
    * per-video frame/pixel aggregates — every-2nd-frame SAMPLED sums,
    * so the gate also exercises decode-then-frame-sample composition.
    * Oracle replays the generator over a triple generate_series. With
    * this, all three modalities decode for real.
    */
  val mm_avi_decode = OpQuery(
    "mm_avi_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         3 + CAST(doc_id % 9 AS INT) AS w,
      |         2 + CAST(doc_id % 5 AS INT) AS h,
      |         1 + CAST(doc_id % 7 AS INT) AS nf
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, nf, f.f AS f,
      |         (doc_id + f.f + x.x) % 256 AS r,
      |         (doc_id * 2 + f.f * 2 + y.y * 3) % 256 AS gg,
      |         (f.f * x.x + y.y + doc_id) % 256 AS b
      |  FROM g,
      |       LATERAL unnest(generate_series(0, nf - 1)) AS f(f),
      |       LATERAL unnest(generate_series(0, w - 1)) AS x(x),
      |       LATERAL unnest(generate_series(0, h - 1)) AS y(y)
      |  WHERE f.f % 2 = 0)
      |SELECT doc_id AS media_id,
      |       CAST(MAX(w) AS INT) AS width,
      |       CAST(MAX(h) AS INT) AS height,
      |       CAST(MAX(nf) AS INT) AS n_frames,
      |       CAST(COUNT(DISTINCT f) AS INT) AS n_sampled,
      |       CAST(SUM(r) AS BIGINT) AS sum_r,
      |       CAST(SUM(gg) AS BIGINT) AS sum_g,
      |       CAST(SUM(b) AS BIGINT) AS sum_b
      |FROM px
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.MediaCodec
    t(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val w = 3 + (d % 9).toInt
        val h = 2 + (d % 5).toInt
        val nf = 1 + (d % 7).toInt
        val payload = MediaCodec.encodeAvi(w, h, nf, 40000, (f, x, y) => {
          val r = ((d + f + x) % 256).toInt
          val g = ((d * 2 + f * 2 + y * 3) % 256).toInt
          val b = ((f.toLong * x + y + d) % 256).toInt
          (r << 16) | (g << 8) | b
        })
        (d, payload)
      })
      .map { case (d, payload) =>
        val avi = MediaCodec.decodeAvi(payload) // the real parser under test
        // decode-then-sample: keep every 2nd frame
        val sampled = avi.frames.zipWithIndex.collect { case (fr, i) if i % 2 == 0 => fr }
        var sr = 0L; var sg = 0L; var sb = 0L
        sampled.foreach { fr =>
          var i = 0
          while (i < fr.rgb.length) { sr += fr.r(i); sg += fr.g(i); sb += fr.b(i); i += 1 }
        }
        (d, avi.width, avi.height, avi.frames.length, sampled.length, sr, sg, sb)
      }
      .toDF("media_id", "width", "height", "n_frames", "n_sampled",
        "sum_r", "sum_g", "sum_b")
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(sim_ivf_persisted, sim_ivf_persisted_q8,
    mm_wav_decode, mm_bmp_decode, mm_avi_decode)
}
