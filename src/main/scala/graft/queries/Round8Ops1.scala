package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 1: the JPEG decode gate (real baseline Huffman + IDCT
  * under a DuckDB-replayable DC-exact fixture) and the real pixel-resize
  * gate (decode → bilinear → re-encode, oracled through a linear ramp).
  */
object Round8Ops1 {

  /** Baseline JPEG decode through the REAL pipeline — marker parse,
    * canonical Huffman, DC prediction, dequantize, IDCT, color convert
    * ([[graft.operators.JpegCodec]]). JPEG is lossy, so the oracle
    * fixture is chosen to survive EXACTLY: grayscale images built of
    * constant 8x8 blocks whose levels are ≡ 2 (mod 3) — at quality 90
    * the luma DC quant step is 3 and the DC coefficient 8·(v−128) is a
    * multiple of it, chroma is identically 128 (zero coefficients), so
    * every block reconstructs bit-exactly and DuckDB replays the block
    * formula. DC prediction is genuinely exercised (levels differ per
    * block); full-frequency AC content is pinned by error bounds in
    * MultimodalSpec instead (float IDCT isn't SQL-replayable).
    */
  val mm_jpeg_decode = OpQuery(
    "mm_jpeg_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         8 * (1 + CAST(doc_id % 3 AS INT)) AS w,
      |         8 * (1 + CAST(doc_id % 2 AS INT)) AS h
      |  FROM documents),
      |blocks AS (
      |  SELECT doc_id, w, h,
      |         2 + 3 * CAST((doc_id + bx.bx + 2 * by.by) % 85 AS INT) AS v
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
        val w = 8 * (1 + (d % 3).toInt)
        val h = 8 * (1 + (d % 2).toInt)
        def level(bx: Int, by: Int): Int = (2 + 3 * ((d + bx + 2 * by) % 85)).toInt
        val payload = JpegCodec.encodeJpeg(w, h, (x, y) => {
          val v = level(x / 8, y / 8)
          (v << 16) | (v << 8) | v
        }, quality = 90)
        val img = JpegCodec.decodeJpeg(payload) // the real decoder under test
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

  /** REAL pixel resize through [[graft.operators.Multimodal.resizePayload]]:
    * 16x16 grayscale linear-ramp BMPs (v = 2x + 2y + doc%100) are
    * bilinear-downsampled to 8x8 and re-encoded as PPM. Bilinear
    * interpolation of a linear ramp is EXACT, and the 2:1 pixel-center
    * sampling lands on half-integers whose interpolated values are exact
    * integers (no rounding ambiguity) — so DuckDB replays the resized
    * raster as v' = 4X + 4Y + 2 + doc%100 and the whole
    * decode → resample → re-encode chain is hash-pinned.
    */
  val mm_resize_pixels = OpQuery(
    "mm_resize_pixels",
    """WITH px AS (
      |  SELECT doc_id, CAST(doc_id % 100 AS INT) AS d, x.x AS x, y.y AS y
      |  FROM documents,
      |       LATERAL unnest(generate_series(0, 7)) AS x(x),
      |       LATERAL unnest(generate_series(0, 7)) AS y(y))
      |SELECT doc_id AS media_id,
      |       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
      |       TRUE AS resized,
      |       CAST(SUM(4 * x + 4 * y + 2 + d) AS BIGINT) AS sum_luma
      |FROM px GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val media = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { docId =>
        val d = (docId % 100).toInt
        val payload = MediaCodec.encodeBmp24(16, 16, (x, y) => {
          val v = 2 * x + 2 * y + d
          (v << 16) | (v << 8) | v
        })
        (docId, "image", payload, (16, 16, 16000, 1))
      })
      .toDF("media_id", "modality", "payload", "meta")
      .select(col("media_id"), col("modality"), col("payload"),
        col("meta").cast("struct<width:int,height:int,sample_rate:int,n_frames:int>")
          .as("meta"))
    Multimodal.resizePayload(media, maxDim = 8)
      .as[(Long, String, Array[Byte], (Int, Int, Int, Int), Boolean)]
      .map { case (id, _, payload, meta, resized) =>
        val img = MediaCodec.decodePpm(payload)
        var sum = 0L
        var i = 0
        while (i < img.rgb.length) { sum += (img.rgb(i) >> 16) & 0xff; i += 1 }
        require(meta._1 == img.width && meta._2 == img.height,
          s"meta ${meta._1}x${meta._2} disagrees with payload ${img.width}x${img.height}")
        (id, img.width, img.height, resized, sum)
      }
      .toDF("media_id", "width", "height", "resized", "sum_luma")
      .orderBy(col("media_id"))
  }

  /** Join-form PQ bulk serve past the LUT-collect ceiling: the query
    * set is the embeddings table replicated to EXACTLY 4500 distinct
    * query ids (> the 4096 ceiling [[graft.operators.PqIndex.search]]
    * refuses at), served via [[graft.operators.PqIndex.searchBulk]] —
    * probe cells, residual LUTs, and ADC all computed distributed, no
    * driver collect of the query set. The gate emits per-query result
    * counts (every query must land exactly k hits), which DuckDB
    * replays trivially; the ADC VALUES are pinned separately by
    * PqIndexSpec's bit-equality of searchBulk vs the collect path.
    */
  val sim_pq_serve_bulk = OpQuery(
    "sim_pq_serve_bulk",
    """SELECT CAST(q.q AS BIGINT) AS query_id, CAST(5 AS INT) AS n_hits
      |FROM (SELECT unnest(generate_series(0, 4499)) AS q) q
      |ORDER BY query_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{PqIndex, TableStore}
    val scratch = GateScratch.dir("graft-pqbulk-")
    val store = new TableStore(spark, scratch.toString)
    val emb = Tables.load(spark, dir, "embeddings")
    PqIndex.build(store, "bulk", emb, numCells = 16, m = 8, k = 16,
      iters = 2, residual = true)
    val h = PqIndex.open(store, "bulk")
    val n = emb.count()
    val reps = (4500 / n + 1).toInt
    val queries = emb
      .crossJoin(spark.range(reps).toDF("__rep"))
      .withColumn("vec_id", col("vec_id") + col("__rep") * n)
      .drop("__rep")
      .filter(col("vec_id") < 4500)
    PqIndex.searchBulk(h, queries, k = 5, nprobe = 4)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("int").as("n_hits"))
      .orderBy(col("query_id"))
  }

  /** Perceptual image hashing (dHash) through the REAL decode path:
    * per-document 9×8 grayscale BMPs carry a per-group luma formula, so
    * documents sharing `doc_id % 37` are EXACT visual duplicates — the
    * image-dedup join key. The fixture is dHash-grid-sized (no resize),
    * so every comparison bit is a pure formula predicate DuckDB
    * replays; the hash is emitted as two 32-bit halves (a shift into
    * BIGINT's sign bit is an overflow error in DuckDB). The resize path
    * and robustness live in MultimodalSpec.
    */
  val mm_phash_dedup = OpQuery(
    "mm_phash_dedup",
    """WITH b AS (
      |  SELECT doc_id, CAST(doc_id % 37 AS INT) AS g FROM documents
      |), bits AS (
      |  SELECT doc_id, y.y * 8 + x.x AS bit,
      |         CASE WHEN ((g * 7 + (x.x + 1) * (x.x + 1) * 3 + y.y * 5) % 200)
      |                 > ((g * 7 + x.x * x.x * 3 + y.y * 5) % 200)
      |              THEN 1 ELSE 0 END AS v
      |  FROM b,
      |       LATERAL unnest(generate_series(0, 7)) AS x(x),
      |       LATERAL unnest(generate_series(0, 7)) AS y(y))
      |SELECT doc_id AS media_id,
      |       CAST(SUM(CASE WHEN v = 1 AND bit < 32
      |                THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
      |         AS phash_lo,
      |       CAST(SUM(CASE WHEN v = 1 AND bit >= 32
      |                THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT)
      |         AS phash_hi
      |FROM bits GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val media = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val g = (d % 37).toInt
        val payload = MediaCodec.encodeBmp24(9, 8, (x, y) => {
          val v = (g * 7 + x * x * 3 + y * 5) % 200
          (v << 16) | (v << 8) | v
        })
        (d, payload)
      })
      .toDF("media_id", "payload")
    Multimodal.perceptualHash(media)
      .select(
        col("media_id"),
        col("phash").bitwiseAND(lit(0xFFFFFFFFL)).as("phash_lo"),
        shiftrightunsigned(col("phash"), 32).as("phash_hi"))
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(mm_jpeg_decode, mm_resize_pixels,
    sim_pq_serve_bulk, mm_phash_dedup)
}
