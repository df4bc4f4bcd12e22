package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-7 batch 1: REAL compressed-image decode. PNG is the first
  * COMPRESSED media format the engine decodes end-to-end (DEFLATE via
  * `java.util.zip` — pure JVM, no native libs): synthesize an 8-bit
  * truecolor PNG per document (zlib IDAT, CRC'd chunks), decode it
  * back through [[graft.operators.MediaCodec.decodePng]] (inflate +
  * scanline unfilter), and emit per-image pixel aggregates. The DuckDB
  * oracle replays the pixel-generator formula over generate_series —
  * any slip in the zlib framing, chunk CRCs, stride math, or filter
  * reconstruction hash-fails. This closes the last documented stub
  * class in Multimodal.decodeFeatures down to formats that genuinely
  * need native codecs (JPEG/H.264).
  */
object Round7Ops1 {

  private def t = Tables.load _

  val mm_png_decode = OpQuery(
    "mm_png_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         4 + CAST(doc_id % 11 AS INT) AS w,
      |         3 + CAST(doc_id % 5 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |         (7 * doc_id + 5 * x.x + 3 * y.y) % 256 AS r,
      |         (doc_id + 11 * x.x + 2 * y.y) % 256 AS gg,
      |         (3 * x.x * y.y + 2 * doc_id) % 256 AS b
      |  FROM g,
      |       LATERAL unnest(generate_series(0, w - 1)) AS x(x),
      |       LATERAL unnest(generate_series(0, h - 1)) AS y(y))
      |SELECT doc_id AS media_id,
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
        val w = 4 + (d % 11).toInt
        val h = 3 + (d % 5).toInt
        def pixel(x: Int, y: Int): Int = {
          val r = ((7 * d + 5 * x + 3 * y) % 256).toInt
          val g = ((d + 11 * x + 2 * y) % 256).toInt
          val b = ((3L * x * y + 2 * d) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        (d, MediaCodec.encodePng(w, h, pixel))
      })
      .map { case (d, payload) =>
        val img = MediaCodec.decodePng(payload) // the real parser under test
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.rgb.length) {
          sr += img.r(i); sg += img.g(i); sb += img.b(i); i += 1
        }
        (d, img.width, img.height, sr, sg, sb)
      }
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("media_id"))
  }

  val all: Seq[OpQuery] = Seq(mm_png_decode)
}
