package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConcurrentWriteException, OptimisticWriter, TableStore}

/** Round-7 batch 2: MULTI-WRITER table semantics, oracled. The gate
  * drives [[graft.operators.OptimisticWriter]] through the full
  * conflict matrix on one partitioned table — two transactions that
  * snapshot the SAME version and then both commit partition-scoped
  * replaces to disjoint partitions (the second rebases onto the
  * first's result instead of aborting), plus a stale full-table
  * overwrite that MUST abort — and returns per-partition aggregates of
  * the final table. The DuckDB oracle recomputes the final state
  * relationally from `orders`, so a wrong conflict verdict in either
  * direction breaks the gate: a false conflict kills the second commit
  * (row counts change), a missed conflict lets the stale overwrite
  * clobber both (everything changes).
  */
object Round7Ops2 {

  val occ_disjoint_writers = OpQuery(
    "occ_disjoint_writers",
    """WITH final AS (
      |  SELECT o_orderkey, o_orderpriority,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 'X'
      |              ELSE o_orderstatus END AS st
      |  FROM orders
      |  WHERE o_orderpriority <> '5-LOW' OR o_orderkey % 2 = 0)
      |SELECT o_orderpriority,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CASE WHEN st = 'X' THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM final
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-occ-gate-")
    val store = new TableStore(spark, scratch.toString)
    val occ = new OptimisticWriter(store)
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
    store.overwrite("orders_mw", orders, partitionBy = Seq("o_orderpriority"))

    // three writers snapshot the SAME version before any commit lands
    val urgent = occ.begin("orders_mw")
    val low = occ.begin("orders_mw")
    val stale = occ.begin("orders_mw")

    // writer 1: flag every urgent order
    occ.commitReplacePartitions(urgent,
      orders.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_orderstatus", lit("X")),
      "o_orderpriority", Seq("1-URGENT"))
    // writer 2: thin the low-priority partition — DISJOINT from writer
    // 1, so it must rebase and commit even though the table advanced
    occ.commitReplacePartitions(low,
      orders.filter(col("o_orderpriority") === "5-LOW" &&
        col("o_orderkey") % 2 === 0),
      "o_orderpriority", Seq("5-LOW"))
    // writer 3: a stale full-table overwrite must ABORT (it read v0,
    // two commits landed since) and leave no trace
    val aborted =
      try { occ.commitOverwrite(stale, orders.limit(1)); false }
      catch { case _: ConcurrentWriteException => true }
    require(aborted, "stale full-table overwrite must conflict")

    store.read("orders_mw")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("o_orderstatus") === "X", 1).otherwise(0))
          .cast("long").as("n_flagged"),
        sum(col("o_orderkey")).cast("long").as("key_sum"))
      .orderBy(col("o_orderpriority"))
  }

  /** GIF87a decode through REAL variable-width LZW — the second
    * compressed family next to PNG's DEFLATE (dictionary coding vs
    * LZ77+Huffman). Per-document GIFs are synthesized with a formulaic
    * 64-color palette, decoded back through
    * [[graft.operators.MediaCodec.decodeGif]], and the oracle replays
    * palette + index formulas over generate_series — a slip in the
    * LSB-first bit unpacking, code-width growth, dictionary reset, or
    * palette resolution hash-fails.
    */
  val mm_gif_decode = OpQuery(
    "mm_gif_decode",
    """WITH g AS (
      |  SELECT doc_id,
      |         4 + CAST(doc_id % 13 AS INT) AS w,
      |         3 + CAST(doc_id % 7 AS INT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, (doc_id + 3 * x.x + 5 * y.y) % 64 AS i
      |  FROM g,
      |       LATERAL unnest(generate_series(0, w - 1)) AS x(x),
      |       LATERAL unnest(generate_series(0, h - 1)) AS y(y))
      |SELECT doc_id AS media_id,
      |       CAST(MAX(w) AS INT) AS width,
      |       CAST(MAX(h) AS INT) AS height,
      |       CAST(SUM((7 * i) % 256) AS BIGINT) AS sum_r,
      |       CAST(SUM((11 * i) % 256) AS BIGINT) AS sum_g,
      |       CAST(SUM((5 * i + 3) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id
      |ORDER BY media_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.MediaCodec
    val palette = Array.tabulate(64)(i =>
      (((7 * i) % 256) << 16) | (((11 * i) % 256) << 8) | ((5 * i + 3) % 256))
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val w = 4 + (d % 13).toInt
        val h = 3 + (d % 7).toInt
        (d, MediaCodec.encodeGif(w, h, palette,
          (x, y) => ((d + 3 * x + 5 * y) % 64).toInt))
      })
      .map { case (d, payload) =>
        val img = MediaCodec.decodeGif(payload) // the real LZW under test
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

  val all: Seq[OpQuery] = Seq(occ_disjoint_writers, mm_gif_decode)
}
