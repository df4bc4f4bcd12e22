package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IncrementalAgg, TableStore}

/** Round-9 batch 2: streaming incremental view maintenance through the
  * REAL streaming path. The round-9 append CDC fast path
  * ([[TableStore.changes]]: an append-pure generation's delta is exactly
  * its added files, read directly) exists precisely for this composition:
  * a long-lived ingest stream appends micro-batches to a base table and
  * refreshes a maintained aggregate per batch at O(batch + view) cost,
  * never rescanning the base. This gate runs that loop end-to-end —
  * file-source stream, foreachBatch append + refresh, versioned store —
  * and the final view must equal DuckDB's direct full aggregation.
  */
object Round9Ops2 {

  /** Streaming IVM: events replayed as a 3-micro-batch file-source
    * stream; each batch appends to `base` (one generation per batch) and
    * refreshes `agg` from that generation's file-diff CDC. The oracle is
    * the direct GROUP BY over all events — the maintained view converges
    * to it exactly (DECIMAL(18,2) on both sides for sum-order parity).
    */
  val stream_ivm_refresh = OpQuery(
    "stream_ivm_refresh",
    """SELECT event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val scratch = graft.queries.GateScratch.dir("graft-sivm-").toString
    val store = new TableStore(spark, s"$scratch/store")
    // land the slice as 3 files; maxFilesPerTrigger=1 → one generation
    // appended per micro-batch, three refresh cycles over the fast path
    val landing = s"$scratch/in"
    ev.repartition(3).write.mode("overwrite").parquet(landing)
    // v0: empty base, empty view — the stream builds everything
    store.overwrite("base", ev.limit(0))
    store.overwrite("agg",
      IncrementalAgg.fullAggregate(store.read("base"), Seq("event_type"), "value"))
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val from = store.currentVersion("base")
        store.append("base", batch)
        IncrementalAgg.refresh(store, "agg", "base", from, from + 1,
          Seq("event_type"), "value")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$scratch/ckpt")
      .start()
    q.awaitTermination()
    store.read("agg")
      .select(col("event_type"), col("n_rows"),
        col("total_value").cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** PCA whitening of the embedding corpus — the actual downstream USE
    * of the top-r components (`emb_pca_topr` pins the vectors; this
    * pins what a pipeline does with them): every embedding projected
    * onto the 3 quantized components and scaled by 1/√λ, giving
    * energy-normalized coordinates (Σ_rows z_c² = 1 per component,
    * since λ is the second-moment eigenvalue — asserted in
    * PcaToprSpec). The oracle replays the identical arithmetic: the
    * shared [[PcaWalkSql]] walk produces comp0..comp2, both engines
    * round components to 6 dp and λ to 3 dp BEFORE projecting (so the
    * projection inputs are decimal-exact across engines), and the
    * per-row dot product is 64 double multiply-adds in index order.
    * At 100 TB this plan is one broadcast of an r×dim matrix and a
    * map-side zip_with per row — no shuffle at all after the
    * (one-off, driver-bounded) component extraction.
    */
  val emb_whiten: OpQuery = {
    val iters = 12
    val r = 3
    val projections = (0 until r).map { c =>
      s"""SELECT vec_id, CAST($c AS INT) AS comp_idx,
         |       CAST(ROUND(list_dot_product(x,
         |              (SELECT list_transform(v, y -> ROUND(y, 6)) FROM comp$c)) /
         |            sqrt((SELECT CAST(ROUND(lambda, 3) AS DOUBLE) FROM comp$c)),
         |            6) AS DOUBLE) AS z
         |FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    val sql = PcaWalkSql.walk(r, iters) +
      "\n" + projections + "\nORDER BY vec_id, comp_idx"
    OpQuery("emb_whiten", sql) { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
      val comps = graft.operators.Similarity.topPrincipalComponents(
        emb, "embedding", r = r, iterations = iters, quantizeDp = 9)
      // quantize EXACTLY as the oracle does (Spark round() and DuckDB
      // ROUND both round half away from zero), so the projection inputs
      // are identical decimals on both engines
      def q(x: Double, dp: Int): Double =
        BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
      val xd = transform(col("embedding"), e => e.cast("double"))
      comps.zipWithIndex.map { case ((lambda, v, _), c) =>
        val vLit = typedLit(v.map(q(_, 6)).toSeq)
        val dot = aggregate(zip_with(xd, vLit, (a, b) => a * b),
          lit(0.0), (acc, y) => acc + y)
        emb.select(
          col("vec_id"),
          lit(c).cast("int").as("comp_idx"),
          round(dot / math.sqrt(q(lambda, 3)), 6).cast("double").as("z"))
      }.reduce(_ unionByName _)
        .orderBy(col("vec_id"), col("comp_idx"))
    }
  }

  val all: Seq[OpQuery] = Seq(stream_ivm_refresh, emb_whiten)
}
