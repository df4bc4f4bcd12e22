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
    * pins what a pipeline does with them): every (1dp-quantized)
    * embedding projected onto the 3 components and scaled by 1/√λ,
    * giving energy-normalized coordinates (Σ_rows z_c² = 1 per
    * component, since λ is the second-moment eigenvalue — asserted in
    * PcaToprSpec). Components come from the DEFAULT width-dispatched
    * entry point, i.e. the ONE-SCAN Gram path at d = 64 (VERDICT r9
    * item 1 — this gate was one of the two suite maxima while it ran
    * the 36-scan walk; the whole extraction is now a single corpus
    * read). The oracle replays the identical arithmetic: the shared
    * [[GramWalkSql]] walk produces comp0..comp2, both engines round
    * components to 6 dp and λ to 3 dp BEFORE projecting (so the
    * projection inputs are decimal-exact across engines), and the
    * per-row dot product is 64 double multiply-adds in index order
    * over EXACT-integer quantized coordinates. At 100 TB this plan is
    * one corpus scan for G, then one broadcast of an r×dim matrix and
    * a map-side zip_with per row — no shuffle at all.
    */
  val emb_whiten: OpQuery = {
    val iters = 12
    val r = 3
    val projections = (0 until r).map { c =>
      s"""SELECT vec_id, CAST($c AS INT) AS comp_idx,
         |       CAST(ROUND(list_dot_product(
         |              list_transform(q, y -> CAST(y AS DOUBLE)),
         |              (SELECT list_transform(v, y -> ROUND(y, 6)) FROM comp$c)) /
         |            sqrt((SELECT CAST(ROUND(lambda, 3) AS DOUBLE) FROM comp$c)),
         |            6) AS DOUBLE) AS z
         |FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    val sql = GramWalkSql.walk(r, iters) +
      "\n" + projections + "\nORDER BY vec_id, comp_idx"
    OpQuery("emb_whiten", sql) { (spark, dir) =>
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            y => round(y * 10, 0)).as("qv"))
      val comps = graft.operators.Similarity.topPrincipalComponents(
        emb, "qv", r = r, iterations = iters, quantizeDp = 9)
      // quantize EXACTLY as the oracle does (Spark round() and DuckDB
      // ROUND both round half away from zero), so the projection inputs
      // are identical decimals on both engines
      def q(x: Double, dp: Int): Double =
        BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
      comps.zipWithIndex.map { case ((lambda, v, _), c) =>
        val vLit = typedLit(v.map(q(_, 6)).toSeq)
        val dot = aggregate(zip_with(col("qv"), vLit, (a, b) => a * b),
          lit(0.0), (acc, y) => acc + y)
        emb.select(
          col("vec_id"),
          lit(c).cast("int").as("comp_idx"),
          round(dot / math.sqrt(q(lambda, 3)), 6).cast("double").as("z"))
      }.reduce(_ unionByName _)
        .orderBy(col("vec_id"), col("comp_idx"))
    }
  }

  /** Harrell's C-index via [[graft.operators.Concordance]] — the
    * scalable EXACT path the bounded ground-truth gate
    * (`a93_harrell_cindex`, orderkey < 2000) points at: the cohort here
    * is a fixed FRACTION of lineitem (grows with sf; the 1/12 cohort —
    * 1/3 until round 12, trimmed per VERDICT r11 item 4 — still crosses
    * ~8M pairs at sf0.01 and ~1G at sf0.1), counted by the bucket-grid
    * decomposition instead of the O(n²) pair join. The oracle IS the
    * quadratic definition (DuckDB's IEJoin crunches the inequality
    * pair join directly), so the gate proves decomposition ≡ definition
    * on real data at a pair count no row-level Spark join should touch.
    */
  val a93_cindex_scalable = OpQuery(
    "a93_cindex_scalable",
    """WITH obs AS (
      |  SELECT CAST(FLOOR(epoch(l.l_shipdate) / 86400)
      |           - FLOOR(epoch(o.o_orderdate) / 86400) AS INT) AS dur,
      |         CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END AS ev,
      |         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS score
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_orderkey % 12 = 0),
      |pairs AS (
      |  SELECT a.score AS sa, b.score AS sb
      |  FROM obs a JOIN obs b ON a.dur < b.dur AND a.ev = 1),
      |m AS (
      |  SELECT COUNT(*) AS comparable,
      |         SUM(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS conc,
      |         SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS tied
      |  FROM pairs)
      |SELECT CAST(comparable AS BIGINT) AS comparable,
      |       CAST(conc AS BIGINT) AS concordant,
      |       CAST(tied AS BIGINT) AS tied,
      |       CAST(ROUND((conc + 0.5 * tied) / comparable, 6) AS DOUBLE)
      |         AS c_index
      |FROM m""".stripMargin) { (spark, dir) =>
    val obs = Tables.load(spark, dir, "lineitem").as("l")
      .join(Tables.load(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .filter(col("l.l_orderkey") % 12 === 0)
      .select(
        (floor(unix_timestamp(col("l.l_shipdate")) / 86400)
          - floor(unix_timestamp(col("o.o_orderdate")) / 86400)).cast("int").as("dur"),
        when(col("l.l_returnflag") === "R", 0).otherwise(1).as("ev"),
        col("l.l_extendedprice").cast("decimal(18,2)").as("score"))
    graft.operators.Concordance.counts(obs, "dur", "score",
        col("ev") === 1, buckets = 1024)
      .select(
        col("comparable"), col("concordant"), col("tied"),
        round((col("concordant") + lit(0.5) * col("tied")) / col("comparable"), 6)
          .cast("double").as("c_index"))
  }

  /** Kendall τ-b at scale from the same [[graft.operators.Concordance]]
    * machinery (`ts_mann_kendall` runs the pair join on a day-level
    * aggregate; this runs row-level over an sf-scaled cohort). One
    * Concordance pass with an open filter yields everything τ-b needs:
    * pairs with x_a < x_b split into discordant (y_a > y_b), y-tied,
    * and concordant (the remainder); x-tied pair counts come from a
    * groupBy on x; the denominators are the classical n0 − t_x / n0 −
    * t_y. Oracle: the direct quadratic definition (DuckDB IEJoin) plus
    * the same tie algebra.
    */
  val ts_kendall_scalable = OpQuery(
    "ts_kendall_scalable",
    """WITH obs AS (
      |  SELECT CAST(FLOOR(epoch(l.l_shipdate) / 86400)
      |           - FLOOR(epoch(o.o_orderdate) / 86400) AS INT) AS x,
      |         CAST(l.l_quantity AS INT) AS y
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_orderkey % 5 = 0),
      |p AS (
      |  SELECT COUNT(*) AS m,
      |         SUM(CASE WHEN a.y < b.y THEN 1 ELSE 0 END) AS conc,
      |         SUM(CASE WHEN a.y > b.y THEN 1 ELSE 0 END) AS disc,
      |         SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS ty_pairs
      |  FROM obs a JOIN obs b ON a.x < b.x),
      |n AS (SELECT COUNT(*) AS n FROM obs),
      |tx AS (
      |  SELECT COALESCE(SUM(c * (c - 1) / 2), 0) AS t
      |  FROM (SELECT COUNT(*) AS c FROM obs GROUP BY x)),
      |ty AS (
      |  SELECT COALESCE(SUM(c * (c - 1) / 2), 0) AS t
      |  FROM (SELECT COUNT(*) AS c FROM obs GROUP BY y))
      |SELECT CAST(p.conc AS BIGINT) AS concordant,
      |       CAST(p.disc AS BIGINT) AS discordant,
      |       CAST(p.ty_pairs AS BIGINT) AS tied_y_only,
      |       CAST(tx.t AS BIGINT) AS tied_x,
      |       CAST(ROUND((p.conc - p.disc) /
      |         (sqrt(n.n * (n.n - 1) / 2.0 - tx.t) *
      |          sqrt(n.n * (n.n - 1) / 2.0 - ty.t)), 6) AS DOUBLE) AS tau_b
      |FROM p, n, tx, ty""".stripMargin) { (spark, dir) =>
    val obs = Tables.load(spark, dir, "lineitem").as("l")
      .join(Tables.load(spark, dir, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .filter(col("l.l_orderkey") % 5 === 0)
      .select(
        (floor(unix_timestamp(col("l.l_shipdate")) / 86400)
          - floor(unix_timestamp(col("o.o_orderdate")) / 86400)).cast("int").as("x"),
        col("l.l_quantity").cast("int").as("y"))
      .localCheckpoint(false)
    val counts = graft.operators.Concordance.counts(
      obs, "x", "y", lit(true), buckets = 2048)
    def tiePairs(c: String) = obs.groupBy(c).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0.0))
        .cast("long").as(s"t_$c"))
    val n = obs.agg(count(lit(1)).as("n"))
    counts.crossJoin(n).crossJoin(tiePairs("x")).crossJoin(tiePairs("y"))
      .select(
        // Concordance's "concordant" is y_a > y_b — Kendall's DISCORDANT
        (col("comparable") - col("concordant") - col("tied")).as("concordant"),
        col("concordant").as("discordant"),
        col("tied").as("tied_y_only"),
        col("t_x").as("tied_x"),
        round((col("comparable") - col("concordant") * 2 - col("tied")) /
          (sqrt(col("n") * (col("n") - 1) / 2.0 - col("t_x")) *
            sqrt(col("n") * (col("n") - 1) / 2.0 - col("t_y"))), 6)
          .cast("double").as("tau_b"))
  }

  val all: Seq[OpQuery] = Seq(stream_ivm_refresh, emb_whiten,
    a93_cindex_scalable, ts_kendall_scalable)
}
