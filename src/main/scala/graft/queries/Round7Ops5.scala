package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Pq

/** Round-7 batch 5: product-quantization ANN ([[graft.operators.Pq]]).
  *
  * `sim_pq_adc_fixed` is the hash-green deterministic twin: embeddings
  * are quantized to integers (`round(x·256)`), the codebook comes from a
  * closed formula instead of k-means, so encode (argmin L2 per
  * subspace), the per-query LUTs, the ADC sums, and the top-k ranking
  * are ALL exact integer arithmetic that DuckDB replays end-to-end —
  * a slip in codebook layout, subspace slicing, tie-breaking, or LUT
  * indexing hash-fails. `sim_pq_topk` is the learned path (driver-side
  * Lloyd codebooks — not SQL-expressible); its recall against the exact
  * brute-force ranking and the encode/ADC algebra are pinned in PqSpec.
  */
object Round7Ops5 {

  private val M = 8
  private val K = 16
  private val SubDim = 8

  /** Formula codebook: c[s][j][t] = ((7s + 11j + 13t) mod 161) − 80,
    * flattened (s*k + j)*subDim + t — integer-valued doubles.
    */
  private def fixedCodebook: Pq.Codebook = {
    val flat = new Array[Double](K * M * SubDim)
    for (s <- 0 until M; j <- 0 until K; t <- 0 until SubDim)
      flat((s * K + j) * SubDim + t) = ((7 * s + 11 * j + 13 * t) % 161 - 80).toDouble
    Pq.Codebook(M, K, SubDim, flat)
  }

  val sim_pq_adc_fixed = OpQuery(
    "sim_pq_adc_fixed",
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings
      |), sub AS (
      |  SELECT vec_id, s.s AS s, j.j AS j,
      |         list_sum(list_transform(generate_series(0, 7), t ->
      |           (q[s.s * 8 + t + 1] - ((7 * s.s + 11 * j.j + 13 * t) % 161 - 80))
      |           * (q[s.s * 8 + t + 1] - ((7 * s.s + 11 * j.j + 13 * t) % 161 - 80)))) AS d
      |  FROM e,
      |       unnest(generate_series(0, 7)) AS s(s),
      |       unnest(generate_series(0, 15)) AS j(j)
      |), code AS (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM sub)
      |  WHERE rn = 1
      |), adc AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, SUM(qd.d) AS dist
      |  FROM (SELECT vec_id FROM e WHERE vec_id < 4) q
      |  JOIN code c ON c.vec_id <> q.vec_id
      |  JOIN sub qd ON qd.vec_id = q.vec_id AND qd.s = c.s AND qd.j = c.j
      |  GROUP BY q.vec_id, c.vec_id
      |)
      |SELECT query_id, CAST(rn AS INT) AS rank, corpus_id,
      |       CAST(dist AS BIGINT) AS adc
      |FROM (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |                           ORDER BY dist, corpus_id) AS rn
      |      FROM adc)
      |WHERE rn <= 10
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val cb = fixedCodebook
    val quant = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 256).cast("long")).as("qv"))
    val encoded = Pq.encode(quant, cb, idCol = "vec_id", vecCol = "qv")
    val queries = quant.filter(col("vec_id") < 4)
    Pq.adcTopK(encoded, queries, cb, topK = 10, idCol = "vec_id", vecCol = "qv")
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("adc").cast("long").as("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Learned PQ (driver-side Lloyd per subspace on the deterministic
    * id-ordered sample): rows-only gate; recall vs exact brute force and
    * the ADC/encode algebra are pinned in PqSpec.
    */
  val sim_pq_topk = OpQuery.noOracle("sim_pq_topk") { (spark, dir) =>
    import graft.expressions.VectorExprs
    VectorExprs.register(spark)
    val embs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), VectorExprs.vecUnit(col("embedding")).as("uv"))
    val cb = Pq.train(embs, m = 16, k = 64, iters = 5,
      idCol = "vec_id", vecCol = "uv")
    val encoded = Pq.encode(embs, cb, idCol = "vec_id", vecCol = "uv")
    val queries = embs.filter(col("vec_id") < 8)
    Pq.adcTopK(encoded, queries, cb, topK = 10, idCol = "vec_id", vecCol = "uv")
      .select(col("query_id"), col("rank"), col("corpus_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ADC shortlist + exact re-rank (the faiss refine shape) — rows-only;
    * PqSpec pins the reranked recall floor and that rerank can only
    * improve over raw ADC.
    */
  val sim_pq_rerank = OpQuery.noOracle("sim_pq_rerank") { (spark, dir) =>
    import graft.expressions.VectorExprs
    VectorExprs.register(spark)
    val embs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), VectorExprs.vecUnit(col("embedding")).as("uv"))
    val cb = Pq.train(embs, m = 16, k = 64, iters = 5,
      idCol = "vec_id", vecCol = "uv")
    val encoded = Pq.encode(embs, cb, idCol = "vec_id", vecCol = "uv")
    val queries = embs.filter(col("vec_id") < 8)
    Pq.adcTopKReranked(encoded, embs, queries, cb, topK = 10, shortlist = 50,
        idCol = "vec_id", vecCol = "uv")
      .select(col("query_id"), col("rank"), col("corpus_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Persisted IVF-PQ, full lifecycle, hash-green: integer-quantized
    * vectors + iters=0 quantizers make BOTH codebooks data-derived and
    * SQL-expressible — the coarse centroids are the first 16 quantized
    * embeddings (whole vectors), the PQ sub-codebooks their subvectors
    * (the [[graft.operators.Pq.train]] id-ordered init) — so cell
    * assignment (argmin integer L2), packed encode, LUTs, ADC sums, and
    * ranking are all exact arithmetic DuckDB replays. The index is
    * built, PERSISTED (packed binary codes in cell_id partitions),
    * reopened as a fresh handle, and served — persistence must be
    * invisible in the results, bit for bit.
    */
  val sim_pq_persisted = OpQuery(
    "sim_pq_persisted",
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings
      |), samp AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, q
      |  FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT 16)
      |), coarse_d AS (
      |  SELECT e.vec_id, s.j AS cell,
      |         list_sum(list_transform(generate_series(1, 64), i ->
      |           (e.q[i] - s.q[i]) * (e.q[i] - s.q[i]))) AS d
      |  FROM e, samp s
      |), assigned AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM coarse_d)
      |  WHERE rn = 1
      |), subd AS (
      |  SELECT e.vec_id, ss.s AS s, sj.j AS j,
      |         list_sum(list_transform(generate_series(1, 8), t ->
      |           (e.q[ss.s * 8 + t] - sj.q[ss.s * 8 + t])
      |           * (e.q[ss.s * 8 + t] - sj.q[ss.s * 8 + t]))) AS d
      |  FROM e, unnest(generate_series(0, 7)) AS ss(s), samp sj
      |), code AS (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM subd)
      |  WHERE rn = 1
      |), probes AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT vec_id, cell,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM coarse_d WHERE vec_id < 4)
      |  WHERE rn <= 3
      |), adc AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id, SUM(qd.d) AS dist
      |  FROM probes p
      |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
      |  JOIN code c ON c.vec_id = a.vec_id
      |  JOIN subd qd ON qd.vec_id = p.query_id AND qd.s = c.s AND qd.j = c.j
      |  GROUP BY p.query_id, a.vec_id
      |)
      |SELECT query_id, CAST(rn AS INT) AS rank, corpus_id,
      |       CAST(dist AS BIGINT) AS adc
      |FROM (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |                           ORDER BY dist, corpus_id) AS rn
      |      FROM adc)
      |WHERE rn <= 5
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    import graft.operators.{PqIndex, TableStore}
    val quant = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 256).cast("long")).as("qv"))
    val root = graft.queries.GateScratch.dir("graft-pqidx-").toString
    val store = new TableStore(spark, root)
    PqIndex.build(store, "embq", quant, numCells = 16, m = M, k = K,
      iters = 0, idCol = "vec_id", vecCol = "qv")
    // reopen from disk — nothing of the build survives but the tables
    val idx = PqIndex.open(store, "embq", idCol = "vec_id", vecCol = "qv")
    PqIndex.search(idx, quant.filter(col("vec_id") < 4), k = 5, nprobe = 3)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("adc").cast("long").as("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Residual IVF-PQ (faiss IVFPQ proper): codes quantize the residual
    * to the nearest coarse centroid, LUTs are cell-specific (query
    * residual vs the residual codebooks). Same exact-integer replay
    * trick as `sim_pq_persisted` — iters=0 makes the residual codebooks
    * data-derived (the first 16 RESIDUAL vectors' subvectors) and every
    * distance integer — so the whole two-level pipeline hash-matches.
    */
  val sim_pq_residual = OpQuery(
    "sim_pq_residual",
    """WITH e AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 256) AS BIGINT)) AS q
      |  FROM embeddings
      |), samp AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, q
      |  FROM (SELECT vec_id, q FROM e ORDER BY vec_id LIMIT 16)
      |), coarse_d AS (
      |  SELECT e.vec_id, s.j AS cell,
      |         list_sum(list_transform(generate_series(1, 64), i ->
      |           (e.q[i] - s.q[i]) * (e.q[i] - s.q[i]))) AS d
      |  FROM e, samp s
      |), assigned AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM coarse_d)
      |  WHERE rn = 1
      |), resid AS (
      |  SELECT e.vec_id, a.cell,
      |         list_transform(generate_series(1, 64), i -> e.q[i] - s.q[i]) AS r
      |  FROM e JOIN assigned a USING (vec_id) JOIN samp s ON s.j = a.cell
      |), rsamp AS (
      |  -- residual codebook seeds skip the coarse-seed rows (their
      |  -- residuals are zero): rows 16..31 in id order
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, r
      |  FROM (SELECT vec_id, r FROM resid ORDER BY vec_id LIMIT 16 OFFSET 16)
      |), subd AS (
      |  SELECT x.vec_id, ss.s AS s, sj.j AS j,
      |         list_sum(list_transform(generate_series(1, 8), t ->
      |           (x.r[ss.s * 8 + t] - sj.r[ss.s * 8 + t])
      |           * (x.r[ss.s * 8 + t] - sj.r[ss.s * 8 + t]))) AS d
      |  FROM resid x, unnest(generate_series(0, 7)) AS ss(s), rsamp sj
      |), code AS (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM subd)
      |  WHERE rn = 1
      |), probes AS (
      |  SELECT vec_id AS query_id, cell FROM (
      |    SELECT vec_id, cell,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
      |    FROM coarse_d WHERE vec_id < 4)
      |  WHERE rn <= 3
      |), qres AS (
      |  -- query residual AGAINST EACH PROBED CELL's centroid
      |  SELECT p.query_id, p.cell,
      |         list_transform(generate_series(1, 64), i -> e.q[i] - s.q[i]) AS qr
      |  FROM probes p JOIN e ON e.vec_id = p.query_id JOIN samp s ON s.j = p.cell
      |), qlut AS (
      |  SELECT q.query_id, q.cell, ss.s AS s, sj.j AS j,
      |         list_sum(list_transform(generate_series(1, 8), t ->
      |           (q.qr[ss.s * 8 + t] - sj.r[ss.s * 8 + t])
      |           * (q.qr[ss.s * 8 + t] - sj.r[ss.s * 8 + t]))) AS d
      |  FROM qres q, unnest(generate_series(0, 7)) AS ss(s), rsamp sj
      |), adc AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id, SUM(l.d) AS dist
      |  FROM probes p
      |  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
      |  JOIN code c ON c.vec_id = a.vec_id
      |  JOIN qlut l ON l.query_id = p.query_id AND l.cell = p.cell
      |             AND l.s = c.s AND l.j = c.j
      |  GROUP BY p.query_id, a.vec_id
      |)
      |SELECT query_id, CAST(rn AS INT) AS rank, corpus_id,
      |       CAST(dist AS BIGINT) AS adc
      |FROM (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY query_id
      |                           ORDER BY dist, corpus_id) AS rn
      |      FROM adc)
      |WHERE rn <= 5
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    import graft.operators.{PqIndex, TableStore}
    val quant = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 256).cast("long")).as("qv"))
    val root = graft.queries.GateScratch.dir("graft-pqres-").toString
    val store = new TableStore(spark, root)
    PqIndex.build(store, "embr", quant, numCells = 16, m = M, k = K,
      iters = 0, residual = true, idCol = "vec_id", vecCol = "qv")
    val idx = PqIndex.open(store, "embr", idCol = "vec_id", vecCol = "qv")
    PqIndex.search(idx, quant.filter(col("vec_id") < 4), k = 5, nprobe = 3)
      .select(col("query_id"), col("rank"), col("corpus_id"),
        col("adc").cast("long").as("adc"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[OpQuery] = Seq(sim_pq_adc_fixed, sim_pq_topk, sim_pq_rerank,
    sim_pq_persisted, sim_pq_residual)
}
