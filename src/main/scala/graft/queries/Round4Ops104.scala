package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.VectorExprs

/** Round-4 batch 104: the DeLong AUC standard error / confidence
  * interval, and Maximal Marginal Relevance diversified retrieval.
  */
object Round4Ops104 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** DeLong AUC variance via the fast midrank formulation: each
    * positive's placement value V10 = (#negatives below)/n_neg falls out
    * of two ROW_NUMBERs (combined rank − within-class rank), so the
    * whole O(mn) pairwise ψ-matrix collapses into one sort. SE and the
    * 95% Wald interval come from the placement-value variances — the
    * standard answer to "is this AUC significantly better than 0.5".
    */
  val ml_delong_auc = OpQuery(
    "ml_delong_auc",
    """WITH scored AS (
      |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
      |         CAST(label % 2 AS INT) AS y
      |  FROM embeddings
      |), ranked AS (
      |  SELECT y, ROW_NUMBER() OVER (ORDER BY score, vec_id) AS r,
      |         ROW_NUMBER() OVER (PARTITION BY y ORDER BY score, vec_id) AS rg
      |  FROM scored
      |), m AS (
      |  SELECT SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
      |         SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
      |  FROM ranked
      |), v10 AS (
      |  SELECT CAST(r - rg AS DOUBLE) / nn AS v FROM ranked CROSS JOIN m WHERE y = 1
      |), v01 AS (
      |  SELECT CAST(r - rg AS DOUBLE) / np AS v FROM ranked CROSS JOIN m WHERE y = 0
      |), a10 AS (SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2 FROM v10),
      |a01 AS (SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2 FROM v01)
      |SELECT CAST(a10.n AS BIGINT) AS n_pos, CAST(a01.n AS BIGINT) AS n_neg,
      |       CAST(ROUND(a10.s1 / a10.n, 6) AS DOUBLE) AS auc,
      |       CAST(ROUND(SQRT(
      |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
      |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
      |         AS DOUBLE) AS se,
      |       CAST(ROUND(a10.s1 / a10.n - 1.96 * SQRT(
      |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
      |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
      |         AS DOUBLE) AS ci_lo,
      |       CAST(ROUND(a10.s1 / a10.n + 1.96 * SQRT(
      |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
      |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
      |         AS DOUBLE) AS ci_hi
      |FROM a10 CROSS JOIN a01""".stripMargin) { (spark, dir) =>
    t(spark, dir, "embeddings").createOrReplaceTempView("graft_delong_emb")
    val scored = spark.sql(
      """SELECT vec_id, CAST(element_at(embedding, 1) AS DOUBLE) AS score,
        |       CAST(label % 2 AS INT) AS y
        |FROM graft_delong_emb""".stripMargin)
    // BOTH DeLong ranks from ONE TotalOrder range pass (winscan r9: the
    // global r and the PARTITION BY y rank were table-/class-sized
    // single-reducer windows): r is the distributed row number and the
    // inclusive prefix sum of y gives the within-class rank directly —
    // for a positive row rg = (# positives ≤ it) = cpos; for a negative
    // row rg = r − cpos. Bit-equal because the order (score, vec_id) is
    // total.
    graft.operators.TotalOrder
      .prefixAggs(scored, Seq(col("score"), col("vec_id")),
        sums = Seq("y" -> "cpos"), rnCol = Some("r"))
      .select(col("y"), col("r"),
        when(col("y") === 1, col("cpos")).otherwise(col("r") - col("cpos"))
          .cast("long").as("rg"))
      .createOrReplaceTempView("graft_delong_ranked")
    spark.sql(
      """WITH ranked AS (
        |  SELECT y, r, rg FROM graft_delong_ranked
        |), m AS (
        |  SELECT SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
        |         SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
        |  FROM ranked
        |), v10 AS (
        |  SELECT CAST(r - rg AS DOUBLE) / nn AS v FROM ranked CROSS JOIN m WHERE y = 1
        |), v01 AS (
        |  SELECT CAST(r - rg AS DOUBLE) / np AS v FROM ranked CROSS JOIN m WHERE y = 0
        |), a10 AS (SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2 FROM v10),
        |a01 AS (SELECT COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2 FROM v01)
        |SELECT CAST(a10.n AS BIGINT) AS n_pos, CAST(a01.n AS BIGINT) AS n_neg,
        |       CAST(ROUND(a10.s1 / a10.n, 6) AS DOUBLE) AS auc,
        |       CAST(ROUND(SQRT(
        |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
        |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
        |         AS DOUBLE) AS se,
        |       CAST(ROUND(a10.s1 / a10.n - 1.96 * SQRT(
        |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
        |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
        |         AS DOUBLE) AS ci_lo,
        |       CAST(ROUND(a10.s1 / a10.n + 1.96 * SQRT(
        |         (a10.s2 - a10.s1 * a10.s1 / a10.n) / (a10.n - 1) / a10.n +
        |         (a01.s2 - a01.s1 * a01.s1 / a01.n) / (a01.n - 1) / a01.n), 6)
        |         AS DOUBLE) AS ci_hi
        |FROM a10 CROSS JOIN a01""".stripMargin)
  }

  /** Maximal Marginal Relevance (λ=0.7, k=4) over the top-12 cosine
    * candidates for query vector 1: each greedy step scores the
    * remainder by λ·sim(q,d) − (1−λ)·max sim(d, selected) and takes the
    * deterministic argmax. All similarities are rounded to 9 digits
    * BEFORE any comparison so the greedy path is engine-stable; the
    * oracle unrolls the same 4 steps as chained CTEs. Candidate pruning
    * (top-12) bounds the pairwise block at 12×12 regardless of corpus
    * size — the re-rank stage of a two-stage retrieval pipeline.
    */
  val sim_mmr = OpQuery(
    "sim_mmr",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
      |base AS (
      |  SELECT e.vec_id,
      |         ROUND(list_dot_product(
      |             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
      |             list_transform(q.qe, x -> CAST(x AS DOUBLE))) /
      |           (SQRT(list_dot_product(
      |             list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
      |             list_transform(e.embedding, x -> CAST(x AS DOUBLE)))) *
      |            SQRT(list_dot_product(
      |             list_transform(q.qe, x -> CAST(x AS DOUBLE)),
      |             list_transform(q.qe, x -> CAST(x AS DOUBLE))))), 9) AS qs
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 1
      |), cand AS (
      |  SELECT vec_id, qs FROM (
      |    SELECT vec_id, qs, ROW_NUMBER() OVER (ORDER BY qs DESC, vec_id) AS rk
      |    FROM base) WHERE rk <= 12
      |), pw AS (
      |  SELECT x.vec_id AS a, y.vec_id AS b,
      |         ROUND(list_dot_product(
      |             list_transform(ex.embedding, v -> CAST(v AS DOUBLE)),
      |             list_transform(ey.embedding, v -> CAST(v AS DOUBLE))) /
      |           (SQRT(list_dot_product(
      |             list_transform(ex.embedding, v -> CAST(v AS DOUBLE)),
      |             list_transform(ex.embedding, v -> CAST(v AS DOUBLE)))) *
      |            SQRT(list_dot_product(
      |             list_transform(ey.embedding, v -> CAST(v AS DOUBLE)),
      |             list_transform(ey.embedding, v -> CAST(v AS DOUBLE))))), 9)
      |           AS sim
      |  FROM cand x JOIN embeddings ex ON ex.vec_id = x.vec_id
      |  CROSS JOIN cand y JOIN embeddings ey ON ey.vec_id = y.vec_id
      |  WHERE x.vec_id <> y.vec_id
      |), s1 AS (
      |  SELECT vec_id, ROUND(0.7 * qs, 9) AS sc FROM cand
      |  ORDER BY qs DESC, vec_id LIMIT 1
      |), r2 AS (
      |  SELECT c.vec_id, ROUND(0.7 * c.qs - 0.3 * MAX(p.sim), 9) AS sc
      |  FROM cand c JOIN pw p ON p.a = c.vec_id
      |    AND p.b IN (SELECT vec_id FROM s1)
      |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s1)
      |  GROUP BY c.vec_id, c.qs
      |), s2 AS (SELECT vec_id, sc FROM r2 ORDER BY sc DESC, vec_id LIMIT 1),
      |sel2 AS (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2),
      |r3 AS (
      |  SELECT c.vec_id, ROUND(0.7 * c.qs - 0.3 * MAX(p.sim), 9) AS sc
      |  FROM cand c JOIN pw p ON p.a = c.vec_id
      |    AND p.b IN (SELECT vec_id FROM sel2)
      |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
      |  GROUP BY c.vec_id, c.qs
      |), s3 AS (SELECT vec_id, sc FROM r3 ORDER BY sc DESC, vec_id LIMIT 1),
      |sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
      |r4 AS (
      |  SELECT c.vec_id, ROUND(0.7 * c.qs - 0.3 * MAX(p.sim), 9) AS sc
      |  FROM cand c JOIN pw p ON p.a = c.vec_id
      |    AND p.b IN (SELECT vec_id FROM sel3)
      |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
      |  GROUP BY c.vec_id, c.qs
      |), s4 AS (SELECT vec_id, sc FROM r4 ORDER BY sc DESC, vec_id LIMIT 1)
      |SELECT CAST(step AS INT) AS step, CAST(vec_id AS BIGINT) AS vec_id,
      |       CAST(ROUND(sc, 6) AS DOUBLE) AS mmr_score
      |FROM (
      |  SELECT 1 AS step, vec_id, sc FROM s1
      |  UNION ALL SELECT 2, vec_id, sc FROM s2
      |  UNION ALL SELECT 3, vec_id, sc FROM s3
      |  UNION ALL SELECT 4, vec_id, sc FROM s4
      |) ORDER BY step""".stripMargin) { (spark, dir) =>
    VectorExprs.register(spark)
    val emb = t(spark, dir, "embeddings")
    def cos(a: Column, b: Column): Column =
      VectorExprs.vecDot(a, b) /
        (sqrt(VectorExprs.vecDot(a, a)) * sqrt(VectorExprs.vecDot(b, b)))
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qe"))
    val base = emb.filter(col("vec_id") =!= 1).crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        round(cos(col("embedding"), col("qe")), 9).as("qs"))
    // Top-12 by score is a TakeOrderedAndProject (per-partition heaps +
    // driver merge), not a global row_number window over the embeddings.
    val cand = base
      .orderBy(col("qs").desc, col("vec_id")).limit(12)
      .localCheckpoint(true)
    val pw = cand.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(cand.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), round(cos(col("ea"), col("eb")), 9).as("sim"))
      .localCheckpoint(true)
    var selected = cand
      .orderBy(col("qs").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), round(col("qs") * 0.7, 9).as("sc"),
        lit(1).as("step"))
      .localCheckpoint(true)
    for (step <- 2 to 4) {
      val selIds = selected.select("vec_id")
      val maxSim = pw
        .join(selIds.withColumnRenamed("vec_id", "b"), Seq("b"), "left_semi")
        .groupBy(col("a").as("vec_id")).agg(max(col("sim")).as("msim"))
      val next = cand.join(selIds, Seq("vec_id"), "left_anti")
        .join(maxSim, "vec_id")
        .select(col("vec_id"),
          round(col("qs") * 0.7 - col("msim") * 0.3, 9).as("sc"),
          lit(step).as("step"))
        .orderBy(col("sc").desc, col("vec_id")).limit(1)
      selected = selected.unionByName(next).localCheckpoint(true)
    }
    selected.select(col("step").cast("int").as("step"),
        col("vec_id").cast("long").as("vec_id"),
        round(col("sc"), 6).cast("double").as("mmr_score"))
      .orderBy("step")
  }

  val all: Seq[OpQuery] = Seq(ml_delong_auc, sim_mmr)
}
