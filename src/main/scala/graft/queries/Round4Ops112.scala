package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 112: dominant-eigenvector PCA by unrolled power
  * iteration, local clustering coefficients on the co-supply graph,
  * and the Chao1 species-richness estimator.
  */
object Round4Ops112 {

  private val ccSql: String =
    """WITH eligible AS (
      |  SELECT l_partkey FROM (
      |    SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS ns
      |    FROM lineitem GROUP BY l_partkey) t
      |  ORDER BY ns, l_partkey LIMIT 200),
      |edges AS (
      |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a
      |  JOIN eligible e ON a.l_partkey = e.l_partkey
      |  JOIN lineitem b ON a.l_partkey = b.l_partkey
      |  WHERE a.l_suppkey < b.l_suppkey),
      |deg AS (
      |  SELECT k, COUNT(*) AS d FROM (
      |    SELECT u AS k FROM edges UNION ALL SELECT v AS k FROM edges) t
      |  GROUP BY k),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM edges e1
      |  JOIN edges e2 ON e2.u = e1.v
      |  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      |tcount AS (
      |  SELECT k, COUNT(*) AS t FROM (
      |    SELECT a AS k FROM tri UNION ALL SELECT b AS k FROM tri
      |    UNION ALL SELECT c AS k FROM tri) x
      |  GROUP BY k)
      |SELECT deg.k AS suppkey, CAST(deg.d AS BIGINT) AS degree,
      |       CAST(COALESCE(tcount.t, 0) AS BIGINT) AS triangles,
      |       CAST(ROUND(CAST(2 AS DOUBLE) * COALESCE(tcount.t, 0)
      |         / (deg.d * (deg.d - 1)), 6) AS DOUBLE) AS clustering_coeff
      |FROM deg LEFT JOIN tcount ON tcount.k = deg.k
      |WHERE deg.d >= 2
      |ORDER BY clustering_coeff DESC, suppkey
      |LIMIT 20""".stripMargin

  private val pcaSql: String =
    """WITH f AS (
      |  SELECT CAST(l_quantity AS DECIMAL(18,6)) AS x,
      |         CAST(l_extendedprice / 1000 AS DECIMAL(18,6)) AS y,
      |         CAST(l_discount * 100 AS DECIMAL(18,6)) AS z
      |  FROM lineitem),
      |s AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
      |         SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
      |         SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
      |         SUM(CAST(x * z AS DECIMAL(38,12))) AS sxz,
      |         SUM(CAST(y * y AS DECIMAL(38,12))) AS syy,
      |         SUM(CAST(y * z AS DECIMAL(38,12))) AS syz,
      |         SUM(CAST(z * z AS DECIMAL(38,12))) AS szz
      |  FROM f),
      |c AS (
      |  SELECT n,
      |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS c11,
      |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS c12,
      |    (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n) / (n - 1) AS c13,
      |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS c22,
      |    (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n) / (n - 1) AS c23,
      |    (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n) / (n - 1) AS c33
      |  FROM s),
      |i1 AS (
      |  SELECT n, c11, c12, c13, c22, c23, c33,
      |         c11 + c12 + c13 AS w1, c12 + c22 + c23 AS w2,
      |         c13 + c23 + c33 AS w3
      |  FROM c),
      |v1 AS (
      |  SELECT *, w1 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a1,
      |         w2 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a2,
      |         w3 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a3
      |  FROM i1),
      |i2 AS (
      |  SELECT n, c11, c12, c13, c22, c23, c33,
      |         c11 * a1 + c12 * a2 + c13 * a3 AS w1,
      |         c12 * a1 + c22 * a2 + c23 * a3 AS w2,
      |         c13 * a1 + c23 * a2 + c33 * a3 AS w3
      |  FROM v1),
      |v2 AS (
      |  SELECT *, w1 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a1,
      |         w2 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a2,
      |         w3 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a3
      |  FROM i2),
      |i3 AS (
      |  SELECT n, c11, c12, c13, c22, c23, c33,
      |         c11 * a1 + c12 * a2 + c13 * a3 AS w1,
      |         c12 * a1 + c22 * a2 + c23 * a3 AS w2,
      |         c13 * a1 + c23 * a2 + c33 * a3 AS w3
      |  FROM v2),
      |v3 AS (
      |  SELECT *, w1 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a1,
      |         w2 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a2,
      |         w3 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a3
      |  FROM i3),
      |i4 AS (
      |  SELECT n, c11, c12, c13, c22, c23, c33,
      |         c11 * a1 + c12 * a2 + c13 * a3 AS w1,
      |         c12 * a1 + c22 * a2 + c23 * a3 AS w2,
      |         c13 * a1 + c23 * a2 + c33 * a3 AS w3
      |  FROM v3),
      |v4 AS (
      |  SELECT n, c11, c12, c13, c22, c23, c33,
      |         w1 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a1,
      |         w2 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a2,
      |         w3 / SQRT(w1 * w1 + w2 * w2 + w3 * w3) AS a3
      |  FROM i4),
      |fin AS (
      |  SELECT n,
      |         CASE WHEN a1 < 0 THEN -a1 ELSE a1 END AS e1,
      |         CASE WHEN a1 < 0 THEN -a2 ELSE a2 END AS e2,
      |         CASE WHEN a1 < 0 THEN -a3 ELSE a3 END AS e3,
      |         a1 * (c11 * a1 + c12 * a2 + c13 * a3)
      |         + a2 * (c12 * a1 + c22 * a2 + c23 * a3)
      |         + a3 * (c13 * a1 + c23 * a2 + c33 * a3) AS lam
      |  FROM v4)
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(ROUND(lam, 6) AS DOUBLE) AS eigenvalue,
      |       CAST(ROUND(e1, 6) AS DOUBLE) AS v_quantity,
      |       CAST(ROUND(e2, 6) AS DOUBLE) AS v_price,
      |       CAST(ROUND(e3, 6) AS DOUBLE) AS v_discount
      |FROM fin""".stripMargin

  /** First principal component of three lineitem features (quantity,
    * price/1000, discount×100) by FOUR unrolled power-iteration steps
    * on the 3×3 covariance matrix. The covariance comes from EXACT
    * DECIMAL cross-product sums — the only data-sized pass — and the
    * iteration is a fixed scalar op sequence on one row, so the result
    * is bit-identical on any engine. Sign pinned by forcing v₁ ≥ 0.
    */
  val ml_pca_power = OpQuery(
    "ml_pca_power",
    pcaSql) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("graft_pca_li")
    spark.sql(pcaSql.replace("FROM lineitem", "FROM graft_pca_li"))
  }

  /** Local clustering coefficient on the bounded supplier co-supply
    * graph (suppliers sharing one of the 200 least-supplied parts):
    * per-node degree, per-node triangle count via the ordered three-way
    * edge self-join, coefficient = 2T/(k(k−1)). Top 20 by coefficient.
    * The ordered-edge convention makes each triangle counted once per
    * corner with no double counting.
    */
  val graph_clustering_coeff = OpQuery(
    "graph_clustering_coeff",
    ccSql) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("graft_cc_li")
    spark.sql(ccSql.replace("lineitem", "graft_cc_li"))
  }

  /** Chao1 species-richness estimator on the part "species" observed in
    * lineitem: S_obs plus the f₁²-style correction from singleton and
    * doubleton counts (bias-corrected form, defined even when f₂ = 0),
    * with Good's coverage estimate 1 − f₁/N. One count-per-species
    * aggregate and one 3-number reduce.
    */
  val a89_chao1 = OpQuery(
    "a89_chao1",
    """WITH sp AS (
      |  SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey),
      |m AS (
      |  SELECT COUNT(*) AS s_obs,
      |         SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
      |         SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2,
      |         SUM(c) AS n
      |  FROM sp)
      |SELECT CAST(s_obs AS BIGINT) AS s_obs, CAST(f1 AS BIGINT) AS f1,
      |       CAST(f2 AS BIGINT) AS f2, CAST(n AS BIGINT) AS n,
      |       CAST(ROUND(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2 * (f2 + 1)), 4)
      |         AS DOUBLE) AS chao1,
      |       CAST(ROUND(1 - CAST(f1 AS DOUBLE) / n, 6) AS DOUBLE) AS coverage
      |FROM m""".stripMargin) { (spark, dir) =>
    val m = Tables.load(spark, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("c") === 1, 1).otherwise(0)).as("f1"),
        sum(when(col("c") === 2, 1).otherwise(0)).as("f2"),
        sum(col("c")).as("n"))
    m.select(col("s_obs").cast("long").as("s_obs"), col("f1").cast("long").as("f1"),
      col("f2").cast("long").as("f2"), col("n").cast("long").as("n"),
      round(col("s_obs") + col("f1").cast("double") * (col("f1") - 1) /
        (lit(2) * (col("f2") + 1)), 4).cast("double").as("chao1"),
      round(lit(1) - col("f1").cast("double") / col("n"), 6)
        .cast("double").as("coverage"))
  }

  val all: Seq[OpQuery] = Seq(ml_pca_power, graph_clustering_coeff, a89_chao1)
}
