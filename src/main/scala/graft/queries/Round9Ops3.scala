package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Round-9 batch 3: the one-pass Gram matrix — the 100 TB scan-count
  * fix for the PCA family. The deflated power walk reads the corpus
  * r·iterations times (36 scans for the top-3 gate shape);
  * [[Similarity.gramMatrixOnePass]] reads it ONCE, accumulating the
  * d(d+1)/2 upper triangle per partition and reducing the ≤ partitions
  * summaries pairwise. This gate pins the accumulation EXACTLY:
  * integer-quantized inputs make every product and partial sum an exact
  * integer below 2⁵³, so the one-pass result must equal the declarative
  * explode-join form bit-for-bit (in-gate REQUIRE) and hash-replay
  * against DuckDB's pair aggregation. The walk driven off G is pinned
  * against the multi-pass walk in PcaToprSpec.
  */
object Round9Ops3 {

  /** One-pass Gram vs the declarative pair-join, both over 2dp-quantized
    * embeddings (|q| ≤ ~few hundred, so G entries stay far below 2⁵³ and
    * the accumulation is order-independent exact integer math on BOTH
    * engines). Output is the one-pass operator's matrix as (j, k, g)
    * rows; the oracle recomputes it as DuckDB's exploded self-join.
    */
  val emb_gram_onepass: OpQuery = OpQuery(
    "emb_gram_onepass",
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[],
      |                        y -> CAST(ROUND(y * 100, 0) AS BIGINT)) AS q
      |  FROM embeddings),
      |x AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(q, 1) AS j, unnest(q) AS xj
      |  FROM e)
      |SELECT CAST(a.j - 1 AS INT) AS j, CAST(b.j - 1 AS INT) AS k,
      |       CAST(SUM(a.xj * b.xj) AS BIGINT) AS g
      |FROM x a JOIN x b USING (vec_id)
      |GROUP BY 1, 2
      |ORDER BY j, k""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val quantized = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          y => round(y * 100, 0)).as("qv"))
    // the one-pass operator under test (exact integer sums in double)
    val (g1, nRows) = Similarity.gramMatrixOnePass(quantized, "qv")
    require(nRows > 0, "embeddings table is empty")
    val dim = g1.length
    // exactness twin: the declarative explode-join form — the shape the
    // oracle replays. Deliberately quadratic in d (n·d² joined rows);
    // at scale only the one-pass operator runs, this form exists to
    // prove it exact.
    val xr = quantized
      .select(col("vec_id"),
        posexplode(col("qv")).as(Seq("j", "xj")))
    val g2 = xr.as("a").join(xr.as("b"), "vec_id")
      .groupBy(col("a.j").as("j"), col("b.j").as("k"))
      .agg(sum(col("a.xj") * col("b.xj")).cast("long").as("g"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    require(g2.size == dim * dim,
      s"declarative Gram has ${g2.size} entries, one-pass dim $dim")
    for (j <- 0 until dim; k <- 0 until dim) {
      val onePass = g1(j)(k)
      require(onePass == onePass.toLong.toDouble &&
          onePass.toLong == g2((j, k)),
        s"one-pass G($j,$k)=$onePass != declarative ${g2((j, k))}")
    }
    // output the ONE-PASS matrix — the oracle compares the operator
    // under test, not the twin (d² = 4096 rows, bounded by construction)
    val rows = for (j <- 0 until dim; k <- 0 until dim)
      yield (j, k, g1(j)(k).toLong)
    rows.toDF("j", "k", "g")
      .select(col("j").cast("int"), col("k").cast("int"), col("g"))
      .orderBy("j", "k")
  }

  /** End-to-end hash-reproducible PCA through the ONE-SCAN path: 1dp
    * integer quantization makes G exact (|q| ≤ ~40, so every product
    * and partial sum sits far below 2⁵³ even at sf0.1 row counts), and
    * the walk off G quantizes each G_jk·v_k contribution to 9dp and
    * sums in exact decimal — each contribution is ONE IEEE multiply
    * (bit-identical in any engine) of an exact integer by the current
    * iterate, so DuckDB replays the entire 8-iteration fixpoint from
    * its own pair-joined G. The companions: `emb_gram_onepass` pins the
    * G accumulation itself; `emb_pca_quantized` pins the same recipe on
    * the 36-scan distributed walk. Magnitude note: |q| ≤ ~40 and
    * ‖v‖ = 1 bound each contribution g·v_k by n·40² (8e5 at the
    * oracle's sf0.01, 8e6 at sf0.1), so ROUND(x, 9)'s ×1e9 scaling
    * stays below 2⁵³ (8e14 / 8e15 < 9.007e15) — the 1dp input
    * quantization (not 2dp) exists precisely for this headroom. Two
    * residual parity caveats shared by every ROUND-based oracle in this
    * suite, pinned empirically by the hash gate rather than provable:
    * a contribution landing tie-adjacent at the 9th decimal may round
    * differently (shortest-repr decimal vs binary scaling), and the
    * e1-start SQL walk has no probe-advance — data whose dimension 0 is
    * identically zero is outside the gate regime (the OPERATOR handles
    * it by advancing the start basis; the replay would NULL out).
    */
  val emb_pca_gram_quantized: OpQuery = {
    val iters = 8
    def step(name: String, vPrev: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT list(CAST(wd AS DOUBLE) ORDER BY j) AS w FROM (
         |    SELECT j,
         |           SUM(CAST(ROUND(g * (SELECT v FROM $vPrev)[k], 9)
         |             AS DECIMAL(38,9))) AS wd
         |    FROM gm GROUP BY j))""".stripMargin
    val base =
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id,
        |         list_transform(embedding::DOUBLE[],
        |                        y -> CAST(ROUND(y * 10, 0) AS BIGINT)) AS q
        |  FROM embeddings),
        |x AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(q, 1) AS j, unnest(q) AS xj
        |  FROM e),
        |gm AS MATERIALIZED (
        |  SELECT a.j AS j, b.j AS k, SUM(a.xj * b.xj) AS g
        |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        |d AS MATERIALIZED (SELECT MAX(j) AS n FROM gm),
        |v0 AS MATERIALIZED (SELECT list_transform(range(1, (SELECT n FROM d) + 1),
        |         i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
        |              ELSE CAST(0.0 AS DOUBLE) END) AS v)""".stripMargin
    val steps = (1 to iters).flatMap { i =>
      Seq(
        step(s"w$i", s"v${i - 1}"),
        s"""v$i AS MATERIALIZED (
           |  SELECT list_transform(w, y -> y / sqrt(list_dot_product(w, w))) AS v,
           |         sqrt(list_dot_product(w, w)) AS lambda
           |  FROM w$i)""".stripMargin)
    }
    val tail =
      Seq(step("wr", s"v$iters"),
        s"""diffs AS MATERIALIZED (
           |  SELECT list_transform(range(1, (SELECT n FROM d) + 1),
           |           i -> wr.w[i] - vv.lambda * vv.v[i]) AS dl,
           |         vv.lambda AS lambda
           |  FROM wr, v$iters vv)""".stripMargin,
        """res AS MATERIALIZED (
          |  SELECT sqrt(list_dot_product(dl, dl)) / lambda AS resid FROM diffs)""".stripMargin)
    val sql = (Seq(base) ++ steps ++ tail).mkString(",\n") +
      s"""
         |SELECT CAST(g.i - 1 AS INT) AS dim,
         |       CAST(ROUND(vv.v[CAST(g.i AS INT)], 6) AS DOUBLE) AS component,
         |       CAST(ROUND(vv.lambda, 3) AS DOUBLE) AS eigenvalue,
         |       (SELECT resid FROM res) < 0.05 AS converged
         |FROM v$iters vv,
         |     (SELECT unnest(range(1, (SELECT n FROM d) + 1)) AS i) g
         |ORDER BY dim""".stripMargin
    OpQuery("emb_pca_gram_quantized", sql) { (spark, dir) =>
      val quantized = Tables.load(spark, dir, "embeddings")
        .select(transform(col("embedding").cast("array<double>"),
          y => round(y * 10, 0)).as("qv"))
      val Seq((lambda, v, resid)) = graft.operators.Similarity
        .topPrincipalComponentsGram(quantized, "qv", r = 1,
          iterations = iters, quantizeDp = 9)
      import spark.implicits._
      v.zipWithIndex.toSeq.toDF("component", "dim")
        .select(
          col("dim").cast("int").as("dim"),
          round(col("component"), 6).as("component"),
          round(lit(lambda), 3).as("eigenvalue"),
          lit(resid < 0.05).as("converged"))
        .orderBy("dim")
    }
  }

  /** Pearson correlation matrix of all 64 embedding dimensions in ONE
    * corpus scan — the feature-correlation analysis a training pipeline
    * runs before whitening/pruning, off the same momentsOnePass core as
    * the Gram gate. Hash-exact by integer arithmetic: covariance
    * numerators n·G_jk − S_j·S_k are exact BIGINTs on both engines (no
    * division until the very end; n counts NON-NULL vectors on both
    * sides), and IEEE sqrt/divide on identical exact inputs are
    * correctly rounded, so the pre-round correlations are bit-identical
    * doubles — the final ROUND(·, 6) carries the suite's standard
    * tie-adjacent residual risk, pinned by the hash gate on this data.
    * Zero-variance dims emit NULL on both sides (NULLIF / NaN-to-null).
    */
  val emb_corr_matrix: OpQuery = OpQuery(
    "emb_corr_matrix",
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[],
      |                        y -> CAST(ROUND(y * 10, 0) AS BIGINT)) AS q
      |  FROM embeddings),
      |x AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(q, 1) AS j, unnest(q) AS xj
      |  FROM e),
      |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM e WHERE q IS NOT NULL),
      |s AS MATERIALIZED (SELECT j, SUM(xj) AS sx FROM x GROUP BY j),
      |gm AS MATERIALIZED (
      |  SELECT a.j AS j, b.j AS k, SUM(a.xj * b.xj) AS g
      |  FROM x a JOIN x b USING (vec_id)
      |  WHERE a.j <= b.j
      |  GROUP BY 1, 2),
      |c AS MATERIALIZED (
      |  SELECT gm.j, gm.k,
      |         CAST((SELECT n FROM nn) * gm.g - sj.sx * sk.sx AS DOUBLE) AS cn
      |  FROM gm
      |  JOIN s sj ON sj.j = gm.j
      |  JOIN s sk ON sk.j = gm.k),
      |d AS MATERIALIZED (SELECT j, sqrt(cn) AS sd FROM c WHERE j = k)
      |SELECT CAST(c.j - 1 AS INT) AS j, CAST(c.k - 1 AS INT) AS k,
      |       CAST(ROUND(c.cn / NULLIF(dj.sd * dk.sd, 0), 6) AS DOUBLE) AS corr
      |FROM c
      |JOIN d dj ON dj.j = c.j
      |JOIN d dk ON dk.j = c.k
      |WHERE c.j < c.k
      |ORDER BY j, k""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val quantized = Tables.load(spark, dir, "embeddings")
      .select(transform(col("embedding").cast("array<double>"),
        y => round(y * 10, 0)).as("qv"))
    val (corr, nRows) = Similarity.correlationMatrixOnePass(quantized, "qv")
    require(nRows > 0, "embeddings table is empty")
    val dim = corr.length
    // upper triangle (diagonal is identically 1); NaN (zero-variance
    // dim) → NULL, mirroring the oracle's NULLIF. d² bounded rows.
    val rows = for (j <- 0 until dim; k <- (j + 1) until dim)
      yield (j, k,
        if (corr(j)(k).isNaN) None else Some(corr(j)(k)))
    rows.toDF("j", "k", "corr_raw")
      .select(col("j").cast("int"), col("k").cast("int"),
        round(col("corr_raw"), 6).as("corr"))
      .orderBy("j", "k")
  }

  val all: Seq[OpQuery] =
    Seq(emb_gram_onepass, emb_pca_gram_quantized, emb_corr_matrix)
}
