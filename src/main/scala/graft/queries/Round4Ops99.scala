package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 99: Cramér's V categorical association (with the
  * Bergsma bias correction), Cohen's d / Hedges' g effect size, and
  * Jaccard link prediction over the supplier–part bipartite graph.
  */
object Round4Ops99 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Cramér's V between order priority and order status — the effect
    * size the a41 chi-square test lacks: chi², dof, V, and the Bergsma
    * bias-corrected V. The contingency table is one groupBy; expected
    * counts come from a margins cross-join (5×3 rows, broadcast), so no
    * second pass over the fact table.
    */
  val a76_cramers_v = OpQuery(
    "a76_cramers_v",
    """WITH obs AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2
      |), tot AS (SELECT SUM(n) AS nn FROM obs),
      |ma AS (SELECT a, SUM(n) AS na FROM obs GROUP BY 1),
      |mb AS (SELECT b, SUM(n) AS nb FROM obs GROUP BY 1),
      |cells AS (
      |  SELECT ma.a, mb.b, COALESCE(obs.n, 0) AS n,
      |         CAST(ma.na AS DOUBLE) * mb.nb / tot.nn AS e
      |  FROM ma CROSS JOIN mb CROSS JOIN tot
      |  LEFT JOIN obs ON obs.a = ma.a AND obs.b = mb.b
      |), chi AS (
      |  SELECT SUM((n - e) * (n - e) / e) AS chi2 FROM cells
      |), dims AS (
      |  SELECT (SELECT COUNT(*) FROM ma) AS r, (SELECT COUNT(*) FROM mb) AS c
      |)
      |SELECT CAST(tot.nn AS BIGINT) AS n,
      |       CAST((dims.r - 1) * (dims.c - 1) AS INT) AS dof,
      |       CAST(ROUND(chi.chi2, 6) AS DOUBLE) AS chi2,
      |       CAST(ROUND(SQRT(chi.chi2 / (tot.nn *
      |            LEAST(dims.r - 1, dims.c - 1))), 6) AS DOUBLE) AS v,
      |       CAST(ROUND(SQRT(
      |         GREATEST(0.0, chi.chi2 / tot.nn -
      |           CAST((dims.r - 1) * (dims.c - 1) AS DOUBLE) / (tot.nn - 1)) /
      |         LEAST(dims.r - CAST((dims.r - 1) * (dims.r - 1) AS DOUBLE)
      |                 / (tot.nn - 1),
      |               dims.c - CAST((dims.c - 1) * (dims.c - 1) AS DOUBLE)
      |                 / (tot.nn - 1)) - 1.0 + 1.0), 6) AS DOUBLE) AS v_corrected
      |FROM chi CROSS JOIN tot CROSS JOIN dims""".stripMargin) { (spark, dir) =>
    val obs = t(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("a"), col("o_orderstatus").as("b"))
      .agg(count(lit(1)).as("n"))
    val tot = obs.agg(sum(col("n")).as("nn"))
    val ma = obs.groupBy("a").agg(sum(col("n")).as("na"))
    val mb = obs.groupBy("b").agg(sum(col("n")).as("nb"))
    val cells = ma.crossJoin(mb).crossJoin(tot)
      .join(obs, Seq("a", "b"), "left")
      .select(coalesce(col("n"), lit(0L)).as("n"),
        (col("na").cast("double") * col("nb") / col("nn")).as("e"))
    val chi = cells.agg(
      sum((col("n") - col("e")) * (col("n") - col("e")) / col("e")).as("chi2"))
    val dims = ma.agg(count(lit(1)).as("r"))
      .crossJoin(mb.agg(count(lit(1)).as("c")))
    val r = col("r"); val c = col("c"); val nn = col("nn")
    val phi2corr = greatest(lit(0.0),
      col("chi2") / nn - ((r - 1) * (c - 1)).cast("double") / (nn - 1))
    val denomCorr = least(
      r - ((r - 1) * (r - 1)).cast("double") / (nn - 1),
      c - ((c - 1) * (c - 1)).cast("double") / (nn - 1)) - lit(1.0) + lit(1.0)
    chi.crossJoin(tot).crossJoin(dims).select(
      nn.cast("long").as("n"),
      ((r - 1) * (c - 1)).cast("int").as("dof"),
      round(col("chi2"), 6).cast("double").as("chi2"),
      round(sqrt(col("chi2") / (nn * least(r - 1, c - 1))), 6)
        .cast("double").as("v"),
      round(sqrt(phi2corr / denomCorr), 6).cast("double").as("v_corrected"))
  }

  /** Cohen's d and Hedges' g between URGENT and LOW order totals: pooled
    * standard deviation from exact DECIMAL sum/sum-of-squares (one pass,
    * two groups), so the double math downstream is bit-deterministic.
    * The small-sample Hedges correction d·(1 − 3/(4N−9)) rides along.
    */
  val a77_cohens_d = OpQuery(
    "a77_cohens_d",
    """WITH s AS (
      |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS v
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |), g AS (
      |  SELECT grp, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2
      |  FROM s GROUP BY 1
      |), w AS (
      |  SELECT MAX(CASE WHEN grp = 1 THEN n END) AS n1,
      |         MAX(CASE WHEN grp = 0 THEN n END) AS n2,
      |         MAX(CASE WHEN grp = 1 THEN CAST(s1 AS DOUBLE) END) AS a1,
      |         MAX(CASE WHEN grp = 0 THEN CAST(s1 AS DOUBLE) END) AS a2,
      |         MAX(CASE WHEN grp = 1 THEN CAST(s2 AS DOUBLE) END) AS b1,
      |         MAX(CASE WHEN grp = 0 THEN CAST(s2 AS DOUBLE) END) AS b2
      |  FROM g
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST(ROUND(a1 / n1 - a2 / n2, 4) AS DOUBLE) AS mean_diff,
      |       CAST(ROUND(SQRT(((b1 - a1 * a1 / n1) + (b2 - a2 * a2 / n2))
      |            / (n1 + n2 - 2)), 4) AS DOUBLE) AS pooled_sd,
      |       CAST(ROUND((a1 / n1 - a2 / n2) /
      |            SQRT(((b1 - a1 * a1 / n1) + (b2 - a2 * a2 / n2))
      |                 / (n1 + n2 - 2)), 6) AS DOUBLE) AS d,
      |       CAST(ROUND((a1 / n1 - a2 / n2) /
      |            SQRT(((b1 - a1 * a1 / n1) + (b2 - a2 * a2 / n2))
      |                 / (n1 + n2 - 2))
      |            * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS DOUBLE)
      |         AS hedges_g
      |FROM w""".stripMargin) { (spark, dir) =>
    val s = t(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
        .as("grp"),
        col("o_totalprice").cast("decimal(18,2)").as("v"))
    val g = s.groupBy("grp").agg(count(lit(1)).as("n"),
      sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))
    val w = g.agg(
      max(when(col("grp") === 1, col("n"))).as("n1"),
      max(when(col("grp") === 0, col("n"))).as("n2"),
      max(when(col("grp") === 1, col("s1").cast("double"))).as("a1"),
      max(when(col("grp") === 0, col("s1").cast("double"))).as("a2"),
      max(when(col("grp") === 1, col("s2").cast("double"))).as("b1"),
      max(when(col("grp") === 0, col("s2").cast("double"))).as("b2"))
    val n1 = col("n1"); val n2 = col("n2")
    val meanDiff = col("a1") / n1 - col("a2") / n2
    val pooledSd = sqrt(((col("b1") - col("a1") * col("a1") / n1) +
      (col("b2") - col("a2") * col("a2") / n2)) / (n1 + n2 - 2))
    w.select(n1.cast("long").as("n1"), n2.cast("long").as("n2"),
      round(meanDiff, 4).cast("double").as("mean_diff"),
      round(pooledSd, 4).cast("double").as("pooled_sd"),
      round(meanDiff / pooledSd, 6).cast("double").as("d"),
      round(meanDiff / pooledSd *
        (lit(1.0) - lit(3.0) / (lit(4.0) * (n1 + n2) - lit(9.0))), 6)
        .cast("double").as("hedges_g"))
  }

  /** Jaccard link prediction on the supplier–part bipartite graph: the
    * 20 most-similar supplier pairs by |parts(a) ∩ parts(b)| /
    * |parts(a) ∪ parts(b)|. Common-neighbor counting is ONE self-join on
    * the part key (never supplier × supplier), so the intermediate is
    * Σ_p deg(p)² — bounded by part fan-out, not by the supplier count —
    * and the union size comes from the degree table, broadcast back onto
    * the pair aggregate.
    */
  val graph_jaccard = OpQuery(
    "graph_jaccard",
    """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      |deg AS (SELECT s, COUNT(*) AS d FROM sp GROUP BY 1),
      |pairs AS (
      |  SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common
      |  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
      |  GROUP BY 1, 2
      |)
      |SELECT s1, s2, CAST(common AS BIGINT) AS common,
      |       CAST(ROUND(common * 1.0 / (d1.d + d2.d - common), 6) AS DOUBLE)
      |         AS jaccard
      |FROM pairs JOIN deg d1 ON d1.s = s1 JOIN deg d2 ON d2.s = s2
      |ORDER BY jaccard DESC, s1, s2 LIMIT 20""".stripMargin) { (spark, dir) =>
    // sp is referenced 3x (deg + both self-join sides); without the
    // freeze each reference re-runs the scan+distinct — the before-plan
    // carries the subtree 3x (r13-opt: materialize shared subtrees,
    // guide §3.3). Lazy checkpoint: the first job populates the cache.
    val sp = t(spark, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)
    val deg = sp.groupBy("s").agg(count(lit(1)).as("d"))
    val pairs = sp.as("a")
      .join(sp.as("b"), col("a.p") === col("b.p") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("s").as("s1"), col("d").as("d1")), "s1")
      .join(deg.select(col("s").as("s2"), col("d").as("d2")), "s2")
      .select(col("s1"), col("s2"), col("common").cast("long").as("common"),
        round(col("common") * lit(1.0) / (col("d1") + col("d2") - col("common")), 6)
          .cast("double").as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1"), col("s2"))
      .limit(20)
  }

  val all: Seq[OpQuery] = Seq(a76_cramers_v, a77_cohens_d, graph_jaccard)
}
