package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 100: one-way ANOVA, weight-of-evidence / information
  * value scorecard binning, and the centroid-simplified silhouette
  * score for embedding cluster quality.
  */
object Round4Ops100 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** One-way ANOVA across the five order priorities on order totals:
    * F statistic and eta² from per-group exact DECIMAL sum/sum-of-squares
    * — one grouped pass plus a 5-row reduction, the same
    * sufficient-statistics discipline as a77_cohens_d (never a second
    * scan for the grand mean).
    */
  val a80_anova = OpQuery(
    "a80_anova",
    """WITH g AS (
      |  SELECT o_orderpriority,
      |         COUNT(*) AS n,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2)) *
      |             CAST(o_totalprice AS DECIMAL(18,2))) AS s2
      |  FROM orders GROUP BY 1
      |), parts AS (
      |  SELECT COUNT(*) AS k, SUM(n) AS nn,
      |         SUM(CAST(s1 AS DOUBLE)) AS ts1,
      |         SUM(CAST(s2 AS DOUBLE)) AS ts2,
      |         SUM(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) AS sq
      |  FROM g
      |)
      |SELECT CAST(k AS INT) AS k, CAST(nn AS BIGINT) AS n,
      |       CAST(ROUND((sq - ts1 * ts1 / nn) / (k - 1) /
      |            ((ts2 - sq) / (nn - k)), 6) AS DOUBLE) AS f,
      |       CAST(ROUND((sq - ts1 * ts1 / nn) /
      |            (ts2 - ts1 * ts1 / nn), 6) AS DOUBLE) AS eta_sq
      |FROM parts""".stripMargin) { (spark, dir) =>
    val v = col("o_totalprice").cast("decimal(18,2)")
    val g = t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
    val parts = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s1").cast("double")).as("ts1"),
      sum(col("s2").cast("double")).as("ts2"),
      sum(col("s1").cast("double") * col("s1").cast("double") / col("n"))
        .as("sq"))
    val k = col("k"); val nn = col("nn")
    val ssb = col("sq") - col("ts1") * col("ts1") / nn
    val ssw = col("ts2") - col("sq")
    val sst = col("ts2") - col("ts1") * col("ts1") / nn
    parts.select(k.cast("int").as("k"), nn.cast("long").as("n"),
      round(ssb / (k - 1) / (ssw / (nn - k)), 6).cast("double").as("f"),
      round(ssb / sst, 6).cast("double").as("eta_sq"))
  }

  /** Weight-of-evidence / information-value scorecard: market segment as
    * the predictor bin, "high-value order" (> 150k) as the target. WoE
    * per bin plus the shared total IV (a windowed sum over the 5-row bin
    * table — the fact scan happens once). The credit-scoring feature
    * screen at lakehouse scale: one join, one groupBy, tiny tail.
    */
  val ml_woe_iv = OpQuery(
    "ml_woe_iv",
    """WITH j AS (
      |  SELECT c.c_mktsegment AS seg,
      |         CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS pos
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |), b AS (
      |  SELECT seg, COUNT(*) AS n, SUM(pos) AS ng, SUM(1 - pos) AS nb
      |  FROM j GROUP BY 1
      |), tt AS (SELECT SUM(ng) AS tg, SUM(nb) AS tb FROM b)
      |SELECT seg, CAST(n AS BIGINT) AS n,
      |       CAST(ng AS BIGINT) AS n_good, CAST(nb AS BIGINT) AS n_bad,
      |       CAST(ROUND(LN((ng * 1.0 / tg) / (nb * 1.0 / tb)), 6) AS DOUBLE)
      |         AS woe,
      |       CAST(ROUND(SUM((ng * 1.0 / tg - nb * 1.0 / tb) *
      |            LN((ng * 1.0 / tg) / (nb * 1.0 / tb))) OVER (), 6) AS DOUBLE)
      |         AS iv
      |FROM b CROSS JOIN tt ORDER BY seg""".stripMargin) { (spark, dir) =>
    val j = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        when(col("o_totalprice") > 150000, 1).otherwise(0).as("pos"))
    val b = j.groupBy("seg").agg(count(lit(1)).as("n"),
      sum(col("pos")).as("ng"), sum(lit(1) - col("pos")).as("nb"))
    val tt = b.agg(sum(col("ng")).as("tg"), sum(col("nb")).as("tb"))
    val gShare = col("ng") * lit(1.0) / col("tg")
    val bShare = col("nb") * lit(1.0) / col("tb")
    val woe = log(gShare / bShare)
    b.crossJoin(tt).select(col("seg"), col("n").cast("long").as("n"),
        col("ng").cast("long").as("n_good"), col("nb").cast("long").as("n_bad"),
        round(woe, 6).cast("double").as("woe"),
        round(sum((gShare - bShare) * woe)
          .over(Window.partitionBy()), 6).cast("double").as("iv"))
      .orderBy("seg")
  }

  /** Centroid-simplified silhouette per embedding label: a = distance to
    * the own-label centroid, b = min distance to any other centroid,
    * s = (b−a)/max(a,b). The full silhouette is O(n²); the centroid
    * variant is O(n·k) — distances come from ‖v‖², v·c, ‖c‖² so the
    * vector table is scanned once and the k-row centroid table is
    * broadcast. Per-vector s is rounded to 9 digits before the label
    * mean so float-sum ordering can't leak into the 6-digit gate.
    */
  val sim_silhouette = OpQuery(
    "sim_silhouette",
    """WITH e AS (
      |  SELECT vec_id, label, CAST(v AS DOUBLE) AS v, i
      |  FROM (SELECT vec_id, label, unnest(embedding) AS v,
      |               unnest(generate_series(1, len(embedding))) AS i
      |        FROM embeddings)
      |), c AS (
      |  SELECT label AS clabel, i, AVG(v) AS cv FROM e GROUP BY 1, 2
      |), vn AS (
      |  SELECT vec_id, label, SUM(v * v) AS v2 FROM e GROUP BY 1, 2
      |), cn AS (
      |  SELECT clabel, SUM(cv * cv) AS c2 FROM c GROUP BY 1
      |), d AS (
      |  SELECT e.vec_id, e.label, c.clabel,
      |         SQRT(GREATEST(0.0, ANY_VALUE(vn.v2)
      |              - 2 * SUM(e.v * c.cv) + ANY_VALUE(cn.c2))) AS dist
      |  FROM e JOIN c ON e.i = c.i
      |  JOIN vn ON e.vec_id = vn.vec_id
      |  JOIN cn ON c.clabel = cn.clabel
      |  GROUP BY e.vec_id, e.label, c.clabel
      |), s AS (
      |  SELECT vec_id, label,
      |         MAX(CASE WHEN clabel = label THEN dist END) AS a,
      |         MIN(CASE WHEN clabel <> label THEN dist END) AS b
      |  FROM d GROUP BY 1, 2
      |)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(ROUND(AVG(ROUND((b - a) / GREATEST(a, b), 9)), 6) AS DOUBLE)
      |         AS mean_silhouette
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val emb = t(spark, dir, "embeddings")
    val e = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i0", "vf")))
      .select(col("vec_id"), col("label"), (col("i0") + 1).as("i"),
        col("vf").cast("double").as("v"))
    val c = e.groupBy(col("label").as("clabel"), col("i"))
      .agg(avg(col("v")).as("cv"))
    val vn = e.groupBy("vec_id", "label").agg(sum(col("v") * col("v")).as("v2"))
    val cn = c.groupBy("clabel").agg(sum(col("cv") * col("cv")).as("c2"))
    val d = e.join(c, "i")
      .join(vn, Seq("vec_id", "label"))
      .join(cn, "clabel")
      .groupBy("vec_id", "label", "clabel")
      .agg(sqrt(greatest(lit(0.0),
        first(col("v2")) - lit(2) * sum(col("v") * col("cv")) +
          first(col("c2")))).as("dist"))
    val s = d.groupBy("vec_id", "label").agg(
      max(when(col("clabel") === col("label"), col("dist"))).as("a"),
      min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
    s.groupBy("label").agg(
        count(lit(1)).as("n"),
        round(avg(round((col("b") - col("a")) / greatest(col("a"), col("b")), 9)),
          6).cast("double").as("mean_silhouette"))
      .orderBy("label")
  }

  val all: Seq[OpQuery] = Seq(a80_anova, ml_woe_iv, sim_silhouette)
}
