package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.VectorExprs

/** Round-4 batch 12: embedding outlier mining and engagement-ratio
  * metrics.
  */
object Round4Ops12 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Embedding outliers: members whose cosine to their LABEL CENTROID
    * falls below a threshold — mislabeled-example mining over labeled
    * embeddings. Same two-stage shape as emb_class_stats ((label, dim)
    * partial agg, centroids broadcast back); the oracle replays it with
    * unnest + parallel generate_series.
    */
  val emb_outliers = OpQuery(
    "emb_outliers",
    """WITH e AS (
      |  SELECT vec_id, label, unnest(embedding) AS v,
      |         unnest(generate_series(1, len(embedding))) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT label, i, AVG(CAST(v AS DOUBLE)) AS cv FROM e GROUP BY 1, 2
      |), cn AS (
      |  SELECT label, SQRT(SUM(cv * cv)) AS cnorm FROM c GROUP BY 1
      |), m AS (
      |  SELECT e.vec_id, e.label,
      |         SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot,
      |         SQRT(SUM(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE))) AS vnorm
      |  FROM e JOIN c ON e.label = c.label AND e.i = c.i
      |  GROUP BY 1, 2
      |)
      |SELECT m.vec_id, m.label,
      |       CAST(ROUND(m.dot / (m.vnorm * cn.cnorm), 6) AS DOUBLE) AS cos_to_centroid
      |FROM m JOIN cn ON m.label = cn.label
      |WHERE m.dot / (m.vnorm * cn.cnorm) < 0.1
      |ORDER BY m.vec_id""".stripMargin) { (spark, dir) =>
    VectorExprs.register(spark)
    val emb = t(spark, dir, "embeddings")
    val comps = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("__dim", "__v")))
      .groupBy(col("label"), col("__dim"))
      .agg(avg(col("__v").cast("double")).as("__c"))
    val centroids = comps.groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("__dim"), col("__c")))),
        s => s.getField("__c")).as("__centroid"))
    emb.join(broadcast(centroids), Seq("label"))
      .select(col("vec_id"), col("label"),
        VectorExprs.vecCosine(col("embedding"), col("__centroid")).as("__cos"))
      .filter(col("__cos") < 0.1)
      .select(col("vec_id"), col("label"),
        round(col("__cos"), 6).as("cos_to_centroid"))
      .orderBy(col("vec_id"))
  }

  /** Engagement ratios: daily active users, the 7-day-window active
    * count anchored at each day (distinct users over a RANGE frame is a
    * join against the day spine instead — windows cannot COUNT
    * DISTINCT), and the DAU/WAU stickiness ratio.
    */
  val event_dau_wau = OpQuery(
    "event_dau_wau",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, user_id FROM events GROUP BY 1, 2
      |), days AS (
      |  SELECT DISTINCT d FROM daily
      |), dau AS (
      |  SELECT d, COUNT(*) AS dau FROM daily GROUP BY d
      |), wau AS (
      |  SELECT days.d, COUNT(DISTINCT daily.user_id) AS wau
      |  FROM days JOIN daily
      |    ON daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      |  GROUP BY days.d
      |)
      |SELECT strftime(dau.d, '%Y-%m-%d') AS day,
      |       CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
      |       CAST(ROUND(dau * 1.0 / wau, 6) AS DOUBLE) AS stickiness
      |FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    val daily = t(spark, dir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val days = daily.select(col("d")).distinct()
    val dau = daily.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = days.as("w")
      .join(daily.as("a"),
        col("a.d").between(date_sub(col("w.d"), 6), col("w.d")))
      .groupBy(col("w.d").as("d"))
      .agg(countDistinct(col("a.user_id")).as("wau"))
    dau.join(wau, "d")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau") * 1.0 / col("wau"), 6).as("stickiness"))
      .orderBy(col("day"))
  }

  val all: Seq[OpQuery] = Seq(emb_outliers, event_dau_wau)
}
