package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-4 batch 60: the SQL PIVOT / UNPIVOT clauses — same reshape
  * semantics as the DataFrame-API gates (p9/p10), different surface.
  */
object Round4Ops60 {

  /** SQL PIVOT clause: event counts fanned to one column per type. */
  val p23_pivot_sql = OpQuery(
    "p23_pivot_sql",
    """SELECT user_id % 10 AS cohort,
      |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
      |FROM events
      |GROUP BY user_id % 10
      |ORDER BY cohort""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_pv_events")
    spark.sql(
      """WITH base AS (
        |  SELECT user_id % 10 AS cohort, event_type FROM graft_pv_events)
        |SELECT cohort,
        |       CAST(coalesce(views, 0) AS BIGINT) AS views,
        |       CAST(coalesce(clicks, 0) AS BIGINT) AS clicks,
        |       CAST(coalesce(purchases, 0) AS BIGINT) AS purchases
        |FROM base
        |PIVOT (COUNT(*) FOR event_type IN ('view' AS views, 'click' AS clicks, 'purchase' AS purchases))
        |ORDER BY cohort""".stripMargin)
  }

  /** SQL UNPIVOT clause: the wide per-cohort table melted back to
    * (cohort, metric, value) rows.
    */
  val p22_unpivot_sql = OpQuery(
    "p22_unpivot_sql",
    """WITH wide AS (
      |  SELECT user_id % 10 AS cohort,
      |         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
      |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
      |  FROM events GROUP BY user_id % 10)
      |SELECT cohort, metric, CAST(v AS BIGINT) AS v
      |FROM (
      |  SELECT cohort, 'views' AS metric, views AS v FROM wide
      |  UNION ALL
      |  SELECT cohort, 'purchases' AS metric, purchases AS v FROM wide)
      |ORDER BY cohort, metric""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_upv_events")
    spark.sql(
      """WITH wide AS (
        |  SELECT user_id % 10 AS cohort,
        |         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
        |  FROM graft_upv_events GROUP BY user_id % 10)
        |SELECT cohort, metric, CAST(v AS BIGINT) AS v
        |FROM wide
        |UNPIVOT (v FOR metric IN (views, purchases))
        |ORDER BY cohort, metric""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(p23_pivot_sql, p22_unpivot_sql)
}
