package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 103: DAU/WAU stickiness, the Grubbs outlier statistic,
  * and the Theil–Sen robust trend estimator.
  */
object Round4Ops103 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Weekly stickiness: mean daily active users ÷ weekly active users
    * per ISO week (Monday truncation in both engines). The (day, user)
    * dedup happens once; DAU and WAU are two aggregations over it — the
    * engagement ratio product analytics watches weekly.
    */
  val event_stickiness = OpQuery(
    "event_stickiness",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id FROM events GROUP BY 1, 2
      |), daily AS (
      |  SELECT day, COUNT(*) AS dau FROM d GROUP BY 1
      |), weekly AS (
      |  SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
      |         COUNT(DISTINCT user_id) AS wau
      |  FROM d GROUP BY 1
      |), adau AS (
      |  SELECT CAST(date_trunc('week', day) AS DATE) AS wk,
      |         AVG(dau * 1.0) AS mean_dau, COUNT(*) AS n_days
      |  FROM daily GROUP BY 1
      |)
      |SELECT strftime(a.wk, '%Y-%m-%d') AS week_start,
      |       CAST(a.n_days AS BIGINT) AS n_days,
      |       CAST(ROUND(a.mean_dau, 6) AS DOUBLE) AS mean_dau,
      |       CAST(w.wau AS BIGINT) AS wau,
      |       CAST(ROUND(a.mean_dau / w.wau, 6) AS DOUBLE) AS stickiness
      |FROM adau a JOIN weekly w ON a.wk = w.wk
      |ORDER BY week_start""".stripMargin) { (spark, dir) =>
    val d = t(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val daily = d.groupBy("day").agg(count(lit(1)).as("dau"))
    val weekly = d.groupBy(date_trunc("week", col("day")).cast("date").as("wk"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val adau = daily
      .groupBy(date_trunc("week", col("day")).cast("date").as("wk"))
      .agg(avg(col("dau") * lit(1.0)).as("mean_dau"),
        count(lit(1)).as("n_days"))
    adau.join(weekly, "wk")
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week_start"),
        col("n_days").cast("long").as("n_days"),
        round(col("mean_dau"), 6).cast("double").as("mean_dau"),
        col("wau").cast("long").as("wau"),
        round(col("mean_dau") / col("wau"), 6).cast("double").as("stickiness"))
      .orderBy("week_start")
  }

  /** Grubbs outlier statistic per priority group: G = max|x−x̄|/s with
    * the achieving order key. Mean and sample SD come from exact DECIMAL
    * sufficient statistics (one grouped pass); the argmax is a
    * deterministic row_number over (|x−x̄| DESC, key) — no second scan,
    * no float accumulator ordering.
    */
  val a81_grubbs = OpQuery(
    "a81_grubbs",
    """WITH s AS (
      |  SELECT o_orderpriority AS pri, o_orderkey,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS v
      |  FROM orders
      |), g AS (
      |  SELECT pri, COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS s1,
      |         CAST(SUM(v * v) AS DOUBLE) AS s2
      |  FROM s GROUP BY 1
      |), st AS (
      |  SELECT pri, n, s1 / n AS mu,
      |         SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sd
      |  FROM g
      |), r AS (
      |  SELECT s.pri, st.n, s.o_orderkey,
      |         ABS(CAST(s.v AS DOUBLE) - st.mu) / st.sd AS gstat,
      |         ROW_NUMBER() OVER (PARTITION BY s.pri
      |             ORDER BY ABS(CAST(s.v AS DOUBLE) - st.mu) DESC, s.o_orderkey)
      |           AS rn
      |  FROM s JOIN st ON s.pri = st.pri
      |)
      |SELECT pri AS o_orderpriority, CAST(n AS BIGINT) AS n,
      |       o_orderkey AS outlier_key,
      |       CAST(ROUND(gstat, 6) AS DOUBLE) AS g
      |FROM r WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin) {
    (spark, dir) =>
    val s = t(spark, dir, "orders").select(
      col("o_orderpriority").as("pri"), col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").as("v"))
    val g = s.groupBy("pri").agg(count(lit(1)).as("n"),
      sum(col("v")).cast("double").as("s1"),
      sum(col("v") * col("v")).cast("double").as("s2"))
    val st = g.select(col("pri"), col("n"),
      (col("s1") / col("n")).as("mu"),
      sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
        .as("sd"))
    val dev = abs(col("v").cast("double") - col("mu"))
    val r = s.join(st, "pri").select(col("pri"), col("n"), col("o_orderkey"),
      (dev / col("sd")).as("gstat"),
      row_number().over(Window.partitionBy("pri")
        .orderBy(dev.desc, col("o_orderkey"))).as("rn"))
    r.filter(col("rn") === 1)
      .select(col("pri").as("o_orderpriority"), col("n").cast("long").as("n"),
        col("o_orderkey").as("outlier_key"),
        round(col("gstat"), 6).cast("double").as("g"))
      .orderBy("o_orderpriority")
  }

  /** Theil–Sen robust trend over the first-30-day daily revenue series:
    * the median of all C(30,2) pairwise slopes, then the median residual
    * intercept. Medians are picked by deterministic row_number (value +
    * index tiebreak) with the even-count two-middle average — never an
    * engine-specific MEDIAN(). Daily totals are exact integer cents, so
    * every slope is a bit-identical double. The all-pairs join is bounded
    * by the fixed 30-point window, not by table size.
    */
  val ts_theil_sen = OpQuery(
    "ts_theil_sen",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |         CAST(TRUNC(SUM(CAST(value AS DECIMAL(18,2))) * 100) AS BIGINT)
      |           AS vc
      |  FROM events GROUP BY 1
      |), idx AS (
      |  SELECT vc, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
      |), w AS (SELECT vc, i FROM idx WHERE i <= 30),
      |slopes AS (
      |  SELECT a.i AS i, b.i AS j, (b.vc - a.vc) * 1.0 / (b.i - a.i) AS m
      |  FROM w a JOIN w b ON b.i > a.i
      |), ms AS (
      |  SELECT m, ROW_NUMBER() OVER (ORDER BY m, i, j) AS rn,
      |         COUNT(*) OVER () AS cnt
      |  FROM slopes
      |), med AS (
      |  SELECT AVG(m) AS slope FROM ms
      |  WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      |), rs AS (
      |  SELECT w.vc - med.slope * w.i AS r, w.i,
      |         ROW_NUMBER() OVER (ORDER BY w.vc - med.slope * w.i, w.i) AS rn,
      |         COUNT(*) OVER () AS cnt
      |  FROM w CROSS JOIN med
      |)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_points,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
      |       CAST(ROUND((SELECT slope FROM med), 6) AS DOUBLE) AS slope,
      |       CAST(ROUND((SELECT AVG(r) FROM rs
      |                   WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)), 4)
      |         AS DOUBLE) AS intercept""".stripMargin) { (spark, dir) =>
    t(spark, dir, "events").createOrReplaceTempView("graft_tsn_events")
    spark.sql(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
        |  FROM graft_tsn_events GROUP BY 1
        |), idx AS (
        |  SELECT vc, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
        |), w AS (SELECT vc, i FROM idx WHERE i <= 30),
        |slopes AS (
        |  SELECT a.i AS i, b.i AS j, (b.vc - a.vc) * 1.0 / (b.i - a.i) AS m
        |  FROM w a JOIN w b ON b.i > a.i
        |), ms AS (
        |  SELECT m, ROW_NUMBER() OVER (ORDER BY m, i, j) AS rn,
        |         COUNT(*) OVER () AS cnt
        |  FROM slopes
        |), med AS (
        |  SELECT AVG(m) AS slope FROM ms
        |  WHERE rn IN ((cnt + 1) DIV 2, (cnt + 2) DIV 2)
        |), rs AS (
        |  SELECT w.vc - med.slope * w.i AS r, w.i,
        |         ROW_NUMBER() OVER (ORDER BY w.vc - med.slope * w.i, w.i) AS rn,
        |         COUNT(*) OVER () AS cnt
        |  FROM w CROSS JOIN med
        |)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_points,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
        |       CAST(ROUND((SELECT slope FROM med), 6) AS DOUBLE) AS slope,
        |       CAST(ROUND((SELECT AVG(r) FROM rs
        |                   WHERE rn IN ((cnt + 1) DIV 2, (cnt + 2) DIV 2)), 4)
        |         AS DOUBLE) AS intercept""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(event_stickiness, a81_grubbs, ts_theil_sen)
}
