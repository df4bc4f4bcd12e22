package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 72: Kaplan–Meier survival estimation, the
  * Wald–Wolfowitz runs test, and haversine geo distance.
  */
object Round4Ops72 {

  /** Kaplan–Meier survival curve of user lifetimes (hours between first
    * and last event; users still active in the final observed day are
    * censored). The product Π(1 − dᵢ/nᵢ) is carried as a cumulative
    * sum of ln-terms quantized to DECIMAL(28,12) — order-independent
    * across partitions and immune to libm ulp drift — with a single
    * exp at the end. One pass for lifetimes, one sort over ~distinct
    * days.
    */
  val a50_survival_km = OpQuery(
    "a50_survival_km",
    """WITH spans AS (
      |  SELECT user_id,
      |         CAST(FLOOR((TRUNC(epoch(MAX(ts))) - TRUNC(epoch(MIN(ts)))) / 3600) AS INT)
      |           AS life_days,
      |         MAX(ts) AS last_ts
      |  FROM events GROUP BY user_id),
      |horizon AS (SELECT MAX(last_ts) AS h FROM spans),
      |obs AS (
      |  SELECT life_days,
      |         CASE WHEN epoch(h) - epoch(last_ts) < 86400 THEN 0 ELSE 1 END AS died
      |  FROM spans, horizon),
      |n_total AS (SELECT COUNT(*) AS n FROM obs),
      |by_day AS (
      |  SELECT life_days, SUM(died) AS d, COUNT(*) AS leaving
      |  FROM obs GROUP BY life_days),
      |at_risk AS (
      |  SELECT life_days, d,
      |         (SELECT n FROM n_total) -
      |           COALESCE(SUM(leaving) OVER (ORDER BY life_days
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_i
      |  FROM by_day),
      |terms AS (
      |  SELECT life_days, d, n_i,
      |         CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_i), 12) AS DECIMAL(28,12))
      |           AS lnterm
      |  FROM at_risk WHERE d > 0 AND d < n_i)
      |SELECT life_days AS life_hours, CAST(d AS BIGINT) AS deaths, CAST(n_i AS BIGINT) AS at_risk,
      |       CAST(ROUND(exp(CAST(SUM(lnterm) OVER (ORDER BY life_days
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
      |         AS DOUBLE) AS survival
      |FROM terms
      |ORDER BY life_days""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_km_events")
    spark.sql(
      """WITH spans AS (
        |  SELECT user_id,
        |         CAST(FLOOR((unix_timestamp(MAX(ts)) - unix_timestamp(MIN(ts))) / 3600) AS INT)
        |           AS life_days,
        |         MAX(ts) AS last_ts
        |  FROM graft_km_events GROUP BY user_id),
        |horizon AS (SELECT MAX(last_ts) AS h FROM spans),
        |obs AS (
        |  SELECT life_days,
        |         CASE WHEN unix_timestamp(h) - unix_timestamp(last_ts) < 86400
        |              THEN 0 ELSE 1 END AS died
        |  FROM spans CROSS JOIN horizon),
        |n_total AS (SELECT COUNT(*) AS n FROM obs),
        |by_day AS (
        |  SELECT life_days, SUM(died) AS d, COUNT(*) AS leaving
        |  FROM obs GROUP BY life_days),
        |at_risk AS (
        |  SELECT life_days, d,
        |         (SELECT n FROM n_total) -
        |           COALESCE(SUM(leaving) OVER (ORDER BY life_days
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_i
        |  FROM by_day),
        |terms AS (
        |  SELECT life_days, d, n_i,
        |         CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_i), 12) AS DECIMAL(28,12))
        |           AS lnterm
        |  FROM at_risk WHERE d > 0 AND d < n_i)
        |SELECT life_days AS life_hours, CAST(d AS BIGINT) AS deaths, CAST(n_i AS BIGINT) AS at_risk,
        |       CAST(ROUND(exp(CAST(SUM(lnterm) OVER (ORDER BY life_days
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
        |         AS DOUBLE) AS survival
        |FROM terms
        |ORDER BY life_days""".stripMargin)
  }

  /** Wald–Wolfowitz runs test on the purchase-value sequence: is the
    * above/below-median pattern random? Runs are counted with one
    * lag-window pass (a run starts where the sign differs from the
    * previous row); the expected-runs z-statistic is pure integer
    * arithmetic until the final division. The median is the pinned
    * lower order statistic, not an interpolation.
    */
  val a51_runs_test = OpQuery(
    "a51_runs_test",
    """WITH seq AS (
      |  SELECT value, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i
      |  FROM events WHERE event_type = 'purchase'),
      |med AS (
      |  SELECT value AS m FROM (
      |    SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS r, COUNT(*) OVER () AS n
      |    FROM seq) t
      |  WHERE r = CAST(FLOOR((n + 1) / 2) AS INT)),
      |signs AS (
      |  SELECT i, CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
      |  FROM seq),
      |runs AS (
      |  SELECT s, CASE WHEN LAG(s) OVER (ORDER BY i) IS NULL
      |                   OR LAG(s) OVER (ORDER BY i) <> s THEN 1 ELSE 0 END AS new_run
      |  FROM signs),
      |m2 AS (
      |  SELECT SUM(new_run) AS r, SUM(s) AS n1, SUM(1 - s) AS n2 FROM runs)
      |SELECT CAST(r AS BIGINT) AS runs,
      |       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
      |       CAST(ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1)) /
      |            sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      |                 (POW(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1))), 6)
      |            AS DOUBLE) AS z
      |FROM m2""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_runs_events")
    // both global ranks via TotalOrder (arrival index + value rank for
    // the median); the LAG becomes an equi-join on the DENSE index
    // (p.i = s.i - 1) — predecessor lookup as a shuffle join on i, not
    // a single-reducer global sort of every purchase row
    val runsSeq = graft.operators.TotalOrder
      .rowNumber(
        spark.sql("""SELECT value, ts, event_id FROM graft_runs_events
                    |WHERE event_type = 'purchase'""".stripMargin),
        Seq(col("ts"), col("event_id")), "i")
      .select(col("value"), col("i"))
    runsSeq.createOrReplaceTempView("graft_runs_seq")
    graft.operators.TotalOrder
      .rowNumberWithCount(runsSeq, Seq(col("value")), "r", "n")
      .filter(col("r") === floor((col("n") + 1) / 2).cast("int"))
      .select(col("value").as("m"))
      .localCheckpoint(true)
      .createOrReplaceTempView("graft_runs_med")
    spark.sql(
      """WITH seq AS (SELECT value, i FROM graft_runs_seq),
        |med AS (SELECT m FROM graft_runs_med),
        |signs AS (
        |  SELECT i, CASE WHEN value > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
        |  FROM seq),
        |runs AS (
        |  SELECT s.s, CASE WHEN p.s IS NULL OR p.s <> s.s THEN 1 ELSE 0 END AS new_run
        |  FROM signs s LEFT JOIN signs p ON p.i = s.i - 1),
        |m2 AS (
        |  SELECT SUM(new_run) AS r, SUM(s) AS n1, SUM(1 - s) AS n2 FROM runs)
        |SELECT CAST(r AS BIGINT) AS runs,
        |       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
        |       CAST(ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1)) /
        |            sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
        |                 (POW(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1))), 6)
        |            AS DOUBLE) AS z
        |FROM m2""".stripMargin)
  }

  /** Haversine great-circle distance from each supplier's synthetic
    * coordinates to a fixed depot — row-wise trig with the result
    * rounded to whole meters' precision (4 dp km), far above any libm
    * ulp difference. No shuffle at all: scan → project → sort.
    */
  val f_haversine = OpQuery(
    "f_haversine",
    """WITH pts AS (
      |  SELECT s_suppkey,
      |         CAST(s_suppkey % 170 AS DOUBLE) - 85 + 0.25 AS lat,
      |         CAST((s_suppkey * 7) % 360 AS DOUBLE) - 180 + 0.5 AS lon
      |  FROM supplier)
      |SELECT s_suppkey, lat, lon,
      |       CAST(ROUND(2 * 6371.0 * asin(sqrt(
      |         POW(sin(radians(lat - 48.8566) / 2), 2) +
      |         cos(radians(48.8566)) * cos(radians(lat)) *
      |         POW(sin(radians(lon - 2.3522) / 2), 2))), 4) AS DOUBLE) AS km_to_depot
      |FROM pts
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"),
        ((col("s_suppkey") % 170).cast("double") - 85 + 0.25).as("lat"),
        (((col("s_suppkey") * 7) % 360).cast("double") - 180 + 0.5).as("lon"))
      .select(col("s_suppkey"), col("lat"), col("lon"),
        round(lit(2) * 6371.0 * asin(sqrt(
          pow(sin(radians(col("lat") - 48.8566) / 2), 2) +
            cos(radians(lit(48.8566))) * cos(radians(col("lat"))) *
              pow(sin(radians(col("lon") - 2.3522) / 2), 2))), 4)
          .cast("double").as("km_to_depot"))
      .orderBy("s_suppkey")
  }

  val all: Seq[OpQuery] = Seq(a50_survival_km, a51_runs_test, f_haversine)
}
