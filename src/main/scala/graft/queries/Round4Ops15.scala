package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Intervals

/** Round-4 batch 15: sweep-line interval aggregation. */
object Round4Ops15 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Orders in flight per day ([[Intervals.dailyActive]]): an order is
    * open from its order date until its last line-item ship date. The
    * oracle states the same question as the NAIVE day×interval join —
    * proving sweep-line ≡ exhaustive — while the Spark side runs the
    * boundary-event plan (one uniform shuffle + a day-sized prefix sum).
    */
  val ts_active_intervals = OpQuery(
    "ts_active_intervals",
    """WITH iv AS (
      |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
      |         MAX(CAST(l_shipdate AS DATE)) AS d1
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |), span AS (
      |  SELECT MIN(d0) AS lo, MAX(d1) AS hi FROM iv
      |), days AS (
      |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM span
      |)
      |SELECT strftime(days.d, '%Y-%m-%d') AS day,
      |       CAST(COUNT(iv.o_orderkey) AS BIGINT) AS n_active
      |FROM days LEFT JOIN iv ON days.d BETWEEN iv.d0 AND iv.d1
      |GROUP BY days.d
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    val iv = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"))
      .agg(max(to_date(col("l_shipdate"))).as("d1"))
    Intervals.dailyActive(iv, "d0", "d1")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("n_active"))
      .orderBy(col("day"))
  }

  val all: Seq[OpQuery] = Seq(ts_active_intervals)
}
