package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{EventAnalytics, TimeSeries}

/** Round-4 batch 4: process-mining transitions, market-basket
  * co-occurrence, behavioral sequence construction, and exact-integer
  * anomaly detection.
  */
object Round4Ops4 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Markov transition matrix of the event stream
    * ([[EventAnalytics.transitionMatrix]]): per-user consecutive-event
    * pairs, row-normalized to probabilities. Ties in the ordering break
    * on event_id so both engines see the identical sequence.
    */
  val event_transitions = OpQuery(
    "event_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events
      |)
      |SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS DOUBLE) AS p
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, next_type""".stripMargin) { (spark, dir) =>
    EventAnalytics.transitionMatrix(t(spark, dir, "events"))
  }

  /** Market-basket co-occurrence: pairs of part types bought in the same
    * order, counted across orders — the support-counting core of
    * association-rule mining. The part dimension joins broadcast; the
    * pair join is per-order (each order contributes |types-in-order|²
    * pairs, a handful), keyed on the uniform order key. Deterministic
    * top-25 via full tie-break.
    */
  val market_basket = OpQuery(
    "market_basket",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |)
      |SELECT a.p_type AS type_a, b.p_type AS type_b, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM items a JOIN items b
      |  ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, type_a, type_b
      |LIMIT 25""".stripMargin) { (spark, dir) =>
    val items = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_type"))
      .distinct()
    val a = items.toDF("l_orderkey", "type_a")
    val b = items.toDF("l_orderkey", "type_b")
    a.join(b, Seq("l_orderkey"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("type_a"), col("type_b"))
      .limit(25)
  }

  /** Per-user behavioral sequences ([[EventAnalytics.userSequences]]):
    * ordered event-type strings truncated to 50 events — the sequence
    * construction step of a behavior-model training pipeline. The sort
    * lives inside each user's aggregated array, never in a global
    * orderBy.
    */
  val user_sequences = OpQuery(
    "user_sequences",
    """SELECT user_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       array_to_string((list(event_type ORDER BY epoch_us(ts), event_id))[1:50], '>') AS head_seq
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
    EventAnalytics.userSequences(t(spark, dir, "events"), maxLen = 50)
  }

  /** Exact integer z-score anomaly detection
    * ([[TimeSeries.integerZScoreAnomalies]]): daily per-user totals in
    * cents tested against the trailing 7 days, the whole test in BIGINT
    * arithmetic so the flag is bit-reproducible in both engines (no
    * floating-point variance). 212 anomalies at sf0.01.
    */
  val ts_anomaly = OpQuery(
    "ts_anomaly",
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |         CAST(TRUNC(SUM(CAST(value AS DECIMAL(18,2))) * 100) AS BIGINT) AS vc
      |  FROM events GROUP BY 1, 2
      |), w AS (
      |  SELECT user_id, d, vc,
      |    CAST(COUNT(vc) OVER pw AS BIGINT) AS n,
      |    CAST(COALESCE(SUM(vc) OVER pw, 0) AS BIGINT) AS s1,
      |    CAST(COALESCE(SUM(vc*vc) OVER pw, 0) AS BIGINT) AS s2
      |  FROM daily
      |  WINDOW pw AS (PARTITION BY user_id ORDER BY d
      |                RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND INTERVAL 1 DAYS PRECEDING)
      |)
      |SELECT user_id, strftime(d, '%Y-%m-%d') AS day, vc AS v_cents, n AS n_prev,
      |       (n >= 3 AND (vc*n - s1)*(vc*n - s1)*(n-1) > 9*n*(n*s2 - s1*s1)) AS is_anomaly
      |FROM w ORDER BY user_id, day""".stripMargin) { (spark, dir) =>
    val daily = t(spark, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("vc"))
    TimeSeries.integerZScoreAnomalies(daily, "user_id", "d", "vc",
        lookbackDays = 7, minPrevDays = 3, zThreshold = 3)
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("vc").as("v_cents"), col("n_prev"), col("is_anomaly"))
      .orderBy(col("user_id"), col("day"))
  }

  val all: Seq[OpQuery] = Seq(
    event_transitions, market_basket, user_sequences, ts_anomaly)
}
