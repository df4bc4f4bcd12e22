package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** As-of join at the driver gate: attribute each purchase event to the
  * user's latest prior signup event. Oracle = DuckDB's native ASOF JOIN
  * over the same slices (joined on integer epoch-microseconds so both
  * engines compare identical values — Spark timestamps are µs).
  */
object AsOfQueries {

  val asof_join = OpQuery(
    "asof_join",
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase'
      |), r AS (
      |  SELECT event_id AS signup_id, user_id, epoch_us(ts) AS signup_us
      |  FROM events WHERE event_type = 'signup'
      |)
      |SELECT l.event_id, l.user_id, l.t_us,
      |       r.signup_id AS asof_signup_id, r.signup_us AS asof_signup_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.t_us >= r.signup_us
      |ORDER BY l.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("signup_us"))
    AsOfJoin.asOf(purchases, signups, keys = Seq("user_id"),
        leftTime = "t_us", rightTime = "signup_us")
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("asof_signup_id"), col("asof_signup_us"))
      .orderBy(col("event_id"))
  }

  /** Tolerance variant: only signups within the last 3 days count. */
  val asof_join_tolerance = OpQuery(
    "asof_join_tolerance",
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase'
      |), r AS (
      |  SELECT event_id AS signup_id, user_id, epoch_us(ts) AS signup_us
      |  FROM events WHERE event_type = 'signup'
      |), matched AS (
      |  SELECT l.event_id, l.user_id, l.t_us, r.signup_id, r.signup_us
      |  FROM l ASOF LEFT JOIN r
      |    ON l.user_id = r.user_id AND l.t_us >= r.signup_us
      |)
      |SELECT event_id, user_id, t_us,
      |       CASE WHEN signup_us >= t_us - 259200000000 THEN signup_id END AS asof_signup_id
      |FROM matched
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("signup_us"))
    AsOfJoin.asOf(purchases, signups, keys = Seq("user_id"),
        leftTime = "t_us", rightTime = "signup_us",
        tolerance = Some(lit(259200000000L))) // 3 days in µs
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("asof_signup_id"))
      .orderBy(col("event_id"))
  }

  /** Forward direction: each click's NEXT purchase at-or-after it per
    * user (fill-forward's mirror) — oracled against DuckDB's native
    * forward ASOF (`<=` inequality).
    */
  val asof_join_forward = OpQuery(
    "asof_join_forward",
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'click'
      |), r AS (
      |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT l.event_id, l.user_id, l.t_us,
      |       r.purchase_id AS asof_purchase_id, r.purchase_us AS asof_purchase_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.t_us <= r.purchase_us
      |ORDER BY l.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    AsOfJoin.asOfForward(clicks, purchases, keys = Seq("user_id"),
        leftTime = "t_us", rightTime = "purchase_us")
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("asof_purchase_id"), col("asof_purchase_us"))
      .orderBy(col("event_id"))
  }

  val all: Seq[OpQuery] = Seq(asof_join, asof_join_tolerance, asof_join_forward)
}
