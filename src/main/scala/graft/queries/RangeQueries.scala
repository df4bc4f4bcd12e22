package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Range-join at the gate: purchases within 2 days after any signup of
  * the same user. The Spark side runs the bucketed rewrite (equi-join on
  * (user, day-bucket) + exact re-check); the oracle states the naive
  * inequality join — both must produce the identical pair multiset.
  */
object RangeQueries {

  val range_join = OpQuery(
    "range_join",
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase'
      |), s AS (
      |  SELECT event_id AS signup_id, user_id,
      |         epoch_us(ts) AS lo_us,
      |         epoch_us(ts) + 172800000000 AS hi_us
      |  FROM events WHERE event_type = 'signup'
      |)
      |SELECT p.event_id, s.signup_id, p.user_id
      |FROM p JOIN s ON p.user_id = s.user_id
      |              AND p.t_us >= s.lo_us AND p.t_us <= s.hi_us
      |ORDER BY p.event_id, s.signup_id""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us"))
    val signups = events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("signup_id"), col("user_id"),
        unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + 172800000000L).as("hi_us"))
    RangeJoin.pointInInterval(
        purchases, signups, keys = Seq("user_id"),
        pointCol = "t_us", loCol = "lo_us", hiCol = "hi_us",
        bucketWidth = 86400000000L) // 1-day buckets
      .select(col("event_id"), col("signup_id"), col("user_id"))
      .orderBy(col("event_id"), col("signup_id"))
  }

  /** The same point-in-interval semantics planned through the custom
    * [[graft.plans.IntervalJoinStrategy]] physical operator (sorted-lo +
    * max-hi segment-tree stab instead of BroadcastNestedLoopJoin): every
    * purchase inside the 10 minutes after ANY signup, no equi-key — the
    * pure-range shape the default planner handles worst. Plan shape and
    * planner parity are pinned in IntervalJoinSpec; here the oracle pins
    * the join semantics row-for-row.
    */
  val range_join_interval = OpQuery(
    "range_join_interval",
    """WITH p AS (
      |  SELECT event_id, epoch_us(ts) AS t_us
      |  FROM events WHERE event_type = 'purchase'
      |), s AS (
      |  SELECT event_id AS signup_id,
      |         epoch_us(ts) AS lo_us,
      |         epoch_us(ts) + 600000000 AS hi_us
      |  FROM events WHERE event_type = 'signup'
      |)
      |SELECT p.event_id, s.signup_id
      |FROM p JOIN s ON p.t_us >= s.lo_us AND p.t_us <= s.hi_us
      |ORDER BY p.event_id, s.signup_id""".stripMargin) { (spark, dir) =>
    import graft.plans.IntervalJoinStrategy
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    val events = Tables.load(spark, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("t_us"))
    val signups = events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("signup_id"),
        unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + 600000000L).as("hi_us"))
    purchases
      .join(signups, col("t_us") >= col("lo_us") && col("t_us") <= col("hi_us"))
      .select(col("event_id"), col("signup_id"))
      .orderBy(col("event_id"), col("signup_id"))
  }

  val all: Seq[OpQuery] = Seq(range_join, range_join_interval)
}
