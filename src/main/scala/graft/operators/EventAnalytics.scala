package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: ordered-stage
  * conversion funnels and cohort retention matrices — the two queries
  * every dashboard built on a medallion gold layer eventually asks of an
  * events fact table.
  *
  * Scale notes:
  *  - [[funnel]] runs one scan + aggregation per stage. Each stage's
  *    reach set (one row per user) is tiny relative to the event log, so
  *    the chained join is an AQE-eligible equi-join keyed on the user —
  *    no stage ever funnels events through a single reducer, and the
  *    per-stage partial aggregation (min over user) combines map-side.
  *  - [[cohortRetention]] is two user-keyed aggregations plus a join of
  *    two week-level aggregates whose cardinality is O(weeks²) — the
  *    final join inputs are dashboard-sized regardless of event volume.
  */
object EventAnalytics {

  /** Ordered conversion funnel: a user counts for stage i+1 only with an
    * event of that stage's type AT OR AFTER their stage-i entry time
    * (entry = earliest qualifying event, chained from the funnel head),
    * and — when `conversionWindowMicros` is set — no later than that
    * entry time plus the window (the standard "converted within 24h"
    * funnel semantics; without a window every funnel over a long-lived
    * product converges to its user count).
    *
    * Times compare in epoch MICROSECONDS (Spark's native timestamp
    * resolution) so results are reproducible across engines reading the
    * same nanosecond source data.
    *
    * Output: (stage_idx, stage, n_users, conv_rate) where conv_rate is
    * n_users / previous stage's n_users (null for the head stage). The
    * trailing window runs over `stages.length` rows — driver-sized.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      conversionWindowMicros: Option[Long] = None,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(
      col(userCol).as("__u"), col(typeCol).as("__t"),
      unix_micros(col(tsCol)).as("__us"))

    // reached(i): one row per user who completed stages 0..i, with the
    // entry time of stage i
    val head = ev.filter(col("__t") === stages.head)
      .groupBy(col("__u")).agg(min(col("__us")).as("__entry"))
    val reached = stages.tail.zip(stages.init).scanLeft(head) {
      case (prev, (stage, prevStage)) =>
        val inWindow = conversionWindowMicros
          .map(w => col("__us") <= col("__prev") + w)
          .getOrElse(lit(true))
        // when two CONSECUTIVE stages share a type, the stage-i entry
        // event must not satisfy stage i+1 too (>= with equal types let
        // one \"view\" convert a view→view funnel); distinct types keep
        // >= so simultaneous cross-type events still count
        val after =
          if (stage == prevStage) col("__us") > col("__prev")
          else col("__us") >= col("__prev")
        ev.filter(col("__t") === stage)
          .join(prev.select(col("__u"), col("__entry").as("__prev")), "__u")
          .filter(after && inWindow)
          .groupBy(col("__u")).agg(min(col("__us")).as("__entry"))
    }

    val counts = reached.zipWithIndex.map { case (df, idx) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage_idx"), lit(stages(idx)).as("stage"),
          col("n_users"))
    }.reduce(_ union _)

    // bounded: stages.length rows total — the funnel definition, not data
    val w = TotalOrder.boundedGlobal(col("stage_idx"))
    TotalOrder.checkBounded(counts, "funnel-stage-counts")
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(col("n_users") * 1.0 /
          nullif(lag(col("n_users"), 1).over(w), lit(0)), 6)
          .cast("double").as("conv_rate"))
      .orderBy(col("stage_idx"))
  }

  /** Markov transition matrix over the event stream (process mining):
    * for every ordered pair of consecutive events per user, count the
    * (prev_type → next_type) transition and normalize rows to
    * probabilities. The per-user window orders by (epoch µs, event id)
    * so ties are deterministic across engines and layouts.
    *
    * Scale: one user-keyed window pass (each user's history sorts within
    * its partition group) + a type-pair aggregation whose output is
    * |types|² — dashboard-sized however large the log is.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val share = Window.partitionBy(col("prev_type"))
    events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") * 1.0 / sum(col("n")).over(share), 6).cast("double"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Per-user behavioral sequences (training-sequence construction for
    * behavior models): each user's events ordered by (epoch µs, event
    * id), truncated to `maxLen`, joined into one string. One shuffle on
    * the user key; the sort happens inside the aggregated array (never a
    * global orderBy), so no single reducer sees more than one user's
    * history.
    */
  def userSequences(
      events: DataFrame,
      maxLen: Int = 50,
      sep: String = ">",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    events
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("us"), col(idCol).as("id"),
          col(typeCol).as("t")).as("__e"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        slice(array_sort(collect_list(col("__e"))), 1, maxLen).as("__head"))
      .select(col(userCol), col("n_events"),
        concat_ws(sep, transform(col("__head"), e => e.getField("t")))
          .as("head_seq"))
      .orderBy(col(userCol))

  /** Weekly cohort retention: cohort = ISO week (Monday) of the user's
    * first event; a cohort is "active at offset w" if any member has an
    * event in the week `cohort + 7w days`. Retention is active users over
    * the cohort's size (its week-0 active count — every member has an
    * event in week 0 by construction).
    *
    * Output: (cohort_week, week_offset, n_active, retention).
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
    val cohorts = ev.groupBy(col("__u"))
      .agg(min(col("__d")).as("__d0"))
      .select(col("__u"), date_trunc("week", col("__d0")).cast("date").as("__cohort"))
    val activeWeeks = ev
      .select(col("__u"), date_trunc("week", col("__d")).cast("date").as("__w"))
      .distinct()

    val cells = activeWeeks.join(cohorts, "__u")
      .groupBy(col("__cohort"),
        (datediff(col("__w"), col("__cohort")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // week-0 sizes: one row per cohort — broadcastable at any event volume
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("__cohort"), col("n_active").as("__size"))

    cells.join(broadcast(sizes), "__cohort")
      .select(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"),
        round(col("n_active") * 1.0 / col("__size"), 6)
          .cast("double").as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
