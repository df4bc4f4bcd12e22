package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Hand-computed funnel and cohort-retention fixtures. The funnel's
  * ORDERING contract is the interesting part: an event of the right type
  * BEFORE the previous stage's entry time must not count, and the entry
  * time chains through the earliest QUALIFYING event, not the earliest
  * event overall.
  */
class EventAnalyticsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: order matters — pre-signup views don't convert") {
    val ev = events(
      // u1 completes signup -> view -> purchase in order
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-02 09:00:00"),
      // u2 viewed BEFORE signing up and never after: stops at signup
      (2L, "view", "2024-01-01 08:00:00"),
      (2L, "signup", "2024-01-01 09:00:00"),
      // u3 never signed up: in no stage, even with view+purchase
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 11:00:00"),
      // u4 signup -> view, purchase BEFORE the view: stops at view
      (4L, "signup", "2024-01-01 07:00:00"),
      (4L, "purchase", "2024-01-01 08:00:00"),
      (4L, "view", "2024-01-01 09:00:00"))
    val got = EventAnalytics.funnel(ev, Seq("signup", "view", "purchase"))
      .select("stage_idx", "stage", "n_users", "conv_rate")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    got shouldBe Array(
      (0, "signup", 3L, None),            // u1, u2, u4
      (1, "view", 2L, Some(0.666667)),    // u1, u4
      (2, "purchase", 1L, Some(0.5)))     // u1 only
  }

  test("funnel: entry time chains through the earliest QUALIFYING event") {
    // u1's first view is pre-signup; the post-signup view at 12:00 is the
    // stage entry, so the 11:30 purchase (after signup, before that view)
    // must NOT convert.
    val ev = events(
      (1L, "view", "2024-01-01 08:00:00"),
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-01 11:30:00"),
      (1L, "view", "2024-01-01 12:00:00"))
    val got = EventAnalytics.funnel(ev, Seq("signup", "view", "purchase"))
      .select("stage", "n_users").as[(String, Long)].collect()
    got shouldBe Array(("signup", 1L), ("view", 1L), ("purchase", 0L))
  }

  test("funnel: conversion window excludes late stages, boundary inclusive") {
    val ev = events(
      // u1 views exactly 1h after signup (inclusive boundary: counts)
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      // u2 views 1h + 1s after signup: outside the window
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 11:00:01"))
    val oneHourUs = 3600L * 1000000L
    val got = EventAnalytics.funnel(ev, Seq("signup", "view"),
        conversionWindowMicros = Some(oneHourUs))
      .select("stage", "n_users").as[(String, Long)].collect()
    got shouldBe Array(("signup", 2L), ("view", 1L))
  }

  test("funnel: same-instant event counts (at-or-after, inclusive)") {
    val ev = events(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:00:00"))
    val got = EventAnalytics.funnel(ev, Seq("signup", "view"))
      .select("n_users").as[Long].collect()
    got shouldBe Array(1L, 1L)
  }

  test("cohort retention: hand-computed two-cohort matrix") {
    // Weeks (Mondays): 2024-01-01, 2024-01-08, 2024-01-15.
    // Cohort A (first event week of Jan 1): u1 active weeks 0,1,2; u2 weeks 0,2.
    // Cohort B (week of Jan 8): u3 active weeks 0,1.
    val ev = events(
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-09 10:00:00"),
      (1L, "view", "2024-01-16 10:00:00"),
      (2L, "view", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-17 10:00:00"),
      (3L, "view", "2024-01-10 10:00:00"),
      (3L, "view", "2024-01-15 10:00:00"))
    val got = EventAnalytics.cohortRetention(ev)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    got shouldBe Array(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 1, 1L, 0.5),
      ("2024-01-01", 2, 2L, 1.0),
      ("2024-01-08", 0, 1L, 1.0),
      ("2024-01-08", 1, 1L, 1.0))
  }

  test("cohort retention: multiple events in one week count a user once") {
    val ev = events(
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "click", "2024-01-03 10:00:00"),
      (1L, "view", "2024-01-04 10:00:00"))
    val got = EventAnalytics.cohortRetention(ev)
      .select("week_offset", "n_active").as[(Int, Long)].collect()
    got shouldBe Array((0, 1L))
  }

  test("transition matrix: hand-computed counts and row-normalized probabilities") {
    // u1: a -> b -> a -> b   gives a->b x2, b->a x1
    // u2: a -> c             gives a->c x1
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 11:00:00")),
      (3L, 1L, "a", ts("2024-01-01 12:00:00")),
      (4L, 1L, "b", ts("2024-01-01 13:00:00")),
      (5L, 2L, "a", ts("2024-01-01 10:00:00")),
      (6L, 2L, "c", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.transitionMatrix(ev)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe Map(
      ("a", "b") -> (2L, 0.666667), ("a", "c") -> (1L, 0.333333),
      ("b", "a") -> (1L, 1.0))
  }

  test("transition matrix: same-timestamp ties break on event_id") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (2L, 1L, "b", t0), (1L, 1L, "a", t0), (3L, 1L, "c", t0)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(("a", "b"), ("b", "c"))
  }

  test("user sequences: ordered, truncated, counted") {
    val ev = Seq(
      (3L, 1L, "c", ts("2024-01-01 12:00:00")),
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 11:00:00")),
      (4L, 2L, "x", ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val full = EventAnalytics.userSequences(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    full shouldBe Map(1L -> (3L, "a>b>c"), 2L -> (1L, "x"))
    val truncated = EventAnalytics.userSequences(ev, maxLen = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    truncated(1L) shouldBe "a>b"
  }

  test("funnel plan: no cartesian product, stage joins stay equi-joins") {
    val ev = events((1L, "signup", "2024-01-01 10:00:00"))
    val plan = EventAnalytics.funnel(ev, Seq("signup", "view", "purchase"))
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("repeat-stage funnel requires a SECOND event, not the anchor itself") {
    def at(t: String) = java.sql.Timestamp.valueOf(t)
    val ev = Seq(
      (1L, "view", at("2024-01-01 10:00:00")),  // one view only
      (2L, "view", at("2024-01-01 10:00:00")),
      (2L, "view", at("2024-01-01 10:05:00"))) // two views
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(ev, Seq("view", "view"))
      .select("stage_idx", "n_users").as[(Int, Long)].collect().toMap
    assert(out(0) === 2L)
    assert(out(1) === 1L, "the anchoring event must not satisfy the repeat stage")
  }
}
