package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withStrategy[T](f: => T): T = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ IntervalJoinStrategy
    try f
    finally spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == IntervalJoinStrategy)
  }

  private def points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, -3L))
    .toDF("pid", "v")
  private def intervals = Seq(
    (10L, 0L, 10L),    // matches 5, 10
    (11L, 10L, 20L),   // matches 10, 15
    (12L, -5L, -1L),   // matches -3
    (13L, 50L, 60L))   // matches nothing
    .toDF("iid", "lo", "hi")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  test("interval join: plan uses IntervalJoinExec, result equals default planner") {
    val q = () => points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
    val default = pairs(q())
    assert(!q().queryExecution.executedPlan.toString.contains("IntervalJoin"))
    withStrategy {
      val planned = q()
      val plan = planned.queryExecution.executedPlan.toString
      assert(plan.contains("IntervalJoin"), s"strategy did not fire:\n$plan")
      assert(pairs(planned) == default)
      assert(default == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (5L, 12L)))
    }
  }

  test("boundary inclusivity, reversed conjuncts, and flipped comparisons") {
    withStrategy {
      // v <= hi AND v >= lo (order flipped), bounds written as b <= v / b >= v
      val q = points.join(intervals, $"hi" >= $"v" && $"lo" <= $"v")
      assert(q.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(pairs(q) == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (5L, 12L)))
    }
  }

  test("null points and null bounds never match") {
    withStrategy {
      val p = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "v")
      val iv = Seq(
        (10L, Some(0L), Some(10L)),
        (11L, None, Some(10L)),
        (12L, Some(0L), None)).toDF("iid", "lo", "hi")
      val q = p.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
      assert(q.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(pairs(q) == Set((1L, 10L)))
    }
  }

  test("strict bounds plan through the operator with exclusive semantics") {
    withStrategy {
      // v > lo drops the v == lo matches: (2, 11) sits at v = 10 = lo
      val strict = points.join(intervals, $"v" > $"lo" && $"v" <= $"hi")
      assert(strict.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(pairs(strict) == Set((1L, 10L), (2L, 10L), (3L, 11L), (5L, 12L)))
      // both strict also drops v == hi: (2, 10) sits at v = 10 = hi
      val both = points.join(intervals, $"v" > $"lo" && $"v" < $"hi")
      assert(both.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(pairs(both) == Set((1L, 10L), (3L, 11L), (5L, 12L)))
      // randomized strict parity vs the default planner
      val rnd = new scala.util.Random(3)
      val p = (1L to 200L).map(i => (i, rnd.nextInt(500).toLong)).toDF("pid", "v")
      val iv = (1L to 80L).map { i =>
        val lo = rnd.nextInt(500).toLong
        (i, lo, lo + rnd.nextInt(80).toLong)
      }.toDF("iid", "lo", "hi")
      val expected = p.join(iv, $"v" > $"lo" && $"v" < $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      // (withStrategy is active: both plans go through IntervalJoinExec —
      // compare against a manually filtered cross join instead)
      val naive = p.crossJoin(iv)
        .filter($"v" > $"lo" && $"v" < $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(expected == naive)
    }
  }

  test("out-of-scope shapes fall through to the default planner") {
    withStrategy {
      // extra equi conjunct
      val extra = points.join(intervals,
        $"v" >= $"lo" && $"v" <= $"hi" && $"pid" === $"iid")
      assert(!extra.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      // non-integral point type
      val dbl = points.select($"pid", $"v".cast("double").as("v"))
        .join(intervals.select($"iid", $"lo".cast("double").as("lo"),
          $"hi".cast("double").as("hi")),
          $"v" >= $"lo" && $"v" <= $"hi")
      assert(!dbl.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      // left join keeps default planning
      val outer = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi", "left")
      assert(!outer.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    }
  }

  test("randomized parity with the nested-loop plan (overlapping intervals)") {
    val rnd = new scala.util.Random(11)
    val p = (1L to 300L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "v")
    val iv = (1L to 120L).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i, lo, lo + rnd.nextInt(200).toLong)
    }.toDF("iid", "lo", "hi")
    val expected = pairs(p.join(iv, $"v" >= $"lo" && $"v" <= $"hi"))
    withStrategy {
      val q = p.join(iv, $"v" >= $"lo" && $"v" <= $"hi")
      assert(q.queryExecution.executedPlan.toString.contains("IntervalJoin"))
      assert(pairs(q) == expected)
    }
    assert(expected.nonEmpty)
  }
}
