package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "k", 100L), (2L, "k", 250L), (3L, "k", 500L), (4L, "m", 100L))
    .toDF("pid", "key", "t")
  private val intervals = Seq(
    (10L, "k", 100L, 250L),   // closed bounds: both 100 and 250 inside
    (11L, "k", 240L, 600L),   // overlaps interval 10
    (12L, "m", 0L, 50L))      // excludes the m-point at 100
    .toDF("iid", "key", "lo", "hi")

  private def run(bucketWidth: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, Seq("key"), "t", "lo", "hi",
        bucketWidth)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("bucketed rewrite equals the naive inequality join, bounds inclusive") {
    val naive = points.join(intervals, Seq("key"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(naive == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
    assert(run(bucketWidth = 100L) == naive)
  }

  test("result is bucket-width invariant (incl. widths misaligned with the data)") {
    val expected = run(100L)
    Seq(1L, 7L, 64L, 1000L, 100000L).foreach { w =>
      assert(run(w) == expected, s"bucketWidth=$w diverged")
    }
  }
}
