package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, t) probes; right: (rid, key, t) reference points
  private val left = Seq(
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 500L), (5L, "c", 10L))
    .toDF("id", "key", "t")
  private val right = Seq(
    (10L, "a", 100L),  // exactly equal to left id=1's time
    (11L, "a", 150L),
    (12L, "b", 400L), (13L, "b", 450L))
    .toDF("rid", "key", "rt")

  test("asof picks the latest right row with rt <= t, equal timestamps match") {
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt")
      .select($"id", $"asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L) == Some(10L)) // rt == t matches (<= semantics)
    assert(out(2L) == Some(11L)) // latest of {100, 150}
    assert(out(3L) == None)      // nothing at or before t=50
    assert(out(4L) == Some(13L)) // latest of {400, 450}
    assert(out(5L) == None)      // key with no right rows at all
  }

  test("tolerance drops matches older than the lookback window") {
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt",
        tolerance = Some(lit(60L)))
      .select($"id", $"asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L) == Some(10L)) // delta 0 <= 60
    assert(out(2L) == Some(11L)) // delta 50 <= 60
    assert(out(4L) == Some(13L)) // delta 50 <= 60
    // id=4's match 13 at delta 50 stays; shrink window below it:
    val tight = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt",
        tolerance = Some(lit(40L)))
      .select($"id", $"asof_rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(tight(4L) == None)
  }

  test("duplicate (key, rt) right rows resolve deterministically to the greatest payload") {
    val dupRight = Seq(
      (20L, "a", 100L), (22L, "a", 100L), (21L, "a", 100L))
      .toDF("rid", "key", "rt")
    (1 to 5).foreach { _ =>
      val out = AsOfJoin.asOf(left, dupRight.repartition(7), Seq("key"), "t", "rt")
        .filter($"id" === 1L).select($"asof_rid").head()
      assert(out.getLong(0) == 22L, "tie must resolve to the max orderable payload")
    }
  }

  test("non-orderable (MapType) payload columns are accepted") {
    val mapRight = Seq((10L, "a", 100L), (11L, "a", 150L))
      .toDF("rid", "key", "rt")
      .withColumn("attrs", map(lit("k"), $"rid"))
    val out = AsOfJoin.asOf(left, mapRight, Seq("key"), "t", "rt")
      .select($"id", $"asof_rid", $"asof_attrs")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(10L) && out(2L) == Some(11L) && out(3L) == None)
    // the map payload itself round-trips
    val attrs = AsOfJoin.asOf(left, mapRight, Seq("key"), "t", "rt")
      .filter($"id" === 2L).select($"asof_attrs").head().getMap[String, Long](0)
    assert(attrs("k") == 11L)
  }

  test("asof == naive latest-at-or-before scan on random data (5 seeds)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Seq("a", "b", "c")
      val leftRows = (1L to 40L).map(i =>
        (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong))
      val rightRows = (100L to 130L).map(i =>
        (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong))
      val tol = 50L + rnd.nextInt(300)

      // driver-side oracle: per left row, max-rt right row with rt <= t
      // within tolerance; ties on rt resolve to the max rid (payload order)
      def expected(withTol: Boolean): Map[Long, Option[Long]] =
        leftRows.map { case (id, k, t) =>
          val cands = rightRows.filter { case (_, rk, rt) =>
            rk == k && rt <= t && (!withTol || rt >= t - tol)
          }
          id -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(c => (c._3, c._1))._1))
        }.toMap

      def run(tolOpt: Option[org.apache.spark.sql.Column]): Map[Long, Option[Long]] =
        AsOfJoin.asOf(
            leftRows.toDF("id", "key", "t").repartition(7),
            rightRows.toDF("rid", "key", "rt").repartition(5),
            Seq("key"), "t", "rt", tolerance = tolOpt)
          .select($"id", $"asof_rid").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      assert(run(None) == expected(withTol = false), s"seed $seed no-tolerance")
      assert(run(Some(lit(tol))) == expected(withTol = true), s"seed $seed tol=$tol")
    }
  }

  test("every left row survives exactly once (left-join cardinality)") {
    val out = AsOfJoin.asOf(left, right, Seq("key"), "t", "rt")
    assert(out.count() == left.count())
    assert(out.select("id").distinct().count() == left.count())
    // left columns come through intact
    assert(out.columns.toSet ==
      Set("id", "key", "t", "asof_rid", "asof_rt"))
  }

  test("forward asof == naive earliest-at-or-after scan on random data (5 seeds)") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val leftRows = (1L to 80L).map(i =>
        (i, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
      val rightRows = (1L to 60L).map(i =>
        (i + 1000L, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
      val tol = 120L

      // per left row: min-rt right row with rt >= t (within tolerance);
      // ties on rt resolve to the MIN rid (forward takes first in order)
      def expected(withTol: Boolean): Map[Long, Option[Long]] =
        leftRows.map { case (id, k, t) =>
          val cands = rightRows.filter { case (_, rk, rt) =>
            rk == k && rt >= t && (!withTol || rt <= t + tol)
          }
          id -> (if (cands.isEmpty) None
                 else Some(cands.minBy(c => (c._3, c._1))._1))
        }.toMap

      def run(tolOpt: Option[org.apache.spark.sql.Column]): Map[Long, Option[Long]] =
        AsOfJoin.asOfForward(
            leftRows.toDF("id", "key", "t").repartition(7),
            rightRows.toDF("rid", "key", "rt").repartition(5),
            Seq("key"), "t", "rt", tolerance = tolOpt)
          .select($"id", $"asof_rid").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      assert(run(None) == expected(withTol = false), s"seed $seed no-tolerance")
      assert(run(Some(lit(tol))) == expected(withTol = true), s"seed $seed tol=$tol")
    }
  }
}
