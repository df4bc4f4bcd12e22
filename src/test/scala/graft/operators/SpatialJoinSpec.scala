package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(n: Int) = (1 to n).map { i =>
    (i.toLong, ((i * 37) % 100).toDouble, ((i * 91) % 100).toDouble)
  }.toDF("point_id", "x", "y")

  private def boxes(n: Int) = (1 to n).map { i =>
    val xlo = ((i * 53) % 80).toDouble
    val ylo = ((i * 67) % 80).toDouble
    (i.toLong, xlo, xlo + (i % 13) + 1, ylo, ylo + (i % 11) + 1)
  }.toDF("box_id", "xlo", "xhi", "ylo", "yhi")

  private def pairs(df: org.apache.spark.sql.DataFrame) = df
    .select("point_id", "box_id").as[(Long, Long)].collect().sorted.toSeq

  test("tiled join equals the exhaustive cross-join filter, at several cell sizes") {
    val p = points(200)
    val b = boxes(60)
    val exact = pairs(p.crossJoin(b).filter(
      $"x" >= $"xlo" && $"x" <= $"xhi" && $"y" >= $"ylo" && $"y" <= $"yhi"))
    assert(exact.nonEmpty, "test geometry must produce containments")
    for (cell <- Seq(3.0, 10.0, 50.0, 1000.0)) {
      assert(pairs(SpatialJoin.pointsInBoxes(p, b, cell)) === exact,
        s"divergence at cellSize=$cell")
    }
  }

  test("boundary points are inclusive on all four edges") {
    val p = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0), (3L, 10.0, 40.0),
      (4L, 30.0, 20.0), (5L, 9.99, 20.0)).toDF("point_id", "x", "y")
    val b = Seq((7L, 10.0, 30.0, 20.0, 40.0)).toDF("box_id", "xlo", "xhi", "ylo", "yhi")
    assert(pairs(SpatialJoin.pointsInBoxes(p, b, 7.0)) ===
      Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L)))
  }

  test("negative coordinates tile correctly (floor, not truncate-toward-zero)") {
    // a point at -0.5 sits in tile -1; int truncation would put it in
    // tile 0 and miss the box that covers only negative ground
    val p = Seq((1L, -0.5, -0.5), (2L, 0.5, 0.5)).toDF("point_id", "x", "y")
    val b = Seq((1L, -2.0, -0.1, -2.0, -0.1)).toDF("box_id", "xlo", "xhi", "ylo", "yhi")
    assert(pairs(SpatialJoin.pointsInBoxes(p, b, 1.0)) === Seq((1L, 1L)))
  }

  test("radius join equals the exhaustive distance join, boundary inclusive") {
    val l = (1 to 150).map(i =>
      (i.toLong, ((i * 37) % 100).toLong, ((i * 91) % 100).toLong))
      .toDF("point_id", "x", "y")
    val r = (1 to 80).map(i =>
      (i.toLong, ((i * 53) % 100).toLong, ((i * 67) % 100).toLong))
      .toDF("station_id", "x2", "y2")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("point_id", "station_id").as[(Long, Long)].collect().sorted.toSeq
    val d2 = ($"x" - $"x2") * ($"x" - $"x2") + ($"y" - $"y2") * ($"y" - $"y2")
    for (radius <- Seq(1.0, 7.0, 15.0)) {
      val exact = pairSet(l.crossJoin(r).filter(d2 <= radius * radius))
      val tiled = pairSet(SpatialJoin.pointsWithinRadius(l, r, radius))
      assert(tiled === exact, s"divergence at radius=$radius")
    }
    // a pair at EXACTLY the radius must be included, across a tile edge
    val lp = Seq((1L, 0L, 0L)).toDF("point_id", "x", "y")
    val rp = Seq((2L, 5L, 0L), (3L, 6L, 0L)).toDF("station_id", "x2", "y2")
    assert(pairSet(SpatialJoin.pointsWithinRadius(lp, rp, 5.0)) === Seq((1L, 2L)))
  }

  test("null coordinates/bounds match nothing; inverted and over-span boxes refuse loudly") {
    val p = Seq((1L, Some(5.0), Some(5.0)), (2L, None, Some(5.0)))
      .toDF("point_id", "x", "y")
    // null-BOUNDED box: relational null semantics, silently no match
    val b = Seq((1L, Some(0.0), Some(10.0), 0.0, 10.0),
        (2L, Some(3.0), None, 0.0, 10.0))
      .toDF("box_id", "xlo", "xhi", "ylo", "yhi")
    assert(pairs(SpatialJoin.pointsInBoxes(p, b, 2.0)) === Seq((1L, 1L)))
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    // inverted box: an upstream bug, not data — refuse with a clear error
    val inverted = Seq((2L, 10.0, 0.0, 0.0, 10.0))
      .toDF("box_id", "xlo", "xhi", "ylo", "yhi")
    val e1 = intercept[Exception](
      SpatialJoin.pointsInBoxes(p, inverted, 2.0).count())
    assert(messages(e1).contains("inverted or spans more than"))
    // one huge box would explode into millions of tiles and take the
    // whole job down — refused up front with the cellSize hint
    val huge = Seq((3L, 0.0, 1e9, 0.0, 10.0))
      .toDF("box_id", "xlo", "xhi", "ylo", "yhi")
    val e2 = intercept[Exception](
      SpatialJoin.pointsInBoxes(p, huge, 2.0).count())
    assert(messages(e2).contains("spans more than"))
  }
}
