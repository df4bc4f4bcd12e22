package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D spatial join — points against axis-aligned boxes — the
  * geospatial sibling of [[RangeJoin]]: vanilla Spark plans
  * `x BETWEEN xlo AND xhi AND y BETWEEN ylo AND yhi` as a nested-loop
  * join (O(|P|·|B|) compares).
  *
  * Grid-tile rewrite: quantize the plane into `cellSize`-wide square
  * tiles; a point lands in exactly ONE tile, a box is exploded over
  * every tile it covers, the two sides equi-join on the tile id, and
  * the exact containment predicate re-checks. Compares drop to pairs
  * sharing a tile — the uniform-grid strategy spatial databases start
  * from (and the degenerate single-level case of their quad-trees).
  * No pair dedup is needed: the point's single tile is the unique
  * meeting place for any (point, box) pair.
  *
  * Cell sizing is the usual replication/selectivity trade: ≈ the median
  * box side keeps box replication near O(1) per box. Boxes spanning
  * huge tile ranges replicate proportionally — cap their explosion by
  * clamping `cellSize` up, exactly like [[RangeJoin]]'s bucketWidth.
  */
object SpatialJoin {

  /** Grid coordinate of a value at the given tile width. */
  private def tile(c: org.apache.spark.sql.Column, width: Double) =
    floor(c / width).cast("long")

  /** @param points   one row per point: (`pidCol`, `xCol`, `yCol`)
    * @param boxes    one row per box: (`bidCol`, xlo, xhi, ylo, yhi),
    *                 bounds inclusive
    * @param cellSize tile width in the coordinates' own unit
    * @return (point id, box id) + both payloads for every containment
    */
  def pointsInBoxes(
      points: DataFrame,
      boxes: DataFrame,
      cellSize: Double,
      xCol: String = "x", yCol: String = "y",
      xloCol: String = "xlo", xhiCol: String = "xhi",
      yloCol: String = "ylo", yhiCol: String = "yhi",
      maxTilesPerAxis: Long = 10000L): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    require(maxTilesPerAxis > 0,
      s"maxTilesPerAxis must be positive, got $maxTilesPerAxis")
    // refuse malformed/huge boxes LOUDLY before exploding: an inverted
    // box makes sequence() count DOWNWARD (this repo's 3×-recurring bug
    // class), and one extreme box (xhi ≫ xlo, or a corrupt coordinate)
    // would otherwise generate an enormous / Spark-limit-exceeding tile
    // sequence and fail the whole job with an opaque runtime error.
    // Null-BOUNDED boxes keep relational semantics (match nothing, like
    // a null join key); only inverted/over-span boxes raise.
    def guardedTile(lo: String, hi: String, axis: String) = {
      val err = raise_error(concat(
        lit(s"pointsInBoxes: box $axis range ["), col(lo).cast("string"),
        lit(", "), col(hi).cast("string"),
        lit(s"] is inverted or spans more than " +
          s"$maxTilesPerAxis tiles at cellSize=$cellSize — fix the box " +
          "or raise cellSize/maxTilesPerAxis")))
      val (tlo, thi) = (tile(col(lo), cellSize), tile(col(hi), cellSize))
      explode(
        when(col(lo).isNull || col(hi).isNull,
          lit(null).cast("array<bigint>"))
          .when(col(lo) <= col(hi) && (thi - tlo) < maxTilesPerAxis,
            sequence(tlo, thi))
          .otherwise(err))
    }
    val p = points
      .withColumn("__tx", tile(col(xCol), cellSize))
      .withColumn("__ty", tile(col(yCol), cellSize))
    val b = boxes
      .withColumn("__tx", guardedTile(xloCol, xhiCol, "x"))
      .withColumn("__ty", guardedTile(yloCol, yhiCol, "y"))
    p.join(b, Seq("__tx", "__ty"))
      .filter(
        col(xCol) >= col(xloCol) && col(xCol) <= col(xhiCol) &&
          col(yCol) >= col(yloCol) && col(yCol) <= col(yhiCol))
      .drop("__tx", "__ty")
  }

  /** Distance join: pairs of (left point, right point) within `radius`
    * (Euclidean, inclusive) — the other classic spatial-join shape
    * (nearest-station, points-of-interest, collision candidates).
    *
    * Tiles are `radius`-wide, so a qualifying partner can only sit in
    * the point's own tile or one of its 8 neighbours: the LEFT side is
    * exploded over that 3×3 neighbourhood (9× replication, fixed and
    * radius-independent), the right side keeps one row per point, and
    * the equi-join on the tile id bounds compares to co-located pairs.
    * The exact check compares SQUARED distance to radius² — integral
    * coordinates stay in exact integer arithmetic end-to-end (no sqrt,
    * no FP boundary flakes; the gate pins that contract).
    *
    * Column contract: left has (`xCol`, `yCol`), right has
    * (`x2Col`, `y2Col`); remaining columns pass through.
    */
  def pointsWithinRadius(
      left: DataFrame,
      right: DataFrame,
      radius: Double,
      xCol: String = "x", yCol: String = "y",
      x2Col: String = "x2", y2Col: String = "y2"): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val l = left
      .withColumn("__o", explode(offsets))
      .withColumn("__tx", tile(col(xCol), radius) + col("__o.dx"))
      .withColumn("__ty", tile(col(yCol), radius) + col("__o.dy"))
      .drop("__o")
    val r = right
      .withColumn("__tx", tile(col(x2Col), radius))
      .withColumn("__ty", tile(col(y2Col), radius))
    val d2 = (col(xCol) - col(x2Col)) * (col(xCol) - col(x2Col)) +
      (col(yCol) - col(y2Col)) * (col(yCol) - col(y2Col))
    l.join(r, Seq("__tx", "__ty"))
      .filter(d2 <= radius * radius)
      .drop("__tx", "__ty")
  }
}
