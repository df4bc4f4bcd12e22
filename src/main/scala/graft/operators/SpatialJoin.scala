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
      yloCol: String = "ylo", yhiCol: String = "yhi"): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    def tile(c: org.apache.spark.sql.Column) =
      floor(c / cellSize).cast("long")
    val p = points
      .withColumn("__tx", tile(col(xCol)))
      .withColumn("__ty", tile(col(yCol)))
    val b = boxes
      .withColumn("__tx", explode(sequence(tile(col(xloCol)), tile(col(xhiCol)))))
      .withColumn("__ty", explode(sequence(tile(col(yloCol)), tile(col(yhiCol)))))
    p.join(b, Seq("__tx", "__ty"))
      .filter(
        col(xCol) >= col(xloCol) && col(xCol) <= col(xhiCol) &&
          col(yCol) >= col(yloCol) && col(yCol) <= col(yhiCol))
      .drop("__tx", "__ty")
  }
}
