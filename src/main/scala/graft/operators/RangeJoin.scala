package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — `point BETWEEN lo AND hi` per key — another
  * operator vanilla Spark plans poorly: without an equi-predicate the
  * planner falls back to BroadcastNestedLoopJoin (O(|L|·|R|) compares).
  *
  * Bucketed rewrite: quantize points to fixed-width buckets, explode
  * each interval over every bucket it spans, equi-join on (key, bucket),
  * then re-check the exact predicate. Compares drop from |L|·|R| to
  * pairs sharing a bucket — the interval-join strategy databases
  * implement natively, composed from Spark built-ins so Catalyst owns
  * distribution. Bucket width tunes the replication/selectivity
  * trade-off (≈ median interval width is the usual choice).
  */
object RangeJoin {

  /** @param points     left side, one row per point
    * @param intervals  right side, one row per [lo, hi] interval
    * @param keys       equi-key columns present on both sides (may be empty)
    * @param pointCol   numeric point column on `points`
    * @param loCol,hiCol numeric bounds on `intervals` (inclusive)
    * @param bucketWidth quantization width (same unit as the columns)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    val bucketedPoints = points.withColumn(
      "__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val bucketedIntervals = intervals.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    bucketedPoints
      .join(bucketedIntervals, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
