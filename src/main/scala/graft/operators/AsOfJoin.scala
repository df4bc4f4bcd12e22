package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks:
  * for every left row, attach the LATEST right row whose time is <= the
  * left row's time, per key (optionally within a tolerance window).
  *
  * Implementation strategy (preference order from the build rules:
  * compose built-ins before custom plans): the union-marker trick.
  * Tag both sides, union them, and run one window pass per key ordered
  * by (time, side) carrying the last-seen right payload forward:
  *
  *   right rows sort before left rows at equal timestamps (<= semantics),
  *   last("payload", ignoreNulls) over rowsBetween(-inf, 0) resolves the
  *   match, left rows are filtered back out.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key — identical to the
  * dedicated merge-asof algorithms in kdb/pandas/QuestDB, expressed
  * relationally so Catalyst handles spill/skew/AQE. No range-join
  * explosion (a naive l.ts >= r.ts theta join is |L|×|R| per key).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param tolerance  optional max lookback: matches older than
    *                   leftTime - tolerance are dropped (null payload)
    * @return left rows + right payload columns prefixed `asof_`
    *         (null when no right row qualifies)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None): DataFrame =
    asOfDirectional(left, right, keys, leftTime, rightTime, tolerance,
      forward = false)

  /** Forward as-of: the EARLIEST right row with time >= the left row's
    * time ("next event at or after" — fill-forward's mirror, the shape
    * of next-maintenance / next-price-tick lookups). Same union-marker
    * plan with the window frame looking ahead instead of back.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None): DataFrame =
    asOfDirectional(left, right, keys, leftTime, rightTime, tolerance,
      forward = true)

  private def asOfDirectional(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c))
    val leftCols = left.columns

    // side ordering encodes the boundary inclusivity: backward wants the
    // equal-time right row VISIBLE to the frame ending at the left row
    // (right sorts first); forward wants it visible to the frame starting
    // at the left row (left sorts first)
    val (rightSide, leftSide) = if (forward) (1, 0) else (0, 1)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(rightSide).as("__side"),
        struct(rightPayloadCols.toSeq.map(col): _*).as("__payload")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(leftSide).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload"),
        struct(leftCols.toSeq.map(col): _*).as("__left")): _*)

    val unioned = taggedRight
      .withColumn("__left", lit(null).cast(taggedLeft.schema("__left").dataType))
      .unionByName(taggedLeft)

    // Tie-breaker: when the right side has duplicate (key, rightTime) rows,
    // the frame edge must deterministically resolve to ONE of them, not an
    // arbitrary partition-order row. Ordering by the whole payload struct
    // would reject non-orderable payload types (MapType fails analysis), so
    // order by the orderable payload fields only — still deterministic
    // whenever the orderable fields distinguish the duplicates, and accepts
    // any payload. Backward takes the LAST in frame (max tie-break);
    // forward takes the FIRST (min tie-break).
    val orderableTieBreak = rightPayloadCols.toSeq
      .filter(c => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
      .map(c => col("__payload").getField(c).asc_nulls_first)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ orderableTieBreak: _*)
    val (w, pick) =
      if (forward)
        (base.rowsBetween(0, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, 0),
          (c: Column) => last(c, ignoreNulls = true))
    val matched = unioned
      .withColumn("__match", pick(col("__payload")).over(w))
      .withColumn("__match_t", pick(
        when(col("__side") === rightSide, col("__t"))).over(w))
      .filter(col("__side") === leftSide)

    val withTolerance = tolerance match {
      case Some(tol) =>
        val inWindow =
          if (forward) col("__match_t") <= col("__t") + tol
          else col("__match_t") >= col("__t") - tol
        matched.withColumn("__match", when(inWindow, col("__match")))
      case None => matched
    }

    val leftOut = leftCols.toSeq.map(c => col("__left").getField(c).as(c))
    val rightOut = rightPayloadCols.toSeq.map(c =>
      col("__match").getField(c).as(s"asof_$c"))
    withTolerance.select((leftOut ++ rightOut): _*)
  }
}
