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
      tolerance: Option[Column] = None): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => keys.contains(c))
    val leftCols = left.columns

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightPayloadCols.toSeq.map(col): _*).as("__payload")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload"),
        struct(leftCols.toSeq.map(col): _*).as("__left")): _*)

    val unioned = taggedRight
      .withColumn("__left", lit(null).cast(taggedLeft.schema("__left").dataType))
      .unionByName(taggedLeft)

    // right (side 0) sorts before left (side 1) at equal times => "<=".
    // Tie-breaker: when the right side has duplicate (key, rightTime) rows,
    // last() must deterministically resolve to ONE of them, not an arbitrary
    // partition-order row. Ordering by the whole payload struct would reject
    // non-orderable payload types (MapType fails analysis), so order by the
    // orderable payload fields only — still deterministic whenever the
    // orderable fields distinguish the duplicates, and accepts any payload.
    val orderableTieBreak = rightPayloadCols.toSeq
      .filter(c => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(c).dataType))
      .map(c => col("__payload").getField(c).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ orderableTieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(
        when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withTolerance = tolerance match {
      case Some(tol) =>
        matched.withColumn(
          "__match",
          when(col("__match_t") >= col("__t") - tol, col("__match")))
      case None => matched
    }

    val leftOut = leftCols.toSeq.map(c => col("__left").getField(c).as(c))
    val rightOut = rightPayloadCols.toSeq.map(c =>
      col("__match").getField(c).as(s"asof_$c"))
    withTolerance.select((leftOut ++ rightOut): _*)
  }
}
