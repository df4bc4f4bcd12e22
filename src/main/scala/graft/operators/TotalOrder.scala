package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order assignment at scale — row numbers, dense group
  * indices, and identity columns WITHOUT the classic scale-killer
  * `Window.orderBy(...)` over an un-partitioned frame (which funnels the
  * whole table through ONE reducer).
  *
  * Shape: two-phase distributed prefix counting, the same pattern as
  * [[Sampling.selectByTokenBudget]]'s token prefix sum —
  *   1. range-partition on the target order (each partition holds a
  *      contiguous slice of the total order, all partitions in parallel),
  *   2. number rows WITHIN each partition (partition-local window),
  *   3. add each partition's global row offset (an aggregate with one row
  *      PER PARTITION, broadcast back).
  * The result is exactly `ROW_NUMBER() OVER (ORDER BY ...)` — bit-equal,
  * layout-invariant when the order is total — at the cost of one range
  * shuffle instead of a single-reducer sort.
  */
object TotalOrder {

  /** `ROW_NUMBER() OVER (ORDER BY order...)` as `outCol`, distributed.
    *
    * The caller's `order` should be TOTAL (tie-break on a unique id) —
    * with ties the assignment within a tie group is arbitrary, exactly
    * like the window function it replaces.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], outCol: String = "rn"): DataFrame = {
    // freeze the input before the range shuffle: repartitionByRange
    // samples its input to pick boundaries, which would recompute an
    // expensive upstream a second time
    val slim = df.localCheckpoint(true)
    val n = slim.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = slim
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze partition ids for both passes
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__part_rows"))
      .select(col("__pid"),
        coalesce(
          sum(col("__part_rows")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__offset")) // tiny: one row per partition
    val within = Window.partitionBy(col("__pid")).orderBy(order: _*)
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__offset") + row_number().over(within))
      .drop("__pid", "__offset")
  }

  /** Stable identity column: 1..n in `order`. Alias of [[rowNumber]]
    * with the intent name — the lakehouse "generated identity" column
    * (monotonically_increasing_id leaves gaps; this does not).
    */
  def identityColumn(df: DataFrame, order: Seq[Column], outCol: String = "id"): DataFrame =
    rowNumber(df, order, outCol)

  /** `DENSE_RANK() OVER (ORDER BY keys...)` distributed: a dense 1..k
    * index over the DISTINCT key tuples (k = distinct count), joined
    * back. The distinct side is corpus-small (group cardinality), so the
    * back-join broadcasts when it fits.
    */
  def denseIndex(df: DataFrame, keys: Seq[String], outCol: String = "idx"): DataFrame = {
    val distinctKeys = df.select(keys.map(col): _*).distinct()
    val indexed = rowNumber(distinctKeys, keys.map(c => col(c).asc), outCol)
    df.join(broadcast(indexed), keys)
  }
}
