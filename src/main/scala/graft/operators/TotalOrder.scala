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

  /** Distributed running aggregates over a global order — the general
    * form of [[rowNumber]] for `SUM(x) OVER (ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` (prefix sums) and `LAST_VALUE(x IGNORE NULLS) OVER
    * (ORDER BY …)` (prefix max of an orderable value — the last non-null
    * in sort order IS the max of `struct(orderKey…, payload)`).
    *
    * Same two-phase shape: range partition on the order, aggregate once
    * per PARTITION (a ≤`shuffle.partitions`-row frame — the only global
    * window, bounded by construction), broadcast the per-partition
    * prefix offsets back, and combine with the partition-local running
    * aggregate. One range shuffle, no single-reducer sort, bit-equal to
    * the un-partitioned window when the order is total.
    *
    * `sums` / `maxes` map input column → output column. `rnCol`
    * additionally emits `ROW_NUMBER() OVER (ORDER BY order…)`, sharing
    * the same shuffle. Max offsets combine via `greatest` (null-skipping,
    * matching `IGNORE NULLS`); sum inputs follow SQL sum null-skipping.
    */
  def prefixAggs(
      df: DataFrame,
      order: Seq[Column],
      sums: Seq[(String, String)] = Nil,
      maxes: Seq[(String, String)] = Nil,
      rnCol: Option[String] = None): DataFrame = {
    val slim = df.localCheckpoint(true)
    val n = slim.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = slim
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val perPart = ranged.groupBy(col("__pid")).agg(
      count(lit(1)).as("__part_rows"),
      (sums.map { case (in, _) => sum(col(in)).as(s"__s_$in") } ++
        maxes.map { case (in, _) => max(col(in)).as(s"__m_$in") }): _*)
    val wPrev = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // distinct offset prefixes per aggregate KIND: one column in both
    // `sums` and `maxes` (running total + running high-water-mark of
    // the same metric) must not collide into one ambiguous __off name
    val offsets = perPart.select(
      col("__pid") +:
        (Seq(coalesce(sum(col("__part_rows")).over(wPrev), lit(0L)).as("__rn_off")) ++
          sums.map { case (in, _) =>
            sum(col(s"__s_$in")).over(wPrev).as(s"__soff_$in") } ++
          maxes.map { case (in, _) =>
            max(col(s"__m_$in")).over(wPrev).as(s"__moff_$in") }): _*)
    val within = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    var out = ranged.join(broadcast(offsets), Seq("__pid"))
    for ((in, outC) <- sums) out = out.withColumn(outC,
      when(col(s"__soff_$in").isNull, sum(col(in)).over(within))
        .otherwise(col(s"__soff_$in") + coalesce(sum(col(in)).over(within), lit(0))))
    for ((in, outC) <- maxes) out = out.withColumn(outC,
      greatest(col(s"__moff_$in"), max(col(in)).over(within)))
    for (rc <- rnCol) out = out.withColumn(rc,
      col("__rn_off") + row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
    out.drop(("__pid" +: "__rn_off" +:
      (sums.map { case (in, _) => s"__soff_$in" } ++
        maxes.map { case (in, _) => s"__moff_$in" })): _*)
  }

  /** `SUM(valueCol) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`
    * distributed — running total without the single-reducer sort.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
      outCol: String): DataFrame =
    prefixAggs(df, order, sums = Seq(valueCol -> outCol))

  /** [[rowNumber]] plus the total count broadcast onto every row — the
    * distributed form of the `ROW_NUMBER() OVER (ORDER BY …)` +
    * `COUNT(*) OVER ()` pair that exact order statistics (medians,
    * quantile cut rows, ECDF positions) are built from. The count side
    * re-executes only the cheap tail above [[rowNumber]]'s internal
    * checkpoint, and the 1-row frame broadcasts.
    */
  def rowNumberWithCount(df: DataFrame, order: Seq[Column],
      rnCol: String = "rn", nCol: String = "n"): DataFrame = {
    val ranked = rowNumber(df, order, rnCol)
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as(nCol))))
  }

  /** `NTILE(k) OVER (ORDER BY order...)` distributed: [[rowNumber]] plus
    * the standard larger-buckets-first assignment (first `n % k` buckets
    * get `n/k + 1` rows) — bit-equal to the window `ntile`, one range
    * shuffle + a broadcast count instead of a single-reducer sort.
    */
  def ntile(df: DataFrame, order: Seq[Column], k: Int,
      outCol: String): DataFrame = {
    val withRn = rowNumber(df, order, "__ntile_rn")
    val cnt = withRn.agg(count(lit(1)).as("__ntile_n"))
    val rn = col("__ntile_rn"); val n = col("__ntile_n")
    // Column `/` is double division — floor() restores the integer-div
    // semantics of the ntile formula (row counts stay well under 2^53).
    val q = floor(n / k); val r = n % k
    withRn.crossJoin(broadcast(cnt))
      .withColumn(outCol,
        when(rn <= r * (q + 1), floor((rn - 1) / (q + 1)) + 1)
          .otherwise(r + floor((rn - r * (q + 1) - 1) / q) + 1)
          .cast("int"))
      .drop("__ntile_rn", "__ntile_n")
  }

  /** `DENSE_RANK() OVER (ORDER BY keys...)` distributed: a dense 1..k
    * index over the DISTINCT key tuples (k = distinct count), joined
    * back. The distinct side is group-cardinality-sized, so Catalyst
    * auto-broadcasts it when it fits — deliberately NOT a broadcast()
    * hint, which would force a high-cardinality key set through the
    * driver instead of falling back to a shuffled hash join.
    */
  def denseIndex(df: DataFrame, keys: Seq[String], outCol: String = "idx"): DataFrame = {
    val distinctKeys = df.select(keys.map(col): _*).distinct()
    val indexed = rowNumber(distinctKeys, keys.map(c => col(c).asc), outCol)
    // null-safe join-back: distinct() emits a null-key tuple and the
    // window form ranks it, so a plain equality join would silently
    // drop every null-keyed input row from the "bit-equal" result
    val l = df.as("l"); val r = indexed.as("r")
    val cond = keys.map(c => col(s"l.$c") <=> col(s"r.$c")).reduce(_ && _)
    l.join(r, cond)
      .select(keys.map(c => col(s"l.$c").as(c)) ++
        df.columns.filterNot(keys.contains).map(c => col(s"l.$c").as(c)) :+
        col(s"r.$outCol").as(outCol): _*)
  }
}
