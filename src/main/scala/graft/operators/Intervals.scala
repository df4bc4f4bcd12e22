package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval aggregation: how many intervals are ACTIVE at
  * each day — concurrent orders in flight, sessions open, resources
  * held. The naive plan joins every day against every interval
  * (days × intervals); the sweep line reduces it to boundary events.
  */
object Intervals {

  /** Daily active-interval counts over [startCol, endCol] (inclusive
    * dates, rows with null boundaries dropped).
    *
    * Shape: each interval becomes two boundary events (+1 at start,
    * −1 at end+1); events aggregate per day (ONE uniform-key shuffle —
    * this is where interval-count-sized data collapses to
    * day-count-sized); the running sum over the dense day spine is a
    * global-window prefix sum over the DAY-sized frame, bounded by the
    * calendar, not the data (same bounded-global-window argument as
    * rfm/pareto). Output: one row per day in [min(start), max(end)]
    * with the active count.
    */
  def dailyActive(
      df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val iv = df
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
    val events = iv.select(col(startCol).as("d"), lit(1L).as("delta"))
      .unionAll(iv.select(date_add(col(endCol), 1).as("d"), lit(-1L).as("delta")))
      .groupBy(col("d"))
      .agg(sum(col("delta")).as("delta"))
    val span = iv.agg(min(col(startCol)).as("d0"), max(col(endCol)).as("d1"))
    val spine = span.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    // bounded: the spine has one row per CALENDAR DAY in the data's
    // span — years of history is still thousands of rows
    val w = TotalOrder.boundedGlobal(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    TotalOrder.checkBounded(spine, "interval-day-spine")
      .join(events, Seq("d"), "left")
      .select(col("d"),
        sum(coalesce(col("delta"), lit(0L))).over(w).as("n_active"))
  }
}
