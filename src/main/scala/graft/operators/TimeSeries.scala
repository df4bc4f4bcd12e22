package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular per-key observations
  * onto a dense calendar spine and carry values forward across the gaps
  * — the standard prep step before any windowed / autoregressive feature
  * extraction over event data.
  *
  * Scale shape: the spine is generated per key with `sequence()` +
  * `explode` (map-side — each key's row count is its own date span, no
  * driver loop, no cross join against a global calendar), and the
  * forward fill is `last(value, ignoreNulls)` over a PER-KEY window —
  * partitioned by key, never a global sort. One shuffle on the key for
  * the spine join, one for the window (same key — AQE/exchange reuse
  * collapses them when partitioning matches).
  */
object TimeSeries {

  /** Daily resample + forward fill.
    *
    * Input: one row per (key, day-granularity `dateCol` observation)
    * with a numeric `valueCol` (duplicate days must be pre-aggregated by
    * the caller). Output: one row per (key, day) for every day in the
    * key's [min(date), max(date)] span, with:
    *   - `valueCol`      — the observation, null on gap days
    *   - `<value>_ffill` — last non-null observation at or before the day
    *   - `is_gap`        — true on synthesized spine days
    */
  def resampleDailyFfill(
      df: DataFrame, keyCol: String, dateCol: String, valueCol: String): DataFrame = {
    val spine = df
      .groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
          .as(dateCol))
    val joined = spine.join(df, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    joined
      .withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(valueCol).isNull)
  }
}
