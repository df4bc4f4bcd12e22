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
  /** Per-key daily spine over [min(date), max(date)] — shared by both
    * resamplers.
    */
  private def dailySpine(df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
          .as(dateCol))

  /** Join the spine to the observations with an explicit observed
    * marker: `is_gap` must mean "synthesized spine day", and a REAL
    * input row whose value happens to be null is still an observed day
    * (valueCol IS NULL would mislabel it).
    */
  private def spineJoined(
      df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    dailySpine(df, keyCol, dateCol)
      .join(df.withColumn("__obs", lit(true)), Seq(keyCol, dateCol), "left")

  def resampleDailyFfill(
      df: DataFrame, keyCol: String, dateCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spineJoined(df, keyCol, dateCol)
      .withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("__obs").isNull)
      .drop("__obs")
  }

  /** Exact integer z-score anomaly flags: each observation is compared
    * against the trailing window of the PREVIOUS `lookbackDays` days
    * (current day excluded — today must not explain itself), flagged
    * when its squared z-score exceeds `zThreshold`².
    *
    * The entire test runs in INTEGER arithmetic: with n, s1 = Σx,
    * s2 = Σx² over the window and observation v (all integral, e.g.
    * cents),
    *
    *   z² > t²  ⟺  (v·n − s1)² · (n−1) > t² · n · (n·s2 − s1²)
    *
    * so the flag is bit-reproducible on any engine and any partition
    * layout — no floating-point variance in sight (same philosophy as
    * the a16/a17 cents-domain percentiles). Zero-variance windows flag
    * any deviation; an observation equal to the mean never flags.
    *
    * Input: one row per (key, date) with an integral `valueCol`.
    * Scale: one per-key RANGE window pass — no global sort, no shuffle
    * beyond the key partitioning.
    */
  def integerZScoreAnomalies(
      df: DataFrame, keyCol: String, dateCol: String, valueCol: String,
      lookbackDays: Int = 7, minPrevDays: Int = 3,
      zThreshold: Int = 3): DataFrame = {
    // widen BEFORE any product: an IntegerType valueCol wraps at
    // |v| >= 46341 inside v*v. (The Long math itself is exact for
    // |v| up to ~1e8 at the default window — beyond that, move the
    // values to a coarser unit first.)
    val v = col(valueCol).cast("long")
    val pw = Window.partitionBy(col(keyCol))
      .orderBy(datediff(col(dateCol), to_date(lit("1970-01-01"))))
      .rangeBetween(-lookbackDays, -1)
    val t2 = zThreshold.toLong * zThreshold
    df.select(col(keyCol), col(dateCol), v,
        count(v).over(pw).as("n_prev"),
        coalesce(sum(v).over(pw), lit(0L)).as("__s1"),
        coalesce(sum(v * v).over(pw), lit(0L)).as("__s2"))
      .withColumn("is_anomaly",
        col("n_prev") >= minPrevDays &&
          (v * col("n_prev") - col("__s1")) * (v * col("n_prev") - col("__s1")) *
            (col("n_prev") - 1) >
          lit(t2) * col("n_prev") *
            (col("n_prev") * col("__s2") - col("__s1") * col("__s1")))
      .drop("__s1", "__s2")
  }

  /** Daily resample + LINEAR interpolation — the companion to
    * [[resampleDailyFfill]] for quantities where a gap means "the value
    * moved smoothly", not "the value held" (sensor readings, balances).
    *
    * Gap days get `prev + (next − prev) · elapsed/span` between their
    * nearest observed neighbors. Because the spine spans exactly
    * [min(date), max(date)] per key, every gap day has BOTH neighbors —
    * no extrapolation case exists by construction.
    *
    * Output: one row per (key, day) with
    *   - `valueCol`        — the observation, null on gap days
    *   - `<value>_interp`  — observation on observed days, linear
    *                         interpolation on gap days (DOUBLE)
    *   - `is_gap`          — true on synthesized spine days
    *
    * Scale shape: identical to [[resampleDailyFfill]] — per-key spine
    * via `sequence()` + `explode` (no global calendar cross join), then
    * two per-key window passes (backward last-non-null, forward
    * first-non-null) over the SAME partitioning, so the exchange is
    * planned once.
    */
  def resampleDailyInterpolate(
      df: DataFrame, keyCol: String, dateCol: String, valueCol: String): DataFrame = {
    val joined = spineJoined(df, keyCol, dateCol)
    val v = col(valueCol)
    val wBack = Window.partitionBy(col(keyCol)).orderBy(col(dateCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = Window.partitionBy(col(keyCol)).orderBy(col(dateCol).asc)
      .rowsBetween(0, Window.unboundedFollowing)
    val obsDate = when(v.isNotNull, col(dateCol))
    joined
      .withColumn("__pv", last(v, ignoreNulls = true).over(wBack))
      .withColumn("__pd", last(obsDate, ignoreNulls = true).over(wBack))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wFwd))
      .withColumn("__nd", first(obsDate, ignoreNulls = true).over(wFwd))
      .withColumn(s"${valueCol}_interp",
        when(v.isNotNull, v.cast("double"))
          .otherwise(
            col("__pv").cast("double") +
              (col("__nv").cast("double") - col("__pv").cast("double")) *
              datediff(col(dateCol), col("__pd")) /
              datediff(col("__nd"), col("__pd"))))
      .withColumn("is_gap", col("__obs").isNull)
      .drop("__pv", "__pd", "__nv", "__nd", "__obs")
  }
}
