package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("resampleDailyFfill fills gaps and carries values forward") {
    val obs = Seq(
      (1L, d("2024-01-01"), 10.0),
      (1L, d("2024-01-04"), 40.0),
      (2L, d("2024-02-10"), 5.0)
    ).toDF("k", "dt", "v")
    val out = TimeSeries.resampleDailyFfill(obs, "k", "dt", "v")
      .orderBy("k", "dt")
      .select("k", "dt", "v", "v_ffill", "is_gap")
      .as[(Long, Date, Option[Double], Option[Double], Boolean)]
      .collect()
    assert(out.toSeq === Seq(
      (1L, d("2024-01-01"), Some(10.0), Some(10.0), false),
      (1L, d("2024-01-02"), None, Some(10.0), true),
      (1L, d("2024-01-03"), None, Some(10.0), true),
      (1L, d("2024-01-04"), Some(40.0), Some(40.0), false),
      (2L, d("2024-02-10"), Some(5.0), Some(5.0), false)))
  }

  test("single-observation keys produce a one-row spine") {
    val obs = Seq((9L, d("2023-06-15"), 1.5)).toDF("k", "dt", "v")
    val out = TimeSeries.resampleDailyFfill(obs, "k", "dt", "v")
    assert(out.count() === 1)
    assert(out.filter(col("is_gap")).count() === 0)
  }

  test("spine length equals the span per key") {
    val obs = Seq(
      (1L, d("2024-01-01"), 1.0),
      (1L, d("2024-03-01"), 2.0)
    ).toDF("k", "dt", "v")
    val out = TimeSeries.resampleDailyFfill(obs, "k", "dt", "v")
    // Jan 1 .. Mar 1 2024 inclusive = 31 + 29 + 1 (leap year)
    assert(out.count() === 61)
    assert(out.filter(col("is_gap")).count() === 59)
  }

  test("integer z-score: spike flags, steady days don't, current day excluded") {
    // key 1: 7 steady days at 100 with noise ±2, then a 200 spike.
    val obs = ((1 to 7).map(i => (1L, d(f"2024-01-0$i"), 98L + (i % 5))) :+
      (1L, d("2024-01-08"), 200L)).toDF("k", "dt", "v")
    val out = TimeSeries.integerZScoreAnomalies(obs, "k", "dt", "v")
      .collect().map(r => r.getDate(1).toString -> r.getBoolean(4)).toMap
    assert(out("2024-01-08"))                       // the spike
    assert(!(1 to 7).exists(i => out(f"2024-01-0$i"))) // steady days clean
  }

  test("integer z-score: zero-variance window flags any deviation, not equality") {
    val obs = ((1 to 5).map(i => (1L, d(f"2024-01-0$i"), 100L)) ++
      Seq((1L, d("2024-01-06"), 101L), (1L, d("2024-01-07"), 100L)))
      .toDF("k", "dt", "v")
    val out = TimeSeries.integerZScoreAnomalies(obs, "k", "dt", "v")
      .collect().map(r => r.getDate(1).toString -> r.getBoolean(4)).toMap
    assert(out("2024-01-06"))     // any deviation from zero variance
    assert(!out("2024-01-05"))    // equal to the window mean
  }

  test("integer z-score: needs minPrevDays history before it may flag") {
    val obs = Seq(
      (1L, d("2024-01-01"), 100L), (1L, d("2024-01-02"), 9999L)
    ).toDF("k", "dt", "v")
    val out = TimeSeries.integerZScoreAnomalies(obs, "k", "dt", "v")
      .collect().map(r => r.getDate(1).toString -> r.getBoolean(4)).toMap
    assert(out.values.forall(_ == false))
  }

  test("linear interpolation: gap days sit on the line between neighbors") {
    val obs = Seq(
      (1L, d("2024-01-01"), 10L),
      (1L, d("2024-01-04"), 40L),  // 3-day span: gaps at 20, 30
      (1L, d("2024-01-06"), 30L)   // 2-day span: gap at 35
    ).toDF("k", "dt", "v")
    val out = TimeSeries.resampleDailyInterpolate(obs, "k", "dt", "v")
      .orderBy("dt")
      .select("dt", "v_interp", "is_gap")
      .as[(Date, Double, Boolean)]
      .collect()
    assert(out.toSeq === Seq(
      (d("2024-01-01"), 10.0, false),
      (d("2024-01-02"), 20.0, true),
      (d("2024-01-03"), 30.0, true),
      (d("2024-01-04"), 40.0, false),
      (d("2024-01-05"), 35.0, true),
      (d("2024-01-06"), 30.0, false)))
  }

  test("interpolation: observed days pass through exactly, spine spans obs only") {
    // no gap day exists before the first / after the last observation,
    // so the no-extrapolation contract holds by construction
    val obs = Seq(
      (1L, d("2024-01-02"), 7L), (1L, d("2024-01-03"), 9L)
    ).toDF("k", "dt", "v")
    val out = TimeSeries.resampleDailyInterpolate(obs, "k", "dt", "v")
    assert(out.count() === 2)
    assert(out.filter(col("is_gap")).count() === 0)
    assert(out.filter(col("v_interp").isNull).count() === 0)
  }

  test("interpolation is partition-layout invariant (exact arithmetic)") {
    val obs = (1 to 28).filter(i => i % 3 == 1).map(i =>
      (i % 2L, d(f"2024-01-$i%02d"), (i * 53 % 400).toLong))
      .toDF("k", "dt", "v")
    val a = TimeSeries.resampleDailyInterpolate(obs.repartition(1), "k", "dt", "v")
      .orderBy("k", "dt").select("k", "dt", "v_interp").collect().toSeq
    val b = TimeSeries.resampleDailyInterpolate(obs.repartition(11), "k", "dt", "v")
      .orderBy("k", "dt").select("k", "dt", "v_interp").collect().toSeq
    assert(a === b)
  }

  test("integer z-score: flags are partition-layout invariant (integer math)") {
    val obs = (1 to 30).map(i =>
      (i % 3L, d(f"2024-01-$i%02d"), (i * 37 % 200).toLong))
      .toDF("k", "dt", "v")
    val a = TimeSeries.integerZScoreAnomalies(obs.repartition(1), "k", "dt", "v")
      .orderBy("k", "dt").collect().toSeq
    val b = TimeSeries.integerZScoreAnomalies(obs.repartition(13), "k", "dt", "v")
      .orderBy("k", "dt").collect().toSeq
    assert(a === b)
  }

  test("a real observed row with a NULL value is not labeled a gap") {
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), Some(5.0)),
      (1L, java.sql.Date.valueOf("2024-01-02"), Option.empty[Double]),
      (1L, java.sql.Date.valueOf("2024-01-04"), Some(9.0)))
      .toDF("k", "d", "v")
    val out = TimeSeries.resampleDailyFfill(df, "k", "d", "v")
      .select(col("d").cast("string"), col("is_gap"))
      .as[(String, Boolean)].collect().toMap
    assert(out("2024-01-02") === false) // observed, value unknown
    assert(out("2024-01-03") === true)  // synthesized spine day
    val interp = TimeSeries.resampleDailyInterpolate(df, "k", "d", "v")
      .select(col("d").cast("string"), col("is_gap"))
      .as[(String, Boolean)].collect().toMap
    assert(interp("2024-01-02") === false && interp("2024-01-03") === true)
  }
}
