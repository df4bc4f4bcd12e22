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
}
