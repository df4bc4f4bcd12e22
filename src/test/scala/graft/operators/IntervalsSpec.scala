package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Intervals.dailyActive]]'s sweep-line counting against hand
  * values and the naive day×interval join on random intervals.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("dailyActive: hand-checked overlaps, inclusive boundaries") {
    val iv = Seq(
      (d("2024-01-01"), d("2024-01-03")),
      (d("2024-01-02"), d("2024-01-02")),  // single-day interval
      (d("2024-01-05"), d("2024-01-06"))   // gap day Jan 4 has zero
    ).toDF("s", "e")
    val out = Intervals.dailyActive(iv, "s", "e")
      .orderBy("d").as[(Date, Long)].collect().toSeq
    assert(out === Seq(
      (d("2024-01-01"), 1L), (d("2024-01-02"), 2L), (d("2024-01-03"), 1L),
      (d("2024-01-04"), 0L), (d("2024-01-05"), 1L), (d("2024-01-06"), 1L)))
  }

  test("dailyActive equals the naive day-by-interval join on random intervals") {
    val rnd = new scala.util.Random(7)
    val base = d("2024-03-01").toLocalDate
    val ivs = (1 to 200).map { _ =>
      val s = base.plusDays(rnd.nextInt(60))
      (Date.valueOf(s), Date.valueOf(s.plusDays(rnd.nextInt(15))))
    }
    val df = ivs.toDF("s", "e")
    val got = Intervals.dailyActive(df, "s", "e")
      .as[(Date, Long)].collect().toMap
    // naive: count intervals covering each day of the spine
    val lo = ivs.map(_._1.toLocalDate).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val hi = ivs.map(_._2.toLocalDate).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).foreach { day =>
      val expect = ivs.count { case (s, e) =>
        !day.isBefore(s.toLocalDate) && !day.isAfter(e.toLocalDate) }
      assert(got(Date.valueOf(day)) === expect.toLong, s"day $day")
    }
  }

  test("dailyActive drops null and inverted intervals") {
    val iv = Seq(
      (Option(d("2024-01-01")), Option(d("2024-01-02"))),
      (None, Option(d("2024-01-05"))),
      (Option(d("2024-01-09")), None),
      (Option(d("2024-01-08")), Option(d("2024-01-07")))  // inverted
    ).toDF("s", "e")
    val out = Intervals.dailyActive(iv, "s", "e")
      .as[(Date, Long)].collect().toMap
    assert(out === Map(d("2024-01-01") -> 1L, d("2024-01-02") -> 1L))
  }
}
