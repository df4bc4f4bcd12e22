package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries guarantees against exact counts, on skewed data, across
  * partition merges: every key with true count > n/(k+1) survives into
  * the sketch, and reported counts are lower bounds within n/(k+1).
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] = {
    FreqSketchAgg.register(spark)
    df.agg(FreqSketchAgg.freqSketch($"key", k).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.key", $"e.count_lower")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("heavy keys survive with sound lower bounds, under any partitioning (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val k = 10
      // zipf-ish: a few heavy keys + a long uniform tail
      val rows: Seq[Long] =
        Seq.fill(3000)(rnd.nextInt(5).toLong) ++          // heavy: 0..4
        Seq.fill(3000)(100L + rnd.nextInt(2000))          // tail
      val n = rows.size.toLong
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = n / (k + 1)

      Seq(1, 7, 32).foreach { parts =>
        val got = sketch(rows.toDF("key").repartition(parts), k)
        assert(got.size <= k)
        exact.filter(_._2 > threshold).keys.foreach { hk =>
          assert(got.contains(hk),
            s"seed $seed parts $parts: heavy key $hk (n=${exact(hk)}) missing")
        }
        got.foreach { case (key, lower) =>
          val truth = exact.getOrElse(key, 0L)
          assert(lower <= truth, s"overcount: $key $lower > $truth")
          assert(truth - lower <= threshold,
            s"bound too loose: $key $lower vs $truth (threshold $threshold)")
        }
      }
    }
  }

  test("fewer distinct keys than k: exact counts, no decrements") {
    val rows = (Seq.fill(40)(1L) ++ Seq.fill(25)(2L) ++ Seq.fill(5)(3L))
    val got = sketch(rows.toDF("key").repartition(8), k = 10)
    assert(got == Map(1L -> 40L, 2L -> 25L, 3L -> 5L))
  }
}
