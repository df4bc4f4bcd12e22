package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.IronmanExprs
import graft.operators.Merge

/** Generator-driven properties for the engine's load-bearing algebraic
  * invariants (SURVEY §5's property-test list). Each generated sample is
  * a BATCH — one DataFrame pass checks hundreds of cases, so the suite
  * stays Spark-job-cheap while the generators roam the input space
  * (the null/zero/duplicate corners example tests under-sample).
  * Seeds are fixed: a failure reproduces, every run covers the same
  * ground (scalatestplus isn't in the offline cache, so the generators
  * are driven directly).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("parse_time_to_seconds inverts the H:MM:SS formatter for every positive duration") {
    val gen = Gen.listOfN(300, Gen.chooseNum(1L, 99L * 3600 + 59 * 60 + 59))
    samples(gen, 5, 11L).foreach { secs =>
      val df = secs.toDF("s")
        .withColumn("fmt", IronmanExprs.formatSeconds(col("s")))
        .withColumn("back", IronmanExprs.parseTimeToSeconds(col("fmt")))
      assert(df.filter(!(col("back") <=> col("s"))).count() === 0L)
    }
  }

  test("parse_time_to_seconds: zero and null map to null (the D1 sentinel rule)") {
    val df = Seq(Some("0:00:00"), Some("00:00"), None).toDF("t")
      .withColumn("s", IronmanExprs.parseTimeToSeconds(col("t")))
    assert(df.filter(col("s").isNotNull).count() === 0L)
  }

  // driver-side multiset view: the generated frames are tiny, and
  // exceptAll over same-lineage frames trips a Catalyst attribute-
  // rebinding internal error — plain value comparison sidesteps it
  private def multiset(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.length }

  test("insert-only merge is idempotent and never updates (any key/value mix)") {
    val rowGen = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 25L), Gen.alphaStr.map(_.take(4))))
    samples(Gen.zip(rowGen, rowGen), 5, 23L).foreach { case (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val once = Merge.insertOnly(target, source, Seq("k"))
      val twice = Merge.insertOnly(once, source, Seq("k"))
      val (m1, m2) = (multiset(once), multiset(twice))
      // idempotent: the second application adds nothing
      assert(m1 === m2)
      // never updates: target rows survive verbatim
      multiset(target).foreach { case (r, n) => assert(m1.getOrElse(r, 0) >= n) }
      // complete: every source key present afterwards
      val keysAfter = m1.keySet.map(_.head)
      source.collect().foreach(r => assert(keysAfter.contains(r.get(0))))
    }
  }

  test("SCD1 merge is idempotent and keeps exactly the key union (any key/value mix)") {
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0, 999)))
    samples(Gen.zip(rowGen, rowGen), 5, 37L).foreach { case (t, s) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val once = Merge.scd1(target, source, Seq("k"), updateCols = Seq("v"))
      val twice = Merge.scd1(once, source, Seq("k"), updateCols = Seq("v"))
      assert(multiset(once) === multiset(twice))
      // matched keys carry the SOURCE value; key set = the union
      val sourceMap = source.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val onceRows = once.collect().map(r => r.getLong(0) -> r.getInt(1))
      assert(onceRows.length === onceRows.map(_._1).distinct.length)
      onceRows.foreach { case (k, v) =>
        sourceMap.get(k).foreach(sv => assert(v === sv, s"key $k kept stale value"))
      }
      val targetKeys = target.collect().map(_.getLong(0)).toSet
      assert(onceRows.map(_._1).toSet === (targetKeys ++ sourceMap.keySet))
    }
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted-distinct arrays") {
    graft.expressions.ArrayExprs.register(spark)
    val arrGen = Gen.listOfN(120, Gen.zip(
      Gen.listOf(Gen.oneOf("a", "b", "cc", "d", "e", "foo", "g", "h")),
      Gen.listOf(Gen.oneOf("a", "b", "cc", "d", "x", "foo", "y", "h"))))
    samples(arrGen, 5, 53L).foreach { pairs =>
      val df = pairs.toDF("xs", "ys").select(
        array_sort(array_distinct(col("xs"))).as("a"),
        array_sort(array_distinct(col("ys"))).as("b"))
      val bad = df.filter(
        graft.expressions.ArrayExprs.sortedIntersectSize(col("a"), col("b"))
          =!= size(array_intersect(col("a"), col("b"))))
      assert(bad.count() === 0L)
    }
  }

  test("MinHash signatures are token-order invariant (set semantics)") {
    graft.expressions.MinHashAgg.register(spark)
    val tokGen = Gen.listOfN(60,
      Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")))
    samples(tokGen, 5, 71L).foreach { docs =>
      val rng = new scala.util.Random(7)
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.distinct, rng.shuffle(ts.distinct)) }
        .toDF("id", "t1", "t2")
      val bad = df.filter(
        graft.expressions.MinHashAgg.minhashSigArr(col("t1"), 16) =!=
          graft.expressions.MinHashAgg.minhashSigArr(col("t2"), 16))
      assert(bad.count() === 0L)
    }
  }
}
