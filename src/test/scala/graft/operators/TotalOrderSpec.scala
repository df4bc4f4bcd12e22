package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TotalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("rowNumber equals the single-reducer window bit-for-bit") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
      .toDF("id", "score")
      .repartition(13) // arbitrary layout
    val order = Seq(col("score").desc, col("id").asc)
    val dist = TotalOrder.rowNumber(df, order, "rn")
    val seq = df.withColumn("rn", row_number().over(
      Window.orderBy(order: _*)).cast("long"))
    assert(dist.select("id", "rn").except(seq.select("id", "rn")).count() === 0)
    assert(seq.select("id", "rn").except(dist.select("id", "rn")).count() === 0)
  }

  test("rowNumber is layout-invariant and gap-free") {
    val df = (1 to 997).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val order = Seq(col("v").asc, col("id").desc)
    val a = TotalOrder.rowNumber(df.repartition(3), order, "rn")
    val b = TotalOrder.rowNumber(df.repartition(17), order, "rn")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    val rns = a.select("rn").as[Long].collect().sorted
    assert(rns.head === 1L && rns.last === 997L && rns.distinct.length === 997)
  }

  test("rowNumber plan has no un-partitioned Window") {
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val plan = TotalOrder.rowNumber(df, Seq(col("v").asc, col("id").asc), "rn")
      .queryExecution.executedPlan.toString
    // every Window in the plan must be partitioned (by __pid); the
    // offsets window runs over one row per partition, which is fine
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("__pid")),
      s"expected a __pid-partitioned window, got:\n$plan")
  }

  test("denseIndex assigns contiguous 1..k over distinct keys") {
    val df = Seq("b", "a", "c", "a", "b", "a").toDF("k")
    val out = TotalOrder.denseIndex(df, Seq("k"), "idx")
    val m = out.select("k", "idx").distinct().as[(String, Long)].collect().toMap
    assert(m === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    assert(out.count() === 6)
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(TotalOrder.rowNumber(df, Seq(col("v").asc), "rn").count() === 0)
  }

  test("prefixSum equals the single-reducer running-sum window") {
    val df = (1 to 3001).map(i => (i.toLong, (i * 131 % 97).toLong))
      .toDF("id", "v").repartition(11)
    val order = Seq(col("v").asc, col("id").asc)
    val dist = TotalOrder.prefixSum(df, order, "v", "cum")
    val seq = df.withColumn("cum", sum(col("v")).over(
      Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, 0)))
    assert(dist.select("id", "cum").except(seq.select("id", "cum")).count() === 0)
    assert(seq.select("id", "cum").except(dist.select("id", "cum")).count() === 0)
  }

  test("prefixAggs max-of-struct equals LAST_VALUE IGNORE NULLS") {
    // nulls on ~half the rows: the running last-non-null in (v, id) order
    // is the prefix max of struct(v, id) restricted to non-null carriers
    val df = (1 to 2000).map { i =>
      (i.toLong, (i * 7 % 50).toLong, if (i % 2 == 0) Some(i * 3L) else None)
    }.toDF("id", "v", "payload").repartition(9)
    val order = Seq(col("v").asc, col("id").asc)
    val dist = TotalOrder.prefixAggs(
        df.withColumn("__c",
          when(col("payload").isNotNull, struct(col("v"), col("id")))),
        order, maxes = Seq("__c" -> "lastc"))
      .select(col("id"), col("lastc.id").as("last_id"))
    val seq = df.withColumn("last_id",
      last(when(col("payload").isNotNull, col("id")), ignoreNulls = true)
        .over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "last_id")
    assert(dist.except(seq).count() === 0 && seq.except(dist).count() === 0)
  }

  test("prefixAggs suffixMaxes equals FIRST_VALUE IGNORE NULLS looking forward") {
    // the mirror image of the prefix walk: the next non-null carrier at
    // or after the current row in (v, id) order is the suffix max of
    // struct(-v, -id) — and both walks must come out of ONE call (one
    // range shuffle)
    val df = (1 to 2000).map { i =>
      (i.toLong, (i * 7 % 50).toLong, if (i % 3 == 0) Some(i * 3L) else None)
    }.toDF("id", "v", "payload").repartition(9)
    val order = Seq(col("v").asc, col("id").asc)
    val dist = TotalOrder.prefixAggs(
        df.withColumn("__c",
            when(col("payload").isNotNull, struct(col("v"), col("id"))))
          .withColumn("__n",
            when(col("payload").isNotNull,
              struct((-col("v")).as("nv"), (-col("id")).as("nid")))),
        order,
        maxes = Seq("__c" -> "lastc"),
        suffixMaxes = Seq("__n" -> "nextc"))
      .select(col("id"), col("lastc.id").as("last_id"),
        (-col("nextc.nid")).as("next_id"))
    val w = Window.orderBy(order: _*)
    val seq = df
      .withColumn("last_id",
        last(when(col("payload").isNotNull, col("id")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_id",
        first(when(col("payload").isNotNull, col("id")), ignoreNulls = true)
          .over(w.rowsBetween(0, Window.unboundedFollowing)))
      .select("id", "last_id", "next_id")
    assert(dist.except(seq).count() === 0 && seq.except(dist).count() === 0)
  }

  test("prefixAggs emits sums and row numbers from one pass") {
    val df = (1 to 500).map(i => (i.toLong, (i % 23).toLong)).toDF("id", "y")
      .repartition(7)
    val order = Seq(col("y").desc, col("id").asc)
    val dist = TotalOrder.prefixAggs(df, order,
      sums = Seq("y" -> "cum"), rnCol = Some("k"))
    val w = Window.orderBy(order: _*)
    val seq = df
      .withColumn("cum",
        sum(col("y")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("k", row_number().over(w).cast("long"))
    val cols = Seq("id", "cum", "k")
    assert(dist.select(cols.map(col): _*).except(seq.select(cols.map(col): _*))
      .count() === 0)
    assert(seq.select(cols.map(col): _*).except(dist.select(cols.map(col): _*))
      .count() === 0)
  }

  test("ntile matches the window ntile across remainder shapes") {
    for (n <- Seq(1, 3, 4, 7, 97, 100); k <- Seq(1, 3, 4, 5)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 13).toLong))
        .toDF("id", "v").repartition(5)
      val order = Seq(col("v").asc, col("id").asc)
      val dist = TotalOrder.ntile(df, order, k, "b")
      val seq = df.withColumn("b", ntile(k).over(Window.orderBy(order: _*)))
      assert(dist.select("id", "b").except(seq.select("id", "b")).count() === 0
        && seq.select("id", "b").except(dist.select("id", "b")).count() === 0,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("denseIndex keeps null-keyed rows (null-safe join-back)") {
    val df = Seq(Some("b"), None, Some("a"), None).toDF("k")
    val out = TotalOrder.denseIndex(df, Seq("k"), "idx")
    assert(out.count() === 4) // the two null rows survive
    val nullIdx = out.filter(col("k").isNull).select("idx")
      .collect().map(_.getLong(0)).toSet
    assert(nullIdx.size === 1) // one dense index for the null group
  }

  test("prefixAggs: running sum AND running max of the SAME column coexist") {
    // the offset columns used to collide into one __off name and fail
    // analysis when one metric wanted both aggregates
    val df = (1L to 40L).map(i => (i, (i * 17) % 23 + 1)).toDF("id", "v")
    val out = TotalOrder.prefixAggs(df, order = Seq(col("id").asc),
      sums = Seq("v" -> "run_sum"), maxes = Seq("v" -> "run_max"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = out.select("id", "run_sum", "run_max").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val exp = df
      .withColumn("run_sum", sum(col("v")).over(w))
      .withColumn("run_max", max(col("v")).over(w))
      .select("id", "run_sum", "run_max").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === exp)
  }

  test("checkBounded: identity when off, loud on a false boundedness claim") {
    val small = (1L to 100L).toDF("id")
    // flag off: identity, no action run
    assert(TotalOrder.checkBounded(small, "spec-small") eq small)
    System.setProperty("graft.bounded.check", "1")
    try {
      // true claim passes and returns the frame
      assert(TotalOrder.checkBounded(small, "spec-small", cap = 100).count() === 100)
      // false claim fails loudly with the call-site label
      val big = spark.range(5000).toDF("id")
      val ex = intercept[IllegalArgumentException] {
        TotalOrder.checkBounded(big, "spec-big", cap = 1000)
      }
      assert(ex.getMessage.contains("spec-big"))
      assert(ex.getMessage.contains("FALSE"))
    } finally System.clearProperty("graft.bounded.check")
  }
}
