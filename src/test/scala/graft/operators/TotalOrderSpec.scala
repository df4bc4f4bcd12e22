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
}
