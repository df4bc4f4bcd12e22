package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ApproxDistinctRuleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRule
    try f
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRule)
      spark.conf.unset(ApproxDistinctRule.ConfKey)
    }
  }

  test("flag on: COUNT(DISTINCT) plans as HLL++ single-pass, close to exact") {
    withRule {
      val exact = Tables.load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey"))).head().getLong(0)

      spark.conf.set(ApproxDistinctRule.ConfKey, "true")
      val df = Tables.load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n"))
      val approx = df.head().getLong(0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"rule did not rewrite to HLL:\n$plan")
      assert(!plan.contains("Expand"), "still planning exact distinct Expand")
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr < 0.1, s"exact=$exact approx=$approx")
    }
  }

  test("flag off (default): exact semantics untouched") {
    withRule {
      val df = Tables.load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("approx_count_distinct"))
    }
  }

  test("multi-column distinct and FILTER stay exact even with flag on") {
    withRule {
      spark.conf.set(ApproxDistinctRule.ConfKey, "true")
      val multi = Tables.load(spark, sf, "lineitem")
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("n"))
      assert(!multi.queryExecution.executedPlan.toString
        .contains("approx_count_distinct"))
    }
  }
}
