package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the shuffle from every subsequent join on that key — the
  * standard large-fact ⨝ large-fact strategy at 100 TB (bucket once,
  * join shuffle-free forever).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse dirs persist — purge them or saveAsTable refuses
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Tables.load(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not reshuffle either bucketed side
    val joinSection = plan.substring(0, plan.length)
    val exchangesBeforeAgg = "Exchange hashpartitioning\\((l|o)_orderkey".r
      .findAllIn(joinSection).size
    assert(exchangesBeforeAgg == 0,
      s"bucketed join still shuffles on the join key:\n$plan")

    // and the result matches the unbucketed join
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain)
  }
}
