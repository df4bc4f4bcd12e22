package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the shuffle from every subsequent join on that key — the
  * standard large-fact ⨝ large-fact strategy at 100 TB (bucket once,
  * join shuffle-free forever).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark, "b_orders",
      Tables.load(spark, sf, "orders"), Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(spark, "b_lineitem",
      Tables.load(spark, sf, "lineitem"), Seq("l_orderkey"), 8)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    // the join itself must not reshuffle either bucketed side
    assert(Bucketing.keyExchanges(joined, Seq("l_orderkey", "o_orderkey")) == 0,
      s"bucketed join still shuffles on the join key:\n" +
        joined.queryExecution.executedPlan.toString)

    // and the result matches the unbucketed join
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain)
  }

  test("writeBucketed produces exactly one file per bucket") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark, "b_nation_files",
      Tables.load(spark, sf, "nation"), Seq("n_nationkey"), 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED b_nation_files")
      .filter(col("col_name") === "Location").head.getString(1)
    val dir = new java.io.File(java.net.URI.create(loc).getPath)
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    // pre-repartition(buckets, key) aligns write tasks with bucket ids:
    // each task holds exactly one bucket's rows → one file per bucket
    assert(parts.length <= 4,
      s"expected ≤4 bucket files, found ${parts.length}")
    // bucket file names carry the bucket id: part-...._00003.c000...
    val bucketIds = parts.map(_.getName).map { n =>
      "_(\\d{5})\\.".r.findFirstMatchIn(n).map(_.group(1).toInt).getOrElse(-1)
    }
    assert(bucketIds.distinct.length == parts.length,
      s"duplicate bucket ids across files: ${parts.map(_.getName).mkString(", ")}")
  }

  test("groupBy on the bucket key also skips the shuffle") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark, "b_orders_agg",
      Tables.load(spark, sf, "orders"), Seq("o_custkey"), 8)
    val agg = spark.table("b_orders_agg")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("t"))
    agg.collect()
    assert(Bucketing.keyExchanges(agg, Seq("o_custkey")) == 0,
      s"bucketed aggregation still shuffles on the bucket key:\n" +
        agg.queryExecution.executedPlan.toString)
  }
}
