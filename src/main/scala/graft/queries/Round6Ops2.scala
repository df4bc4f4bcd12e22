package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.KmvSketch

/** Round-6 batch 2: an engine-reproducible KMV twin (the md5-hash
  * recipe that already pins MinHash/SimHash/PageRank/PCA), and dynamic
  * partition pruning over a partitioned table — the runtime half of
  * partition pruning that static filters can't do.
  */
object Round6Ops2 {

  /** KMV distinct-count sketch fed md5-derived hashes instead of the
    * production xxhash64: 60 md5 bits scaled by 8 to span the
    * estimator's [0, 2^63) domain. The REAL TypedImperativeAggregate
    * (bounded TreeSet buffer, map-side mergeable) runs on the Spark
    * side; DuckDB replays the k-th-order-statistic estimate exactly, so
    * the estimator arithmetic is hash-green while `kmv_distinct` keeps
    * benchmarking the xxhash64 production path rows-only.
    */
  val kmv_distinct_md5 = OpQuery(
    "kmv_distinct_md5",
    """WITH hashed AS (
      |  SELECT DISTINCT l_returnflag,
      |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
      |              AS BIGINT) * 8 AS h
      |  FROM lineitem),
      |ranked AS (
      |  SELECT l_returnflag, h,
      |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
      |         COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
      |  FROM hashed)
      |SELECT l_returnflag,
      |       CAST(MAX(nd) AS BIGINT) AS exact_distinct,
      |       CAST(ROUND(MAX(CASE WHEN rn = 256 THEN
      |              (255.0 * POWER(2, 63)) / CAST(h AS DOUBLE) END), 4)
      |            AS DOUBLE) AS kmv_estimate
      |FROM ranked
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    KmvSketch.register(spark)
    val h = (conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10)
      .cast("long") * lit(8L)).as("h")
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), h)
      .groupBy(col("l_returnflag"))
      .agg(
        call_function("kmv_sketch", col("h"), lit(256)).as("__s"),
        countDistinct(col("h")).as("exact_distinct"))
      .select(col("l_returnflag"), col("exact_distinct"),
        round(col("__s.estimate"), 4).as("kmv_estimate"))
      .orderBy(col("l_returnflag"))
  }

  /** Dynamic partition pruning: the fact table is stored partitioned by
    * order year; the dim side's filter is only known at RUNTIME (it's a
    * predicate on a different column of the dim), so static pruning
    * can't help — Spark broadcasts the dim, extracts the surviving join
    * keys, and injects them as a partition filter into the fact scan
    * (`dynamicpruningexpression` in the scan's PartitionFilters). The
    * in-gate require asserts DPP actually fired; the oracle checks the
    * join algebra. At 100 TB this is the difference between scanning 1
    * year and scanning all of them.
    */
  val s48_dpp_join = OpQuery(
    "s48_dpp_join",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE EXTRACT(year FROM o_orderdate) % 3 = 0
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    val out = graft.queries.GateScratch.dir("graft-dpp").toString
    Tables.load(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(out)
    val fact = spark.read.parquet(out)
    // dim: one row per year with an attribute, built from the RAW table
    // (not the partitioned scan); the runtime-only filter is on the
    // attribute, not the partition key — the join key itself stays the
    // bare partition column so the DPP rule can target the scan
    val dim = Tables.load(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("yr")).distinct()
      .withColumn("keep", pmod(col("yr"), lit(3)) === 0)
    val joined = fact
      .join(dim.filter(col("keep")).select(col("yr")), Seq("yr"))
      .groupBy(col("yr"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .select(col("yr").cast("long").as("yr"), col("n_orders"), col("revenue"))
      .orderBy(col("yr"))
    // The dynamic-pruning plan assertion lives in PlanSpec ("s48: ..."),
    // not here: an in-gate collect() would execute the query twice
    // (round-5 verdict item 3) — the gate runs it exactly once.
    joined
  }

  val all: Seq[OpQuery] = Seq(kmv_distinct_md5, s48_dpp_join)
}
