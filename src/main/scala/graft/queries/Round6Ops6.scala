package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MaterializedAgg, TableStore}

/** Round-6 batch 6: incremental materialized-aggregate maintenance
  * driven by the log-less change feed — load v0, load v1 (a
  * deterministic mutation of the source), diff with
  * [[TableStore.changes]], and maintain the gold aggregate by APPLYING
  * THE DELTA, never rescanning the base table. The oracle recomputes
  * the v1 aggregate directly from the source in DuckDB: the
  * incremental path must land on the same values bit for bit.
  */
object Round6Ops6 {

  val s51_incremental_agg_cdf = OpQuery(
    "s51_incremental_agg_cdf",
    """WITH v1 AS (
      |  SELECT o_custkey % 97 AS bucket,
      |         CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
      |              ELSE o_totalprice END AS DECIMAL(18,2)) AS price
      |  FROM orders)
      |SELECT bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(price) AS DOUBLE) AS sum_price
      |FROM v1 GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), (col("o_custkey") % 97).as("bucket"),
        col("o_totalprice"))
    // v0: two-thirds of the orders at original prices
    val v0 = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("bucket"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    // v1: the full table, every 5th order's price doubled — so the diff
    // holds inserts (new orders), deletes+inserts (price updates), and
    // untouched rows, all in one feed
    val v1 = orders.select(col("o_orderkey"), col("bucket"),
      when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")).cast("decimal(18,2)").as("price"))
    val root = graft.queries.GateScratch.dir("graft-mvagg-").toString
    val store = new TableStore(spark, root)
    store.overwrite("t", v0) // version 0
    store.overwrite("t", v1) // version 1
    val state0 = MaterializedAgg.compute(store.read("t", 0),
      Seq("bucket"), Seq("price"))
    val maintained = MaterializedAgg.applyDelta(state0,
      store.changes("t", 0, 1), Seq("bucket"), Seq("price"))
    maintained.select(col("bucket"),
        col("__mv_count").as("n_rows"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy(col("bucket"))
  }

  /** Avro source/sink roundtrip: export a typed slice of orders to Avro
    * container files ([[graft.operators.AvroTable]], no spark-avro
    * connector), read them back, and aggregate OFF THE AVRO SCAN. The
    * oracle aggregates the original parquet — the format hop must be
    * observationally invisible, same proof shape as the Delta/Iceberg
    * roundtrip gates.
    */
  val s53_avro_roundtrip = OpQuery(
    "s53_avro_roundtrip",
    """SELECT o_orderstatus,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_str"),
        col("o_orderstatus"))
    val out = graft.queries.GateScratch.dir("graft-avrort-").toString
    // decimals ride as strings through Avro's primitive surface — cast
    // back after the scan; exactness is part of what the hash checks
    graft.operators.AvroTable.write(orders, out)
    graft.operators.AvroTable.read(spark, out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price_str").cast("decimal(18,2)")).cast("double").as("revenue"),
        sum(col("o_custkey")).as("custkey_sum"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Seq[OpQuery] = Seq(s51_incremental_agg_cdf, s53_avro_roundtrip)
}
