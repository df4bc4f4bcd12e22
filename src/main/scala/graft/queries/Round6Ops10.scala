package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IncrementalJoin, TableStore}

/** Round-6 batch 10: aggregate-over-join IVM — the gold-table shape
  * ("revenue by segment" over customer⋈orders) maintained through
  * inserts AND deletes on BOTH base tables without materializing the
  * join. Completes the IVM family: s51 maintains aggregates over one
  * table's CDF, ivm_join_refresh maintains the join multiset, this
  * maintains the aggregate OF the join.
  */
object Round6Ops10 {

  val ivm_join_agg_refresh = OpQuery(
    "ivm_join_agg_refresh",
    """WITH a1 AS (
      |  SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey % 100 < 6),
      |b1 AS (
      |  SELECT c_custkey AS k, c_mktsegment FROM customer WHERE c_custkey % 4 < 3)
      |SELECT b1.c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(price) AS DOUBLE) AS total_price
      |FROM a1 JOIN b1 ON a1.k = b1.k
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))

    val root = java.nio.file.Files.createTempDirectory("graft-ivmja-gate-").toString
    val store = new TableStore(spark, root, retainVersions = 5)
    // v0 slices differ from the final state in both directions, so the
    // refresh must survive inserts AND deletes on BOTH tables
    store.overwrite("A", orders.filter(col("o_orderkey") % 100 < 4))
    store.overwrite("B", customer.filter(col("k") % 4 > 0))
    val (av0, bv0) = (store.currentVersion("A"), store.currentVersion("B"))
    store.overwrite("V",
      IncrementalJoin.fullJoinAgg(store.read("A"), store.read("B"), Seq("k"),
        groupCols = Seq("c_mktsegment"), measureCol = "price"))

    store.overwrite("A", orders.filter(col("o_orderkey") % 100 < 6))
    store.overwrite("B", customer.filter(col("k") % 4 < 3))
    IncrementalJoin.refreshAgg(store, "V",
      "A", av0, store.currentVersion("A"),
      "B", bv0, store.currentVersion("B"),
      Seq("k"), groupCols = Seq("c_mktsegment"), measureCol = "price")

    store.read("V")
      .select(col("c_mktsegment"), col("n_rows"),
        col("total_price").cast("double").as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[OpQuery] = Seq(ivm_join_agg_refresh)
}
