package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IncrementalAgg, IncrementalJoin, TableStore}

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

    val root = graft.queries.GateScratch.dir("graft-ivmja-gate-").toString
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

  /** MIN/MAX IVM — the NON-additive case: deletes that hit a stored
    * extremum force a rescan of ONLY the affected groups
    * ([[IncrementalJoin]] companion in `IncrementalAgg.refreshMinMax`).
    * The gate mutates the base with inserts AND deletes (including
    * extremum-hitting ones — the v0 slice holds each segment's cheapest
    * orders, and v1 removes part of it) and hash-matches the full
    * recompute of the final state.
    */
  val ivm_minmax_refresh = OpQuery(
    "ivm_minmax_refresh",
    """WITH base AS (
      |  SELECT o.o_orderkey, c.c_mktsegment AS g,
      |         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_orderkey % 10 < 6 AND o.o_orderkey % 3 <> 0
      |)
      |SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(MIN(v) AS DOUBLE) AS min_v,
      |       CAST(MAX(v) AS DOUBLE) AS max_v
      |FROM base GROUP BY g ORDER BY g""".stripMargin) { (spark, dir) =>
    val joined = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("g"),
        col("o_totalprice").cast("decimal(18,2)").as("v"))
    val root = graft.queries.GateScratch.dir("graft-ivmm-gate-").toString
    val store = new TableStore(spark, root, retainVersions = 5)
    store.overwrite("base", joined.filter(col("o_orderkey") % 10 < 4))
    store.overwrite("mm",
      IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
    // v1: widen the slice (inserts) AND delete every 3rd order key —
    // some deletions hit per-segment extrema, forcing targeted rescans
    store.overwrite("base",
      joined.filter(col("o_orderkey") % 10 < 6 && col("o_orderkey") % 3 =!= 0))
    IncrementalAgg.refreshMinMax(
      store, "mm", "base", 0, 1, Seq("g"), "v")
    store.read("mm")
      .select(col("g"), col("n_rows"),
        col("min_v").cast("double").as("min_v"),
        col("max_v").cast("double").as("max_v"))
      .orderBy(col("g"))
  }

  val all: Seq[OpQuery] = Seq(ivm_join_agg_refresh, ivm_minmax_refresh)
}
