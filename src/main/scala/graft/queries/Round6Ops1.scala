package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bucketing, ShardExport}

/** Round-6 batch 1: storage-layout operators promoted to gates — the
  * bucketed co-located join (shuffle-free fact⨝fact, previously only
  * spec-covered) and deterministic training-shard export.
  */
object Round6Ops1 {

  /** Bucketed co-located join: both sides are written hash-clustered on
    * the join key (8 buckets, sorted, one file per bucket), so the join
    * plans WITHOUT an Exchange on either side — verified in-gate by a
    * plan assertion, not just by the spec. The oracle only checks the
    * join's algebra; the plan shape is the point of the operator (at
    * 100 TB the bucketed layout turns every subsequent join on the key
    * into a zero-shuffle merge).
    */
  val s47_bucketed_join = OpQuery(
    "s47_bucketed_join",
    """SELECT c.c_mktsegment AS segment,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    Bucketing.writeBucketed(spark, "graft_b_customer",
      Tables.load(spark, dir, "customer"), Seq("c_custkey"), 8)
    Bucketing.writeBucketed(spark, "graft_b_orders",
      Tables.load(spark, dir, "orders"), Seq("o_custkey"), 8)
    val joined = spark.table("graft_b_orders").hint("MERGE")
      .join(spark.table("graft_b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      .select(col("segment"), col("n_orders"), col("revenue"))
      .orderBy(col("segment"))
    val shuffles = Bucketing.keyExchanges(joined, Seq("o_custkey", "c_custkey"))
    require(shuffles == 0,
      s"bucketed join planned $shuffles Exchange(s) on the bucket key")
    joined
  }

  /** Deterministic shard export: md5-ordered pseudo-random shuffle +
    * size-balanced shard assignment via a distributed prefix sum
    * ([[graft.operators.TotalOrder.prefixAggs]] — one range shuffle, no
    * single-reducer window). The oracle replays the ENTIRE assignment
    * (same md5 order, same running-sum arithmetic) in DuckDB, so shard
    * membership is pinned engine-independently, not just shard counts.
    */
  val shard_export = OpQuery(
    "shard_export",
    """WITH ordered AS (
      |  SELECT doc_id, n_chars,
      |         SUM(n_chars) OVER (
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |           ROWS UNBOUNDED PRECEDING) AS pfx
      |  FROM documents
      |)
      |SELECT CAST(FLOOR((pfx - n_chars) / 10000.0) AS BIGINT) AS shard,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_cost,
      |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM ordered
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val assigned = ShardExport.assignShards(
      docs, idCol = "doc_id", costCol = "n_chars", targetCost = 10000L)
    assigned.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_cost"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  val all: Seq[OpQuery] = Seq(s47_bucketed_join, shard_export)
}
