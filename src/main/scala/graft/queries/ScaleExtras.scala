package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{BloomPrune, Skew, TableStore}

/** Scale-technique operators: approximate distinct counting and salted
  * skew mitigation. Salted results are oracled against the unsalted
  * relational statement (the rewrite must be observationally identical);
  * HLL is approximate by nature so its query is spec-bounded instead.
  */
object ScaleExtras {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** approx_count_distinct (HLL++) next to the exact count — the at-scale
    * substitute for A4/A7 when exactness isn't required. Approximate →
    * rows-only at the gate; the relative error bound is pinned in
    * ScaleExtrasSpec.
    */
  val a11_approx_distinct = OpQuery.noOracle("a11_approx_distinct") { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** Salted two-phase aggregation — must equal the direct groupBy. */
  val skew_salted_agg = OpQuery(
    "skew_salted_agg",
    """SELECT o_custkey,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    Skew.saltedCountSum(t(spark, dir, "orders"), "o_custkey", "o_totalprice",
        saltBuckets = 8)
      .orderBy(col("o_custkey"))
  }

  /** Salted join — must equal the plain equi-join row-for-row. */
  val skew_salted_join = OpQuery(
    "skew_salted_join",
    """SELECT o.o_orderkey, c.c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val customer = t(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    Skew.saltedJoin(orders, customer, Seq("c_custkey"), saltBuckets = 4)
      .select(col("o_orderkey"), col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  /** Hot/cold split-union join — must equal the plain equi-join
    * row-for-row for ANY hot-key set (detection only moves rows between
    * the broadcast and shuffle branches, never changes the result).
    * Hot keys come from the real sampled detector plus a pinned
    * override (the known-hot-tenant case), so both branches execute
    * regardless of what the sample surfaces. Measured in StressSkew:
    * this shape runs at the uniform-join floor while full-dim salting
    * loses outright at 200 MB dim scale.
    */
  val skew_hotcold_join = OpQuery(
    "skew_hotcold_join",
    """SELECT o.o_orderkey, c.c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val customer = t(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    val hot = Skew.detectHotKeys(orders, "c_custkey",
      sampleFraction = 0.05, minShare = 0.005) :+ 7L :+ 13L
    Skew.hotKeyJoin(orders, customer, "c_custkey", hot.distinct)
      .select(col("o_orderkey"), col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  /** Z-order clustered write + selective 2-dim read-back: events are
    * rewritten clustered on (user_id, value) into a scratch warehouse,
    * then filtered on BOTH clustered dimensions. The oracle is the same
    * filter over the source table — the clustered re-layout must be
    * observationally identical (file-pruning efficacy is pinned in
    * ZOrderSpec; this gate pins that the re-layout loses/changes
    * nothing).
    */
  val zorder_cluster = OpQuery(
    "zorder_cluster",
    """SELECT event_id, user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
      |FROM events
      |WHERE user_id BETWEEN 100 AND 160 AND value BETWEEN 10 AND 60
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-zorder-gate-")
    val store = new TableStore(spark, scratch.toString)
    store.overwriteClustered(
      "events_z",
      t(spark, dir, "events").select(col("event_id"), col("user_id"), col("value")),
      clusterBy = Seq("user_id", "value"), numFiles = 16)
    store.read("events_z")
      .filter(col("user_id").between(100, 160) && col("value").between(10, 60))
      .select(
        col("event_id"), col("user_id"),
        col("value").cast("decimal(18,2)").cast("double").as("value"))
      .orderBy(col("event_id"))
  }

  /** Bloom-filter runtime pruning: orders is pre-filtered by a bloom
    * filter built over the BUILDING-segment customer keys, then joined.
    * Bloom filters have no false negatives and the join discards false
    * positives, so the result must be EXACTLY the plain selective join —
    * which is the oracle. The filter's own invariants (no false
    * negatives, FPP bound, interpreted == codegen) are BloomFilterSpec.
    */
  val bloom_prune_join = OpQuery(
    "bloom_prune_join",
    """SELECT o.o_orderkey, o.o_custkey, c.c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |ORDER BY o.o_orderkey""".stripMargin) { (spark, dir) =>
    val building = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    BloomPrune.prune(
        t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", building, "c_custkey",
        expectedItems = 10000L, fpp = 0.01)
      .join(building, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  val all: Seq[OpQuery] = Seq(
    a11_approx_distinct, skew_salted_agg, skew_salted_join,
    skew_hotcold_join, zorder_cluster, bloom_prune_join)
}
