package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 98: ordered funnel conversion, the Mann-Whitney U
  * rank-sum test, and ranking-quality metrics (NDCG@10 and MRR).
  */
object Round4Ops98 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Strictly-ordered funnel view→click→purchase: a user advances a step
    * only with an event AFTER their previous step's first qualifying
    * event. Each stage is one filtered groupBy-min plus one equi-join on
    * user_id — the funnel never materializes per-user event lists, so it
    * holds at any event volume (all three stages shuffle on user_id and
    * AQE broadcasts the shrinking stage frames). Single-row stage counts
    * are cross-joined lazily — no driver-side count() loop.
    */
  val event_funnel = OpQuery(
    "event_funnel",
    """WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS nv,
      |             (SELECT COUNT(*) FROM c) AS nc,
      |             (SELECT COUNT(*) FROM p) AS np)
      |SELECT CAST(step AS INT) AS step, event,
      |       CAST(users AS BIGINT) AS users,
      |       CAST(ROUND(conv_prev, 6) AS DOUBLE) AS conv_from_prev,
      |       CAST(ROUND(conv_start, 6) AS DOUBLE) AS conv_from_start
      |FROM (
      |  SELECT 1 AS step, 'view' AS event, nv AS users,
      |         1.0 AS conv_prev, 1.0 AS conv_start FROM n
      |  UNION ALL
      |  SELECT 2, 'click', nc, nc * 1.0 / nv, nc * 1.0 / nv FROM n
      |  UNION ALL
      |  SELECT 3, 'purchase', np, np * 1.0 / nc, np * 1.0 / nv FROM n
      |) ORDER BY step""".stripMargin) { (spark, dir) =>
    val ev = t(spark, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t0"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t0"))
      .groupBy("user_id").agg(min("ts").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val n = v.agg(count(lit(1)).as("nv"))
      .crossJoin(c.agg(count(lit(1)).as("nc")))
      .crossJoin(p.agg(count(lit(1)).as("np")))
    n.select(lit(1).as("step"), lit("view").as("event"),
        col("nv").cast("long").as("users"),
        lit(1.0).as("conv_from_prev"), lit(1.0).as("conv_from_start"))
      .unionAll(n.select(lit(2), lit("click"), col("nc").cast("long"),
        round(col("nc") * lit(1.0) / col("nv"), 6),
        round(col("nc") * lit(1.0) / col("nv"), 6)))
      .unionAll(n.select(lit(3), lit("purchase"), col("np").cast("long"),
        round(col("np") * lit(1.0) / col("nc"), 6),
        round(col("np") * lit(1.0) / col("nv"), 6)))
      .orderBy("step")
  }

  /** Mann-Whitney U rank-sum test (normal approximation, tie-corrected
    * variance): are URGENT order totals distributed differently from LOW?
    * Midranks come from RANK() + the per-value tie count — one global
    * sort, no per-pair comparison (the textbook U would be an n² join).
    * Exact DECIMAL ranking keys keep the midrank arithmetic (halves)
    * bit-identical across engines.
    */
  val a75_mann_whitney = OpQuery(
    "a75_mann_whitney",
    """WITH s AS (
      |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |), rk AS (
      |  SELECT v, grp, RANK() OVER (ORDER BY v) AS r,
      |         COUNT(*) OVER (PARTITION BY v) AS tie
      |  FROM s
      |), agg AS (
      |  SELECT SUM(CASE WHEN grp = 1 THEN r + (tie - 1) / 2.0 END) AS r1,
      |         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
      |         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n2
      |  FROM rk
      |), tt AS (
      |  SELECT SUM(CAST(t AS DOUBLE) * t * t - t) AS tsum
      |  FROM (SELECT v, MAX(tie) AS t FROM rk GROUP BY v)
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       CAST(ROUND(r1 - n1 * (n1 + 1) / 2.0, 4) AS DOUBLE) AS u,
      |       CAST(ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0) /
      |            SQRT(n1 * n2 / 12.0 * ((n1 + n2 + 1) -
      |                 tsum / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6)
      |            AS DOUBLE) AS z
      |FROM agg CROSS JOIN tt""".stripMargin) { (spark, dir) =>
    val s = t(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_totalprice").cast("decimal(18,2)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("grp"))
    // Ranks enter U only through midranks, and a value's midrank is a
    // function of the DISTINCT-value prefix counts: midrank(v) =
    // cum_cnt(≤v) - cnt(v) + (cnt(v)+1)/2. Aggregate per value first,
    // then one distributed TotalOrder prefix sum — no global rank window
    // over the order-sized frame. Midranks are exact multiples of 0.5,
    // so the regrouped double sums are bit-equal to the per-row form.
    val perV = s.groupBy(col("v")).agg(
      count(lit(1)).as("tie"),
      sum(col("grp")).cast("long").as("c1"))
    val cum = graft.operators.TotalOrder
      .prefixSum(perV, Seq(col("v").asc), "tie", "cumt")
    val midrank = col("cumt") - col("tie") + (col("tie") + 1) / 2.0
    val agg = cum.agg(
      sum(col("c1") * midrank).as("r1"),
      sum(col("c1")).as("n1"),
      sum(col("tie") - col("c1")).as("n2"))
    val tsum = cum.agg(
      sum(col("tie").cast("double") * col("tie") * col("tie") - col("tie"))
        .as("tsum"))
    val n1 = col("n1"); val n2 = col("n2")
    val u = col("r1") - n1 * (n1 + lit(1)) / lit(2.0)
    agg.crossJoin(tsum).select(
      n1.cast("long").as("n1"), n2.cast("long").as("n2"),
      round(u, 4).cast("double").as("u"),
      round((u - n1 * n2 / lit(2.0)) /
        sqrt(n1 * n2 / lit(12.0) * ((n1 + n2 + lit(1)) -
          col("tsum") / ((n1 + n2).cast("double") * (n1 + n2 - lit(1))))), 6)
        .cast("double").as("z"))
  }

  /** NDCG@10 per order-priority segment: each order is a "query", its
    * lineitems ranked by extended price (the system order) with quantity
    * as graded relevance; the ideal order re-sorts by relevance. Two
    * row_number windows over the SAME partition key → one shuffle, two
    * local sorts. Per-query NDCG is rounded to 9 digits before the
    * segment mean so cross-engine float-sum ordering can't leak into the
    * 6-digit gate.
    */
  val eval_ndcg = OpQuery(
    "eval_ndcg",
    """WITH r AS (
      |  SELECT o.o_orderpriority, l.l_orderkey,
      |         CAST(l.l_quantity AS DOUBLE) AS rel,
      |         ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
      |             ORDER BY l.l_extendedprice DESC, l.l_linenumber) AS rn,
      |         ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
      |             ORDER BY l.l_quantity DESC, l.l_linenumber) AS irn
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), g AS (
      |  SELECT o_orderpriority, l_orderkey,
      |         ROUND(SUM(CASE WHEN rn <= 10 THEN rel / LOG2(rn + 1) END) /
      |               SUM(CASE WHEN irn <= 10 THEN rel / LOG2(irn + 1) END), 9)
      |           AS ndcg
      |  FROM r GROUP BY 1, 2
      |)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_queries,
      |       CAST(ROUND(AVG(ndcg), 6) AS DOUBLE) AS mean_ndcg
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val li = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    val wSys = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val wIdeal = Window.partitionBy("l_orderkey")
      .orderBy(col("l_quantity").desc, col("l_linenumber"))
    val r = li.select(col("o_orderpriority"), col("l_orderkey"),
      col("l_quantity").cast("double").as("rel"),
      row_number().over(wSys).as("rn"),
      row_number().over(wIdeal).as("irn"))
    val g = r.groupBy("o_orderpriority", "l_orderkey").agg(
      round(sum(when(col("rn") <= 10, col("rel") / log2(col("rn") + 1))) /
        sum(when(col("irn") <= 10, col("rel") / log2(col("irn") + 1))), 9)
        .as("ndcg"))
    g.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n_queries"),
        round(avg(col("ndcg")), 6).cast("double").as("mean_ndcg"))
      .orderBy("o_orderpriority")
  }

  /** Mean reciprocal rank: rank position of the first returned-flag item
    * in each order's price-ranked list; orders with no hit contribute 0.
    * Same one-shuffle window shape as eval_ndcg — the per-query reduction
    * is MIN over a conditional, not a sort-and-pick.
    */
  val eval_mrr = OpQuery(
    "eval_mrr",
    """WITH r AS (
      |  SELECT o.o_orderpriority, l.l_orderkey,
      |         ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
      |             ORDER BY l.l_extendedprice DESC, l.l_linenumber) AS rn,
      |         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS hit
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), q AS (
      |  SELECT o_orderpriority, l_orderkey,
      |         MIN(CASE WHEN hit = 1 THEN rn END) AS fh
      |  FROM r GROUP BY 1, 2
      |)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_queries,
      |       CAST(SUM(CASE WHEN fh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_hit,
      |       CAST(ROUND(AVG(CASE WHEN fh IS NULL THEN 0.0 ELSE 1.0 / fh END), 6)
      |         AS DOUBLE) AS mrr
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val li = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
    val wSys = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val r = li.select(col("o_orderpriority"), col("l_orderkey"),
      row_number().over(wSys).as("rn"),
      when(col("l_returnflag") === "R", 1).otherwise(0).as("hit"))
    val q = r.groupBy("o_orderpriority", "l_orderkey").agg(
      min(when(col("hit") === 1, col("rn"))).as("fh"))
    q.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("fh").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_hit"),
        round(avg(when(col("fh").isNull, 0.0)
          .otherwise(lit(1.0) / col("fh"))), 6).cast("double").as("mrr"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[OpQuery] = Seq(event_funnel, a75_mann_whitney, eval_ndcg,
    eval_mrr)
}
