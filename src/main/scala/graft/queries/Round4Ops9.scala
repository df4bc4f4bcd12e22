package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-4 batch 9: customer-analytics classics (RFM, association
  * rules, Pareto concentration) and corpus n-gram frequencies.
  */
object Round4Ops9 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** RFM segmentation: recency/frequency/monetary quartiles per
    * customer, NTILE'd with full tie-breaks so both engines assign the
    * identical quartile. The three global windows run over the
    * CUSTOMER-level aggregate — dimension-sized by construction, never
    * the raw fact table (same bounded-global-window argument as the
    * offsets frame in corpus_select).
    */
  val rfm_segmentation = OpQuery(
    "rfm_segmentation",
    """WITH rfm AS (
      |  SELECT o_custkey,
      |         MAX(o_orderdate) AS last_order,
      |         COUNT(*) AS freq,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey,
      |       CAST(freq AS BIGINT) AS freq,
      |       CAST(monetary AS DOUBLE) AS monetary,
      |       CAST(NTILE(4) OVER (ORDER BY last_order, o_custkey) AS INT) AS r_q,
      |       CAST(NTILE(4) OVER (ORDER BY freq, o_custkey) AS INT) AS f_q,
      |       CAST(NTILE(4) OVER (ORDER BY monetary, o_custkey) AS INT) AS m_q
      |FROM rfm
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val rfm = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
    // Customer-level frames grow with the table, so the three global
    // NTILE windows run as TotalOrder.ntile (range partition + broadcast
    // count) — bit-equal quartiles, no single-reducer sort.
    val q1 = graft.operators.TotalOrder.ntile(
      rfm, Seq(col("last_order"), col("o_custkey")), 4, "r_q")
    val q2 = graft.operators.TotalOrder.ntile(
      q1, Seq(col("freq"), col("o_custkey")), 4, "f_q")
    val q3 = graft.operators.TotalOrder.ntile(
      q2, Seq(col("monetary"), col("o_custkey")), 4, "m_q")
    q3.select(col("o_custkey"), col("freq"),
        col("monetary").cast("double").as("monetary"),
        col("r_q"), col("f_q"), col("m_q"))
      .orderBy(col("o_custkey"))
  }

  /** Association rules on top of the basket pairs: support, directional
    * confidence, and lift, thresholded and ranked. All ratios divide in
    * DOUBLE after exact integer counts, rounded before the ORDER BY so
    * the ranking itself is reproducible.
    */
  val basket_lift = OpQuery(
    "basket_lift",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, p_type
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), n AS (
      |  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items
      |), freq AS (
      |  SELECT p_type, CAST(COUNT(*) AS DOUBLE) AS f FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      |  GROUP BY 1, 2
      |)
      |SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
      |       CAST(ROUND(n_ab / fa.f, 6) AS DOUBLE) AS conf_a_b,
      |       CAST(ROUND(n_ab * n_orders / (fa.f * fb.f), 6) AS DOUBLE) AS lift
      |FROM pairs
      |JOIN freq fa ON type_a = fa.p_type
      |JOIN freq fb ON type_b = fb.p_type, n
      |WHERE n_ab >= 20
      |ORDER BY lift DESC, type_a, type_b
      |LIMIT 25""".stripMargin) { (spark, dir) =>
    // items is referenced 4x (n, freq, both pair sides) — freeze it so
    // the join+distinct runs once instead of four times (r13-opt §3.3)
    val items = t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_type"))
      .distinct()
      .localCheckpoint(false)
    val nOrders = items.agg(
      countDistinct(col("l_orderkey")).cast("double").as("n_orders"))
    val freq = items.groupBy(col("p_type"))
      .agg(count(lit(1)).cast("double").as("f"))
    val a = items.toDF("l_orderkey", "type_a")
    val b = items.toDF("l_orderkey", "type_b")
    a.join(b, Seq("l_orderkey"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 20)
      .join(broadcast(freq.toDF("type_a", "fa")), "type_a")
      .join(broadcast(freq.toDF("type_b", "fb")), "type_b")
      .crossJoin(broadcast(nOrders))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        round(col("n_ab") / col("fa"), 6).as("conf_a_b"),
        round(col("n_ab") * col("n_orders") / (col("fa") * col("fb")), 6).as("lift"))
      .orderBy(col("lift").desc, col("type_a"), col("type_b"))
      .limit(25)
  }

  /** Pareto concentration: cumulative revenue share in descending
    * customer-revenue order, with the top-80% flag. The running sum is
    * a global window over the customer-level aggregate (dimension-
    * sized); share division happens in DOUBLE on both engines (exact
    * DECIMAL sums cast once), so the 0.8 boundary is bit-identical.
    */
  val pareto_analysis = OpQuery(
    "pareto_analysis",
    """WITH rev AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      |  FROM orders GROUP BY o_custkey
      |), tot AS (
      |  SELECT SUM(r) AS t FROM rev
      |), ranked AS (
      |  SELECT o_custkey, r,
      |         SUM(r) OVER (ORDER BY r DESC, o_custkey) AS cum
      |  FROM rev
      |)
      |SELECT o_custkey, CAST(r AS DOUBLE) AS revenue,
      |       CAST(ROUND(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 6) AS DOUBLE) AS cum_share,
      |       CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) <= 0.8 AS in_top80
      |FROM ranked, tot
      |ORDER BY revenue DESC, o_custkey""".stripMargin) { (spark, dir) =>
    val rev = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("r"))
    val tot = rev.agg(sum(col("r")).as("t"))
    // Running revenue total via TotalOrder.prefixSum — the customer-level
    // frame scales with the table, so no un-partitioned SUM window.
    graft.operators.TotalOrder
      .prefixSum(rev, Seq(col("r").desc, col("o_custkey")), "r", "cum")
      .crossJoin(broadcast(tot))
      .select(col("o_custkey"), col("r").cast("double").as("revenue"),
        round(col("cum").cast("double") / col("t").cast("double"), 6).as("cum_share"),
        (col("cum").cast("double") / col("t").cast("double") <= 0.8).as("in_top80"))
      .orderBy(col("revenue").desc, col("o_custkey"))
  }

  /** Corpus bigram frequencies: top-50 word bigrams — the n-gram
    * statistics pass of LM data work ([[TextFunctions.wordNgrams]],
    * guarded for short/blank docs), one explode + one uniform-key
    * aggregate + TakeOrdered.
    */
  val text_ngram_freq = OpQuery(
    "text_ngram_freq",
    """WITH toks AS (
      |  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ts
      |  FROM documents WHERE coalesce(trim(text), '') <> ''
      |), bi AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
      |           i -> array_to_string(list_slice(ts, i, i + 1), ' '))) AS bigram
      |  FROM toks WHERE len(ts) >= 2
      |)
      |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
      |FROM bi GROUP BY bigram
      |ORDER BY n DESC, bigram
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    t(spark, dir, "documents")
      .filter(coalesce(trim(col("text")), lit("")) =!= "")
      .select(explode(TextFunctions.wordNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
  }

  val all: Seq[OpQuery] = Seq(
    rfm_segmentation, basket_lift, pareto_analysis, text_ngram_freq)
}
