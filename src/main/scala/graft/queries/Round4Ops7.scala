package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.EventAnalytics

/** Round-4 batch 7: regression aggregates, distribution entropy,
  * sequence-pattern matching, and the outer-join family.
  */
object Round4Ops7 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Linear-regression aggregates per group: slope, intercept, and R²
    * of extended price against quantity — the SQL-standard regr_*
    * family, one pass, identical semantics both engines.
    */
  val a18_regression = OpQuery(
    "a18_regression",
    """SELECT l_returnflag,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE) AS slope,
      |       CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS DOUBLE) AS intercept,
      |       CAST(ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r2
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Shannon entropy of each user's event-type distribution — the
    * behavioral-diversity feature (and the label-balance diagnostic, on
    * a label column) computed as -Σ p·ln p over per-(user, type) counts.
    */
  val a19_entropy = OpQuery(
    "a19_entropy",
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
      |), tot AS (
      |  SELECT user_id, SUM(n) AS t FROM c GROUP BY 1
      |)
      |SELECT c.user_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_types,
      |       CAST(ROUND(-SUM((n * 1.0 / t) * ln(n * 1.0 / t)), 6) AS DOUBLE) AS entropy
      |FROM c JOIN tot ON c.user_id = tot.user_id
      |GROUP BY c.user_id
      |ORDER BY c.user_id""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("user_id")).agg(sum(col("n")).as("t"))
    val p = col("n") * 1.0 / col("t")
    c.join(tot, "user_id")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_types"),
        round(-sum(p * log(p)), 6).as("entropy"))
      .orderBy(col("user_id"))
  }

  /** Sequence-pattern matching: does the user's full ordered event
    * string contain an IMMEDIATE view→purchase transition? The
    * contiguous-pattern complement to the (any-gap) funnel operator —
    * both engines scan the same canonical sequence string.
    */
  val seq_pattern = OpQuery(
    "seq_pattern",
    """WITH seq AS (
      |  SELECT user_id,
      |         array_to_string(list(event_type ORDER BY epoch_us(ts), event_id), '>') AS s
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id, strpos(s, 'view>purchase') > 0 AS has_immediate_conversion
      |FROM seq ORDER BY user_id""".stripMargin) { (spark, dir) =>
    EventAnalytics.userSequences(t(spark, dir, "events"), maxLen = 1 << 20)
      .select(col("user_id"),
        (instr(col("head_seq"), "view>purchase") > 0)
          .as("has_immediate_conversion"))
      .orderBy(col("user_id"))
  }

  /** Outer-join family: FULL OUTER of two aggregates with key ranges
    * that overhang on BOTH sides, null-extended rows surviving into
    * downstream arithmetic via coalesce.
    */
  val j15_outer_family = OpQuery(
    "j15_outer_family",
    """WITH s AS (
      |  SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp
      |  FROM supplier WHERE s_nationkey < 15 GROUP BY 1
      |), c AS (
      |  SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
      |  FROM customer WHERE c_nationkey > 8 GROUP BY 1
      |)
      |SELECT COALESCE(s.k, c.k) AS k,
      |       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp,
      |       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
      |       s.k IS NULL AS cust_only, c.k IS NULL AS supp_only
      |FROM s FULL OUTER JOIN c ON s.k = c.k
      |ORDER BY k""".stripMargin) { (spark, dir) =>
    val s = t(spark, dir, "supplier").filter(col("s_nationkey") < 15)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    val c = t(spark, dir, "customer").filter(col("c_nationkey") > 8)
      .groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    s.join(c, col("sk") === col("ck"), "full_outer")
      .select(
        coalesce(col("sk"), col("ck")).as("k"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        col("sk").isNull.as("cust_only"),
        col("ck").isNull.as("supp_only"))
      .orderBy(col("k"))
  }

  val all: Seq[OpQuery] = Seq(
    a18_regression, a19_entropy, seq_pattern, j15_outer_family)
}
