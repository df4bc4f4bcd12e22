package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Round-4 batch 6: weighted sampling, winsorization, dataset
  * profiling, and the long tail of string functions.
  */
object Round4Ops6 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Weighted sampling without replacement
    * ([[Sampling.weightedSample]], Efraimidis–Spirakis A-Res): 100
    * parts drawn by retail-price weight. The oracle replays the
    * priority formula — ln(md5-uniform)/weight, top-k — so the gate
    * hash-pins the exact selected set, not just its size.
    */
  val sample_weighted = OpQuery(
    "sample_weighted",
    """WITH pri AS (
      |  SELECT p_partkey,
      |         ln((CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
      |            / 4294967296.0) / p_retailprice AS pri
      |  FROM part
      |  WHERE p_retailprice IS NOT NULL AND p_retailprice > 0
      |), sel AS (
      |  SELECT p_partkey FROM pri ORDER BY pri DESC, p_partkey LIMIT 100
      |)
      |SELECT s.p_partkey,
      |       CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      |FROM sel s JOIN part p ON s.p_partkey = p.p_partkey
      |ORDER BY s.p_partkey""".stripMargin) { (spark, dir) =>
    val part = t(spark, dir, "part")
    Sampling.weightedSample(part, "p_partkey", "p_retailprice", k = 100)
      .join(part, "p_partkey")
      .select(col("p_partkey"),
        col("p_retailprice").cast("decimal(12,2)").cast("double").as("price"))
      .orderBy(col("p_partkey"))
  }

  /** Winsorization: clamp per-group outliers at the exact interpolated
    * p05/p95 (computed over cents, bounds snapped to integers so the
    * clamped sum stays in exact BIGINT arithmetic — zero float variance
    * in the output).
    */
  val feature_winsorize = OpQuery(
    "feature_winsorize",
    """WITH c AS (
      |  SELECT l_returnflag AS g,
      |         CAST(TRUNC(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem
      |), b AS (
      |  SELECT g,
      |         CAST(CEIL(ROUND(quantile_cont(cents, 0.05), 4)) AS BIGINT) AS lo,
      |         CAST(FLOOR(ROUND(quantile_cont(cents, 0.95), 4)) AS BIGINT) AS hi
      |  FROM c GROUP BY g
      |)
      |SELECT c.g, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      |       CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
      |       CAST(SUM(LEAST(GREATEST(cents, lo), hi)) AS BIGINT) AS sum_wins_cents
      |FROM c JOIN b ON c.g = b.g
      |GROUP BY c.g
      |ORDER BY c.g""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("long").as("cents"))
    val b = c.groupBy(col("g"))
      .agg(
        ceil(round(percentile(col("cents"), lit(0.05)), 4)).cast("long").as("lo"),
        floor(round(percentile(col("cents"), lit(0.95)), 4)).cast("long").as("hi"))
    c.join(broadcast(b), "g")
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(least(greatest(col("cents"), col("lo")), col("hi"))).as("sum_wins_cents"))
      .orderBy(col("g"))
  }

  /** Dataset profiler: per-column row count, null count, exact distinct
    * count, and min/max (rendered as strings through a shared DECIMAL
    * cast so numeric formatting matches across engines) — the
    * first-look data-quality report over any table, one scan.
    */
  val dq_profile = OpQuery(
    "dq_profile",
    """SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
      |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
      |       CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
      |       CAST(MAX(o_custkey) AS VARCHAR) AS max_v
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
      |       CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
      |       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
      |       MIN(o_orderstatus), MAX(o_orderstatus)
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
      |       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
      |       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
      |       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
      |       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
      |       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
      |       MIN(o_orderpriority), MAX(o_orderpriority)
      |FROM orders
      |ORDER BY col_name""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    def profile(c: String, render: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      o.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        render(min(col(c))).as("min_v"),
        render(max(col(c))).as("max_v"))
        .select(lit(c).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    profile("o_custkey", _.cast("string"))
      .unionByName(profile("o_orderstatus", identity))
      .unionByName(profile("o_totalprice", _.cast("decimal(18,2)").cast("string")))
      .unionByName(profile("o_orderpriority", identity))
      .orderBy(col("col_name"))
  }

  /** The long tail of §2.7 string functions not already inside
    * `f_string`: levenshtein, translate, reverse, repeat,
    * position-of-substring, left/right slices, ascii. Identical
    * semantics in both engines (1-based positions, 0 when absent).
    */
  val f_string_extra = OpQuery(
    "f_string_extra",
    """SELECT p_partkey,
      |       CAST(levenshtein(p_name, 'small ring') AS INT) AS lev,
      |       translate(p_name, 'aeiou', 'AEIOU') AS tr,
      |       reverse(p_name) AS rev,
      |       repeat(p_brand, 2) AS rep,
      |       CAST(strpos(p_name, 'ring') AS INT) AS pos,
      |       left(p_name, 3) AS l3,
      |       right(p_name, 4) AS r4,
      |       CAST(ascii(p_name) AS INT) AS first_code
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "part")
      .select(col("p_partkey"),
        levenshtein(col("p_name"), lit("small ring")).as("lev"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_brand"), 2).as("rep"),
        instr(col("p_name"), "ring").as("pos"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 4)").as("r4"),
        ascii(col("p_name")).as("first_code"))
      .orderBy(col("p_partkey"))
  }

  val all: Seq[OpQuery] = Seq(
    sample_weighted, feature_winsorize, dq_profile, f_string_extra)
}
