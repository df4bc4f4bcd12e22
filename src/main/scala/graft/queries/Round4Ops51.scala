package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-4 batch 51: native HLL sketch SQL functions, approx-percentile
  * error bounds, and winnowing fingerprints.
  */
object Round4Ops51 {

  /** Native HLL sketch functions (hll_sketch_agg → hll_sketch_estimate):
    * the SQL-surface sketch path (the custom DataSketches rollup gate
    * a20 covers re-aggregation; this pins the built-in functions). The
    * estimate itself is approximate, so the gate emits the EXACT count
    * plus an in-bound flag the oracle states as literal truth — the
    * accuracy contract is what's hash-pinned.
    */
  val a39_hll_native = OpQuery(
    "a39_hll_native",
    """SELECT o_orderpriority,
      |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
      |       CAST(true AS BOOLEAN) AS hll_within_5pct
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_hlln_orders")
    spark.sql(
      """SELECT o_orderpriority,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
        |       CAST(abs(hll_sketch_estimate(hll_sketch_agg(o_custkey)) - COUNT(DISTINCT o_custkey))
        |            <= 0.05 * COUNT(DISTINCT o_custkey) AS BOOLEAN) AS hll_within_5pct
        |FROM graft_hlln_orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** approx_percentile with an explicit accuracy contract: the estimate
    * must land within the exact p40–p60 band for the median query —
    * the error model made checkable, same pattern as the HLL gate.
    */
  val a40_approx_percentile_bound = OpQuery(
    "a40_approx_percentile_bound",
    """WITH x AS (SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v FROM orders)
      |SELECT CAST(quantile_disc(v, 0.4) AS BIGINT) AS p40,
      |       CAST(quantile_disc(v, 0.6) AS BIGINT) AS p60,
      |       CAST(true AS BOOLEAN) AS approx_median_in_band
      |FROM x""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_apb_orders")
    spark.sql(
      """WITH x AS (SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v FROM graft_apb_orders)
        |SELECT CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p40,
        |       CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p60,
        |       CAST(approx_percentile(v, 0.5, 1000)
        |              BETWEEN percentile_disc(0.4) WITHIN GROUP (ORDER BY v)
        |                  AND percentile_disc(0.6) WITHIN GROUP (ORDER BY v) AS BOOLEAN) AS approx_median_in_band
        |FROM x""".stripMargin)
  }

  /** Winnowing fingerprints (the MOSS algorithm): per position, the MIN
    * shingle hash over a sliding window — guaranteed to fingerprint any
    * match longer than window+shingle, with far fewer fingerprints than
    * all-shingles. Cross-doc shared-fingerprint counts over a planted
    * containment corpus; candidates only ever meet through the
    * fingerprint inverted index.
    */
  val dedup_winnowing = OpQuery(
    "dedup_winnowing",
    """WITH corpus AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |hashes AS (
      |  SELECT doc_id, u.i AS pos,
      |         CAST(('0x' || substr(md5(array_to_string(t[u.i:u.i+2], ' ')), 1, 8)) AS BIGINT) AS h
      |  FROM corpus, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)),
      |winnowed AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id,
      |           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
      |           pos
      |    FROM hashes) WHERE pos >= 4),
      |shared AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_fps
      |  FROM winnowed a JOIN winnowed b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2, CAST(shared_fps AS BIGINT) AS shared_fps
      |FROM shared
      |WHERE shared_fps >= 5
      |ORDER BY d1, d2""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_win_docs")
    spark.sql(
      """WITH corpus AS (
        |  SELECT doc_id, split(lower(trim(text)), '\\s+') AS t
        |  FROM graft_win_docs),
        |hashes AS (
        |  SELECT doc_id, u.i AS pos,
        |         CAST(conv(substring(md5(array_join(slice(t, u.i, 3), ' ')), 1, 8), 16, 10) AS BIGINT) AS h
        |  FROM corpus LATERAL VIEW explode(sequence(1, greatest(size(t) - 2, 1))) u AS i),
        |winnowed AS (
        |  SELECT DISTINCT doc_id, fp FROM (
        |    SELECT doc_id,
        |           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
        |           pos
        |    FROM hashes) WHERE pos >= 4),
        |shared AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared_fps
        |  FROM winnowed a JOIN winnowed b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, CAST(shared_fps AS BIGINT) AS shared_fps
        |FROM shared
        |WHERE shared_fps >= 5
        |ORDER BY d1, d2""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(
    a39_hll_native, a40_approx_percentile_bound, dedup_winnowing)
}
