package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 92: a fully ORACLE-VERIFIED MinHash-LSH pipeline
  * (md5-derived hash family, so DuckDB can replay every stage) and a
  * two-sample Poisson rate test.
  */
object Round4Ops92 {

  /** MinHash + banded LSH with an md5-derived hash family: 3-word
    * shingles → 8 minhashes → 4 bands of 2 → candidate pairs sharing a
    * band → exact-Jaccard verification. The production pipeline
    * (`dedup_minhash_lsh`) uses Murmur3 and is rows-only at the gate;
    * THIS gate trades hash speed for DuckDB-expressibility so the
    * entire sign→band→join→verify pipeline is hash-matched end to end —
    * the strongest correctness evidence the LSH family has. Capped at
    * 300 docs; the scale path remains the Murmur3 pipeline.
    */
  val dedup_minhash_md5 = OpQuery(
    "dedup_minhash_md5",
    """WITH toks AS (
      |  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                      s -> length(s) > 0) AS ws
      |        FROM documents WHERE doc_id < 300) d),
      |shingles AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
      |  FROM toks a
      |  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |hashed AS (
      |  SELECT s.doc_id, j.j, s.sh,
      |         CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || s.sh), 1, 8))
      |              AS BIGINT) AS h
      |  FROM shingles s, (SELECT unnest(range(1, 9)) AS j) j),
      |sig AS (
      |  SELECT doc_id, j, MIN(h) AS mh FROM hashed GROUP BY doc_id, j),
      |bands AS (
      |  SELECT doc_id, CAST((j - 1) AS BIGINT) // 2 AS b,
      |         MIN(CASE WHEN j % 2 = 1 THEN mh END) AS v1,
      |         MIN(CASE WHEN j % 2 = 0 THEN mh END) AS v2
      |  FROM sig GROUP BY doc_id, CAST((j - 1) AS BIGINT) // 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
      |inter AS (
      |  SELECT c.d1, c.d2, COUNT(*) AS i
      |  FROM cand c
      |  JOIN shingles s1 ON s1.doc_id = c.d1
      |  JOIN shingles s2 ON s2.doc_id = c.d2 AND s2.sh = s1.sh
      |  GROUP BY c.d1, c.d2)
      |SELECT i.d1, i.d2,
      |       CAST(ROUND(CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i), 6) AS DOUBLE)
      |         AS jaccard
      |FROM inter i
      |JOIN sizes z1 ON i.d1 = z1.doc_id
      |JOIN sizes z2 ON i.d2 = z2.doc_id
      |WHERE CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) >= 0.4
      |ORDER BY i.d1, i.d2""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_mh_docs")
    spark.sql(
      """WITH toks AS (
        |  SELECT doc_id, i0 + 1 AS i, w FROM (
        |    SELECT doc_id,
        |           posexplode(filter(split(lower(text), '[^a-z0-9]+'),
        |                             s -> length(s) > 0)) AS (i0, w)
        |    FROM graft_mh_docs WHERE doc_id < 300) d),
        |shingles AS (
        |  SELECT DISTINCT a.doc_id, concat(a.w, ' ', b.w, ' ', c.w) AS sh
        |  FROM toks a
        |  JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |hashed AS (
        |  SELECT s.doc_id, j.j, s.sh,
        |         CAST(conv(substr(md5(concat(CAST(j.j AS STRING), ':', s.sh)), 1, 8),
        |                   16, 10) AS BIGINT) AS h
        |  FROM shingles s CROSS JOIN (SELECT explode(sequence(1, 8)) AS j) j),
        |sig AS (
        |  SELECT doc_id, j, MIN(h) AS mh FROM hashed GROUP BY doc_id, j),
        |bands AS (
        |  SELECT doc_id, CAST((j - 1) AS BIGINT) DIV 2 AS b,
        |         MIN(CASE WHEN j % 2 = 1 THEN mh END) AS v1,
        |         MIN(CASE WHEN j % 2 = 0 THEN mh END) AS v2
        |  FROM sig GROUP BY doc_id, CAST((j - 1) AS BIGINT) DIV 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
        |inter AS (
        |  SELECT c.d1, c.d2, COUNT(*) AS i
        |  FROM cand c
        |  JOIN shingles s1 ON s1.doc_id = c.d1
        |  JOIN shingles s2 ON s2.doc_id = c.d2 AND s2.sh = s1.sh
        |  GROUP BY c.d1, c.d2)
        |SELECT i.d1, i.d2,
        |       CAST(ROUND(CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i), 6) AS DOUBLE)
        |         AS jaccard
        |FROM inter i
        |JOIN sizes z1 ON i.d1 = z1.doc_id
        |JOIN sizes z2 ON i.d2 = z2.doc_id
        |WHERE CAST(i.i AS DOUBLE) / (z1.n + z2.n - i.i) >= 0.4
        |ORDER BY i.d1, i.d2""".stripMargin)
  }

  /** Two-sample Poisson rate test: error rate in the first half of the
    * observation window vs the second — the deploy-regression check.
    * Exposure is exact epoch seconds; the z statistic uses the
    * square-root (variance-stabilizing) form, all from four integers.
    */
  val a67_poisson_rate_test = OpQuery(
    "a67_poisson_rate_test",
    """WITH bounds AS (
      |  SELECT MIN(TRUNC(epoch(ts))::BIGINT) AS lo, MAX(TRUNC(epoch(ts))::BIGINT) AS hi
      |  FROM events),
      |halves AS (
      |  SELECT CASE WHEN TRUNC(epoch(ts))::BIGINT * 2 < b.lo + b.hi THEN 0 ELSE 1 END
      |           AS half,
      |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      |  FROM events CROSS JOIN bounds b),
      |m AS (
      |  SELECT SUM(CASE WHEN half = 0 THEN is_err ELSE 0 END) AS e1,
      |         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
      |         SUM(CASE WHEN half = 1 THEN is_err ELSE 0 END) AS e2,
      |         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
      |  FROM halves)
      |SELECT CAST(e1 AS BIGINT) AS errors_h1, CAST(n1 AS BIGINT) AS events_h1,
      |       CAST(e2 AS BIGINT) AS errors_h2, CAST(n2 AS BIGINT) AS events_h2,
      |       CAST(ROUND((CAST(e2 AS DOUBLE) / n2) / (CAST(e1 AS DOUBLE) / n1), 6)
      |            AS DOUBLE) AS rate_ratio,
      |       CAST(ROUND(2 * (sqrt(CAST(e2 AS DOUBLE) + 0.375) -
      |                       sqrt((CAST(e1 AS DOUBLE) + 0.375) * n2 / n1)) /
      |                  sqrt(1 + CAST(n2 AS DOUBLE) / n1), 6) AS DOUBLE) AS z_anscombe
      |FROM m""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_pr_events")
    spark.sql(
      """WITH bounds AS (
        |  SELECT MIN(unix_timestamp(ts)) AS lo, MAX(unix_timestamp(ts)) AS hi
        |  FROM graft_pr_events),
        |halves AS (
        |  SELECT CASE WHEN unix_timestamp(ts) * 2 < b.lo + b.hi THEN 0 ELSE 1 END
        |           AS half,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        |  FROM graft_pr_events CROSS JOIN bounds b),
        |m AS (
        |  SELECT SUM(CASE WHEN half = 0 THEN is_err ELSE 0 END) AS e1,
        |         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
        |         SUM(CASE WHEN half = 1 THEN is_err ELSE 0 END) AS e2,
        |         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
        |  FROM halves)
        |SELECT CAST(e1 AS BIGINT) AS errors_h1, CAST(n1 AS BIGINT) AS events_h1,
        |       CAST(e2 AS BIGINT) AS errors_h2, CAST(n2 AS BIGINT) AS events_h2,
        |       CAST(ROUND((CAST(e2 AS DOUBLE) / n2) / (CAST(e1 AS DOUBLE) / n1), 6)
        |            AS DOUBLE) AS rate_ratio,
        |       CAST(ROUND(2 * (sqrt(CAST(e2 AS DOUBLE) + 0.375) -
        |                       sqrt((CAST(e1 AS DOUBLE) + 0.375) * n2 / n1)) /
        |                  sqrt(1 + CAST(n2 AS DOUBLE) / n1), 6) AS DOUBLE) AS z_anscombe
        |FROM m""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(dedup_minhash_md5, a67_poisson_rate_test)
}
