package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Curation

/** Round-7 batch 3: exact substring REMOVAL — the rewrite step of Lee
  * et al.'s ExactSubstr dedup, completing the audit-only `dedup_spans`
  * gate ([[Curation.duplicatedSpans]]) with the actual text surgery
  * ([[Curation.removeDuplicatedSpans]]): duplicated 8-token windows are
  * cut from every document, overlapping windows merge into maximal
  * spans, and the document is rebuilt from surviving tokens. The oracle
  * replays the whole pipeline relationally (fingerprint windows → dup
  * set → covered positions → anti-join → ordered string_agg), and the
  * rebuilt text is compared by md5 — a one-token slip in interval
  * merging, position arithmetic, or token order hash-fails.
  */
object Round7Ops3 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables.load(spark, dir, name)

  val dedup_substring_rewrite = OpQuery(
    "dedup_substring_rewrite",
    """WITH src AS (
      |  SELECT doc_id,
      |         regexp_split_to_array(trim(text), '\s+') AS tso,
      |         regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), sp AS (
      |  SELECT doc_id, u.i AS p, md5(array_to_string(ts[u.i:u.i+7], ' ')) AS k
      |  FROM src, unnest(generate_series(1, len(ts) - 7)) AS u(i)
      |), dup AS (
      |  SELECT k FROM sp GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2
      |), cov AS (
      |  SELECT DISTINCT sp.doc_id, c.i
      |  FROM sp JOIN dup USING (k),
      |       unnest(generate_series(sp.p, sp.p + 7)) AS c(i)
      |), tok AS (
      |  SELECT doc_id, u.i, tso[u.i] AS tk
      |  FROM src, unnest(generate_series(1, len(tso))) AS u(i)
      |), kept AS (
      |  SELECT t.doc_id, t.i, t.tk
      |  FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.i = t.i
      |  WHERE cov.i IS NULL
      |), reb AS (
      |  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS txt
      |  FROM kept GROUP BY doc_id
      |), ndrop AS (
      |  SELECT doc_id, COUNT(*) AS nd FROM cov GROUP BY doc_id
      |)
      |SELECT s.doc_id,
      |       CAST(len(s.tso) AS INT) AS n_tokens,
      |       CAST(COALESCE(d.nd, 0) AS INT) AS n_dropped,
      |       md5(COALESCE(r.txt, '')) AS clean_md5
      |FROM src s
      |LEFT JOIN reb r USING (doc_id)
      |LEFT JOIN ndrop d USING (doc_id)
      |ORDER BY s.doc_id""".stripMargin) { (spark, dir) =>
    Curation.removeDuplicatedSpans(
        t(spark, dir, "documents"), "doc_id", "text", n = 8, minDocs = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_dropped"),
        md5(col("text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** keepFirst variant (the Lee-et-al convention): the globally first
    * occurrence of each duplicated window — min (doc, pos) — survives,
    * so exactly one copy of the duplicated content remains in the
    * corpus instead of zero. The oracle adds the winner election
    * (ROW_NUMBER over the fingerprint) and excludes winners from the
    * covered-position set.
    */
  val dedup_substring_keep_first = OpQuery(
    "dedup_substring_keep_first",
    """WITH src AS (
      |  SELECT doc_id,
      |         regexp_split_to_array(trim(text), '\s+') AS tso,
      |         regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents
      |), sp AS (
      |  SELECT doc_id, u.i AS p, md5(array_to_string(ts[u.i:u.i+7], ' ')) AS k
      |  FROM src, unnest(generate_series(1, len(ts) - 7)) AS u(i)
      |), dup AS (
      |  SELECT k FROM sp GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2
      |), win AS (
      |  SELECT k, doc_id, p FROM (
      |    SELECT s.k, s.doc_id, s.p,
      |           ROW_NUMBER() OVER (PARTITION BY s.k ORDER BY s.doc_id, s.p) AS rn
      |    FROM sp s JOIN dup USING (k))
      |  WHERE rn = 1
      |), cuts AS (
      |  SELECT s.doc_id, s.p
      |  FROM sp s JOIN dup USING (k)
      |  WHERE NOT EXISTS (SELECT 1 FROM win w
      |                    WHERE w.k = s.k AND w.doc_id = s.doc_id AND w.p = s.p)
      |), cov AS (
      |  SELECT DISTINCT cuts.doc_id, c.i
      |  FROM cuts, unnest(generate_series(cuts.p, cuts.p + 7)) AS c(i)
      |), tok AS (
      |  SELECT doc_id, u.i, tso[u.i] AS tk
      |  FROM src, unnest(generate_series(1, len(tso))) AS u(i)
      |), kept AS (
      |  SELECT t.doc_id, t.i, t.tk
      |  FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.i = t.i
      |  WHERE cov.i IS NULL
      |), reb AS (
      |  SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS txt
      |  FROM kept GROUP BY doc_id
      |), ndrop AS (
      |  SELECT doc_id, COUNT(*) AS nd FROM cov GROUP BY doc_id
      |)
      |SELECT s.doc_id,
      |       CAST(len(s.tso) AS INT) AS n_tokens,
      |       CAST(COALESCE(d.nd, 0) AS INT) AS n_dropped,
      |       md5(COALESCE(r.txt, '')) AS clean_md5
      |FROM src s
      |LEFT JOIN reb r USING (doc_id)
      |LEFT JOIN ndrop d USING (doc_id)
      |ORDER BY s.doc_id""".stripMargin) { (spark, dir) =>
    Curation.removeDuplicatedSpans(
        t(spark, dir, "documents"), "doc_id", "text", n = 8, minDocs = 2,
        keepFirst = true)
      .select(col("doc_id"), col("n_tokens"), col("n_dropped"),
        md5(col("text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] =
    Seq(dedup_substring_rewrite, dedup_substring_keep_first)
}
