package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Retrieval

/** Round-7 batch 6: signed feature hashing
  * ([[Retrieval.hashedFeatures]]) — the vocabulary-free featurizer
  * bridging the documents table to the vector stack. md5-derived
  * buckets and signs are replayed exactly by DuckDB (hex-slice casts),
  * and the checksum is position-weighted over the DENSE output vector,
  * so a bucket-order or layout slip hash-fails, not just a count slip.
  */
object Round7Ops6 {

  val text_hash_embed = OpQuery(
    "text_hash_embed",
    """WITH toks AS (
      |  SELECT doc_id, t.tok AS tok
      |  FROM (SELECT doc_id,
      |               regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |        FROM documents),
      |       unnest(ts) AS t(tok)
      |  WHERE t.tok <> ''
      |), hb AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 32 AS b,
      |         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
      |              THEN 1 ELSE -1 END AS s
      |  FROM toks
      |), cells AS (
      |  SELECT doc_id, b, SUM(s) AS v
      |  FROM hb GROUP BY doc_id, b HAVING SUM(s) <> 0
      |), agg AS (
      |  SELECT doc_id, COUNT(*) AS nnz, SUM(ABS(v)) AS l1,
      |         SUM((b + 1) * v) AS checksum
      |  FROM cells GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST(COALESCE(a.nnz, 0) AS INT) AS nnz,
      |       CAST(COALESCE(a.l1, 0) AS BIGINT) AS l1,
      |       CAST(COALESCE(a.checksum, 0) AS BIGINT) AS checksum
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    Retrieval.hashedFeatures(
        Tables.load(spark, dir, "documents"), "doc_id", "text", dim = 32)
      .withColumn("checksum",
        expr("aggregate(transform(sequence(0, 31), " +
          "i -> (i + 1) * element_at(vector, i + 1)), 0L, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("nnz"), col("l1"), col("checksum"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(text_hash_embed)
}
