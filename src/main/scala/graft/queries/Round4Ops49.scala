package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Round-4 batch 49: ANN evaluation-as-a-query, deterministic UUIDs,
  * and row/column security policies.
  */
object Round4Ops49 {

  /** ANN evaluation harness expressed IN the engine: recall@10 of the
    * IVF index against the exact brute-force answer, per query — the
    * report that gates every index deployment. Rows-only (IVF cell
    * assignment is engine-internal); SimilaritySpec pins the recall
    * floor, this gate materializes the per-query report the spec
    * summarizes.
    */
  val sim_recall_report = OpQuery(
    "sim_recall_report",
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
      |  FROM embeddings WHERE vec_id < 20
      |), exact AS (
      |  SELECT query_id, corpus_id FROM (
      |    SELECT q.query_id, e.vec_id AS corpus_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.query_id
      |             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) DESC,
      |                      e.vec_id ASC) AS rank
      |    FROM embeddings e, q WHERE e.vec_id <> q.query_id)
      |  WHERE rank <= 10
      |), cents AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell_id,
      |         embedding::DOUBLE[] AS centroid
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
      |), assigned AS (
      |  SELECT vec_id, embedding, cell_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |             ORDER BY -list_cosine_similarity(e.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN cents c)
      |  WHERE rn = 1
      |), probes AS (
      |  SELECT query_id, qvec, cell_id FROM (
      |    SELECT q.query_id, q.qvec, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.query_id
      |             ORDER BY -list_cosine_similarity(q.qvec, c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM q CROSS JOIN cents c)
      |  WHERE rn <= 4
      |), approx AS (
      |  SELECT query_id, corpus_id FROM (
      |    SELECT p.query_id, a.vec_id AS corpus_id,
      |           ROW_NUMBER() OVER (PARTITION BY p.query_id
      |             ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], p.qvec) DESC,
      |                      a.vec_id ASC) AS rank
      |    FROM assigned a JOIN probes p ON p.cell_id = a.cell_id
      |    WHERE a.vec_id <> p.query_id)
      |  WHERE rank <= 10
      |)
      |SELECT e.query_id,
      |       CAST(ROUND(COUNT(a.corpus_id) / 10.0, 2) AS DOUBLE) AS recall_at_10
      |FROM exact e LEFT JOIN approx a
      |  ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
      |GROUP BY e.query_id
      |ORDER BY e.query_id""".stripMargin) { (spark, dir) =>
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select(col("query_id"), col("corpus_id"))
    val approx = Similarity.ivfTopK(emb, queries, 10, numCells = 16, nprobe = 4)
      .select(col("query_id"), col("corpus_id").as("approx_id"))
    exact.join(approx,
        exact("query_id") === approx("query_id") &&
          exact("corpus_id") === approx("approx_id"), "left")
      .groupBy(exact("query_id"))
      .agg((count(col("approx_id")) / 10.0).as("recall_at_10"))
      .select(col("query_id").cast("long").as("query_id"),
        round(col("recall_at_10"), 2).as("recall_at_10"))
      .orderBy("query_id")
  }

  /** Deterministic namespaced UUIDs (v3-style): md5 of namespace+key
    * formatted as 8-4-4-4-12 — the stable-id mint for entity resolution
    * (same input, same id, any engine, any day).
    */
  val f_uuid_deterministic = OpQuery(
    "f_uuid_deterministic",
    """WITH h AS (
      |  SELECT doc_id, md5(concat('graft-docs:', CAST(doc_id AS VARCHAR))) AS m
      |  FROM documents WHERE doc_id % 17 = 0)
      |SELECT doc_id,
      |       concat(substr(m, 1, 8), '-', substr(m, 9, 4), '-', substr(m, 13, 4), '-',
      |              substr(m, 17, 4), '-', substr(m, 21, 12)) AS stable_uuid
      |FROM h
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_uuid_docs")
    spark.sql(
      """WITH h AS (
        |  SELECT doc_id, md5(concat('graft-docs:', CAST(doc_id AS STRING))) AS m
        |  FROM graft_uuid_docs WHERE doc_id % 17 = 0)
        |SELECT doc_id,
        |       concat(substring(m, 1, 8), '-', substring(m, 9, 4), '-', substring(m, 13, 4), '-',
        |              substring(m, 17, 4), '-', substring(m, 21, 12)) AS stable_uuid
        |FROM h
        |ORDER BY doc_id""".stripMargin)
  }

  /** Row- and column-level policy enforcement as relational rewrites:
    * rows restricted to an allowlisted tenant set (semi join against
    * the policy table) and a sensitive column masked except for exempt
    * rows — governance as part of the plan, where it cannot be
    * bypassed by a different reader.
    */
  val dq_row_column_policy = OpQuery(
    "dq_row_column_policy",
    """WITH policy AS (
      |  SELECT unnest(['src1', 'src3', 'src5', 'src7']) AS tenant),
      |visible AS (
      |  SELECT d.doc_id, d.source, d.lang, d.text
      |  FROM documents d WHERE EXISTS (SELECT 1 FROM policy p WHERE p.tenant = d.source))
      |SELECT doc_id, source, lang,
      |       CASE WHEN lang = 'en' THEN text ELSE concat('masked:', md5(text)) END AS text_out
      |FROM visible
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_pol_docs")
    spark.sql(
      """WITH policy AS (
        |  SELECT explode(array('src1', 'src3', 'src5', 'src7')) AS tenant),
        |visible AS (
        |  SELECT d.doc_id, d.source, d.lang, d.text
        |  FROM graft_pol_docs d LEFT SEMI JOIN policy p ON p.tenant = d.source)
        |SELECT doc_id, source, lang,
        |       CASE WHEN lang = 'en' THEN text ELSE concat('masked:', md5(text)) END AS text_out
        |FROM visible
        |ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(
    sim_recall_report, f_uuid_deterministic, dq_row_column_policy)
}
