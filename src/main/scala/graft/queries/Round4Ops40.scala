package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 40: dynamic SQL (EXECUTE IMMEDIATE), containment
  * dedup, and the _metadata hidden-column surface.
  */
object Round4Ops40 {

  /** EXECUTE IMMEDIATE with USING parameters (Spark 4): dynamic SQL
    * composed at runtime with typed bindings — the scripting surface
    * migration tools rely on. Oracle states the resolved query.
    */
  val p16_execute_immediate = OpQuery(
    "p16_execute_immediate",
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      |FROM documents
      |WHERE n_chars > 200
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_ei_docs")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_min_chars INT DEFAULT 200")
    spark.sql(
      """EXECUTE IMMEDIATE
        |'SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        | FROM graft_ei_docs WHERE n_chars > ? GROUP BY lang ORDER BY lang'
        |USING graft_min_chars""".stripMargin)
  }

  /** Containment dedup: C(A→B) = |shingles(A) ∩ shingles(B)| /
    * |shingles(A)| — the ASYMMETRIC overlap that catches a document
    * contained inside a longer one, which symmetric Jaccard misses when
    * sizes differ. Planted truncated copies (first 8 tokens of every
    * 40th doc) guarantee true containments. Candidates come from a
    * shared-shingle inverted index — never all pairs; the exact
    * containment is verified on candidates only.
    */
  val dedup_containment = OpQuery(
    "dedup_containment",
    """WITH corpus AS (
      |  SELECT doc_id, lower(trim(text)) AS text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |         array_to_string(regexp_split_to_array(lower(trim(text)), '\s+')[1:8], ' ')
      |  FROM documents WHERE doc_id % 40 = 0),
      |shingles AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT c.doc_id,
      |           array_to_string(regexp_split_to_array(c.text, '\s+')[u.i:u.i+2], ' ') AS sh
      |    FROM corpus c,
      |         unnest(generate_series(1, greatest(len(regexp_split_to_array(c.text, '\s+')) - 2, 1))) AS u(i))),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
      |ovl AS (
      |  SELECT a.doc_id AS small_doc, b.doc_id AS big_doc, COUNT(*) AS inter
      |  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT o.small_doc, o.big_doc,
      |       CAST(o.inter AS BIGINT) AS shared_shingles,
      |       CAST(sa.sz AS BIGINT) AS small_size
      |FROM ovl o JOIN sizes sa ON o.small_doc = sa.doc_id
      |WHERE o.inter * 10 >= sa.sz * 9
      |ORDER BY small_doc, big_doc""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_cont_docs")
    spark.sql(
      """WITH corpus AS (
        |  SELECT doc_id, lower(trim(text)) AS text FROM graft_cont_docs WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_join(slice(split(lower(trim(text)), '\\s+'), 1, 8), ' ')
        |  FROM graft_cont_docs WHERE doc_id % 40 = 0),
        |toks AS (SELECT doc_id, split(text, '\\s+') AS t FROM corpus),
        |shingles AS (
        |  SELECT DISTINCT doc_id,
        |         array_join(slice(t, u.i, 3), ' ') AS sh
        |  FROM toks
        |  LATERAL VIEW explode(sequence(1, greatest(size(t) - 2, 1))) u AS i),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
        |ovl AS (
        |  SELECT a.doc_id AS small_doc, b.doc_id AS big_doc, COUNT(*) AS inter
        |  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT o.small_doc, o.big_doc,
        |       CAST(o.inter AS BIGINT) AS shared_shingles,
        |       CAST(sa.sz AS BIGINT) AS small_size
        |FROM ovl o JOIN sizes sa ON o.small_doc = sa.doc_id
        |WHERE o.inter * 10 >= sa.sz * 9
        |ORDER BY small_doc, big_doc""".stripMargin)
  }

  /** Hidden _metadata columns: file-level provenance (name, size) rides
    * every file-source scan without being part of the schema — the
    * lineage hook audit pipelines use. Rendered to stable facts (file
    * count, rows, size sanity) since physical names are random.
    */
  val s36_file_metadata = OpQuery(
    "s36_file_metadata",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(1 AS BIGINT) AS n_files,
      |       CAST(true AS BOOLEAN) AS sizes_positive
      |FROM documents WHERE doc_id % 13 = 0""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 13 === 0).select("doc_id", "lang")
    val out = graft.queries.GateScratch.dir("graft-meta-").toString
    docs.coalesce(1).write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
      .select(col("doc_id"), col("_metadata.file_name").as("fn"),
        col("_metadata.file_size").as("fs"))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col("fn")).cast("long").as("n_files"),
        (min(col("fs")) > 0).as("sizes_positive"))
  }

  val all: Seq[OpQuery] = Seq(
    p16_execute_immediate, dedup_containment, s36_file_metadata)
}
