package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.Tables

/** Round-4 batch 16: XML source round trip and error-tolerant CSV
  * ingest (PERMISSIVE corrupt-record recovery).
  */
object Round4Ops16 {

  /** XML source (built into Spark 4): write a rowTag'd XML extract,
    * read it back with an explicit schema. The oracle states the
    * expected result straight from `documents` — the XML file is only
    * ever touched by the Spark side, so the compare proves the
    * serialize→parse round trip lost nothing.
    */
  val s22_xml_scan = OpQuery(
    "s22_xml_scan",
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE doc_id % 4 = 2
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val xmlPath = s"/tmp/graft_landing_s22_${math.abs(dir.hashCode)}.xml"
    if (!Files.exists(Paths.get(xmlPath, "_SUCCESS"))) {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").format("xml").option("rowTag", "doc")
        .save(xmlPath)
    }
    spark.read.format("xml").option("rowTag", "doc")
      .schema("doc_id BIGINT, lang STRING, n_chars BIGINT")
      .load(xmlPath)
      .filter(col("doc_id") % 4 === 2)
      .orderBy(col("doc_id"))
  }

  /** Error-tolerant CSV ingest: a landing file where every 13th row is
    * garbage. PERMISSIVE mode parses the good rows, quarantines the bad
    * ones into `_corrupt_record` (nothing dropped silently — FAILFAST
    * would kill the load, DROPMALFORMED would hide the loss), and the
    * raw text is still recoverable (the id is re-extracted from the
    * corrupt line). The oracle derives the same rows + corruption
    * pattern from `documents` without ever touching the file.
    */
  val s23_csv_corrupt = OpQuery(
    "s23_csv_corrupt",
    """WITH first300 AS (
      |  SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 300
      |)
      |SELECT CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id END AS INT) AS doc_id,
      |       -- PERMISSIVE keeps fields that DID parse on a corrupt row:
      |       -- the unparseable doc_id nulls, the plain-string '@' stays
      |       CASE WHEN doc_id % 13 = 0 THEN '@' ELSE lang END AS lang,
      |       doc_id % 13 = 0 AS is_corrupt,
      |       CAST(CASE WHEN doc_id % 13 = 0 THEN doc_id END AS INT) AS recovered_id
      |FROM first300
      |ORDER BY coalesce(doc_id, recovered_id)""".stripMargin) { (spark, dir) =>
    val csvPath = s"/tmp/graft_landing_s23_${math.abs(dir.hashCode)}.csv"
    if (!Files.exists(Paths.get(csvPath))) {
      val rows = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")).limit(300)
        .collect()
      val lines = "doc_id,lang" +: rows.map { r =>
        val id = r.getLong(0)
        if (id % 13 == 0) s"CORRUPT#$id,@,@,@" // wrong arity + bad types
        else s"$id,${r.getString(1)}"
      }
      val tmp = Paths.get(csvPath + ".tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, Paths.get(csvPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val schema = StructType(Seq(
      StructField("doc_id", IntegerType),
      StructField("lang", StringType),
      StructField("_corrupt_record", StringType)))
    spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(csvPath)
      .select(col("doc_id"), col("lang"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        nullif(regexp_extract(col("_corrupt_record"), "CORRUPT#(\\d+)", 1), lit(""))
          .cast("int").as("recovered_id"))
      .orderBy(coalesce(col("doc_id"), col("recovered_id")))
  }

  /** Parquet schema-merge read: two file batches written with DIFFERENT
    * schemas (a column added mid-stream — the normal life of a landing
    * zone) read back as one unified frame with `mergeSchema`, old rows
    * null-extended. The oracle restates the union from `documents`.
    */
  val s24_parquet_mergeschema = OpQuery(
    "s24_parquet_mergeschema",
    """SELECT doc_id, lang,
      |       CAST(CASE WHEN doc_id % 2 = 1 THEN n_chars END AS BIGINT) AS n_chars
      |FROM documents
      |WHERE doc_id % 4 = 3
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val base = s"/tmp/graft_landing_s24_${math.abs(dir.hashCode)}"
    if (!Files.exists(Paths.get(base, "old", "_SUCCESS"))) {
      val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") % 4 === 3)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$base/old")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$base/new")
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$base/old", s"$base/new")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(s22_xml_scan, s23_csv_corrupt, s24_parquet_mergeschema)
}
