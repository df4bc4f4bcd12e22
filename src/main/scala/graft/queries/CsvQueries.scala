package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.Tables

/** S1/S2 — the bronze CSV landing read, oracle-checked: the query
  * materializes a deterministic landing CSV (derived from `documents`,
  * with the reference's "-" null sentinel and an empty field), then
  * reads it back with the exact bronze semantics: header on, inference
  * off (all STRING), "-" → NULL, explicit casts
  * (02_bronze.ipynb:131-143 cell-3).
  *
  * The oracle never touches the file: it states the expected round-trip
  * result straight from `documents`, so the Spark side's whole
  * write→read→normalize path is what's under test, and concurrent runs
  * at different scale factors can't race each other's CSVs (the path is
  * per-scale-factor and written atomically regardless).
  */
object CsvQueries {

  val s1_csv_scan = OpQuery(
    "s1_csv_scan",
    """WITH first200 AS (
      |  SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 200
      |)
      |SELECT CAST(doc_id AS VARCHAR) AS doc_id,
      |       CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang_n,
      |       CAST(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS INT) AS n_chars,
      |       CAST(doc_id % 7 AS INT) AS shard
      |FROM first200
      |ORDER BY CAST(doc_id AS INT)""".stripMargin) { (spark, dir) =>
    val csvPath = s"/tmp/graft_landing_s1_${math.abs(dir.hashCode)}.csv"
    // deterministic landing file: every 5th lang is the "-" sentinel,
    // every 7th n_chars empty — the FIXTURES.md §1 value domains
    val rows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
      .limit(200)
      .collect()
    val lines = "doc_id,lang,n_chars" +: rows.map { r =>
      val id = r.getLong(0)
      val lang = if (id % 5 == 0) "-" else r.getString(1)
      val n = if (id % 7 == 0) "" else r.getLong(2).toString
      s"$id,$lang,$n"
    }.toSeq
    val tmp = Paths.get(csvPath + s".tmp-${System.nanoTime()}")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(csvPath),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)

    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(csvPath)
    // "-" -> NULL over every column (bronze P7, the shared helper), casts
    val normalized = graft.pipeline.Bronze.nullSentinelToNull(raw)
    normalized.select(
        col("doc_id"),
        col("lang").as("lang_n"),
        col("n_chars").cast("int").as("n_chars"),
        (col("doc_id").cast("int") % 7).as("shard"))
      .orderBy(col("doc_id").cast("int"))
  }

  /** JSON-lines scan with explicit schema (no inference) plus a nested
    * field: each record carries a `meta` object; the scan reads
    * dotted-path fields out of it. Self-materialized like the CSV gate;
    * the oracle derives the same rows from the parquet source.
    */
  val s18_jsonl_scan = OpQuery(
    "s18_jsonl_scan",
    """WITH first200 AS (
      |  SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 200
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       lang,
      |       CAST(n_chars AS BIGINT) AS n_chars,
      |       CAST(doc_id % 3 AS BIGINT) AS bucket
      |FROM first200
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val jsonPath = s"/tmp/graft_landing_s18_${math.abs(dir.hashCode)}.jsonl"
    val rows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
      .limit(200)
      .collect()
    val lines = rows.map { r =>
      val id = r.getLong(0)
      s"""{"doc_id":$id,"lang":"${r.getString(1)}","meta":{"n_chars":${r.getLong(2)},"bucket":${id % 3}}}"""
    }.toSeq
    val tmp = Paths.get(jsonPath + s".tmp-${System.nanoTime()}")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(jsonPath),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)

    val schema = "doc_id BIGINT, lang STRING, meta STRUCT<n_chars: BIGINT, bucket: BIGINT>"
    spark.read.schema(schema).json(jsonPath)
      .select(
        col("doc_id"), col("lang"),
        col("meta.n_chars").as("n_chars"),
        col("meta.bucket").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** ORC round trip: the columnar-format sibling of the parquet store —
    * written from the parquet source, read back through Spark's native
    * ORC reader (predicate pushdown included); the oracle never sees the
    * ORC file, so the compare proves the round trip lost nothing.
    */
  val s19_orc_scan = OpQuery(
    "s19_orc_scan",
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE doc_id % 4 = 1
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val orcPath = s"/tmp/graft_landing_s19_${math.abs(dir.hashCode)}.orc"
    if (!Files.exists(Paths.get(orcPath, "_SUCCESS"))) {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").orc(orcPath)
    }
    spark.read.orc(orcPath)
      .filter(col("doc_id") % 4 === 1)
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(s1_csv_scan, s18_jsonl_scan, s19_orc_scan)
}
