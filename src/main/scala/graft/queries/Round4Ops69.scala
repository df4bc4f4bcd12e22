package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 69: Luhn checksum validation, plain-text file scan,
  * and radix conversions.
  */
object Round4Ops69 {

  /** Luhn checksum validation over synthetic 12-digit account numbers
    * derived from order keys. Spark runs its codegen'd `luhn_check`
    * builtin; the oracle re-derives Luhn from first principles
    * (digit-doubling from the right) — so the gate pins the builtin's
    * semantics, not just its availability.
    */
  val f_luhn = OpQuery(
    "f_luhn",
    """WITH t AS (
      |  SELECT o_orderkey, lpad(CAST(o_orderkey * 7919 + 11 AS VARCHAR), 12, '0') AS acct
      |  FROM orders WHERE o_orderkey < 1000)
      |SELECT o_orderkey, acct,
      |       (list_sum(list_transform(range(1, 13), i ->
      |          CASE WHEN i % 2 = 0 THEN
      |            CASE WHEN CAST(substr(acct, 13 - i, 1) AS INT) * 2 > 9
      |                 THEN CAST(substr(acct, 13 - i, 1) AS INT) * 2 - 9
      |                 ELSE CAST(substr(acct, 13 - i, 1) AS INT) * 2 END
      |          ELSE CAST(substr(acct, 13 - i, 1) AS INT) END)) % 10 = 0) AS luhn_ok
      |FROM t
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        lpad((col("o_orderkey") * 7919 + 11).cast("string"), 12, "0").as("acct"))
      .withColumn("luhn_ok", expr("luhn_check(acct)"))
      .orderBy("o_orderkey")
  }

  /** Plain-text source: a pipe-delimited landing file materialized
    * deterministically from `documents`, read back with
    * `spark.read.text` and parsed with split() — the
    * no-format-at-all ingestion path (logs, exports) that precedes any
    * structured reader. The oracle re-derives the same rows from the
    * parquet source, proving the write→scan→parse loop is lossless.
    */
  val s37_text_scan = OpQuery(
    "s37_text_scan",
    """WITH first200 AS (
      |  SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 200)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
      |       CAST(n_chars AS BIGINT) AS n_chars
      |FROM first200
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val txtPath = s"/tmp/graft_landing_s37_${math.abs(dir.hashCode)}.txt"
    val rows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
      .limit(200)
      .collect()
    val lines = rows.map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getLong(2)}")
    val tmp = Paths.get(txtPath + s".tmp-${System.nanoTime()}")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(txtPath),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)

    spark.read.text(txtPath)
      .select(split(col("value"), "\\|").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("doc_id"),
        element_at(col("f"), 2).as("lang"),
        element_at(col("f"), 3).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** Radix conversions: binary / octal / hex renderings of an integer
    * column. Spark's `conv` (and `hex`) against DuckDB's format
    * specifiers — both sides uppercase so the case convention is
    * pinned explicitly rather than inherited from either engine.
    */
  val f_base_convert = OpQuery(
    "f_base_convert",
    """SELECT o_orderkey,
      |       format('{:b}', o_orderkey) AS bin,
      |       format('{:o}', o_orderkey) AS oct,
      |       upper(format('{:x}', o_orderkey)) AS hex
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        conv(col("o_orderkey").cast("string"), 10, 2).as("bin"),
        conv(col("o_orderkey").cast("string"), 10, 8).as("oct"),
        upper(conv(col("o_orderkey").cast("string"), 10, 16)).as("hex"))
      .orderBy("o_orderkey")
  }

  val all: Seq[OpQuery] = Seq(f_luhn, s37_text_scan, f_base_convert)
}
