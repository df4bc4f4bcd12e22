package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 39: corrupt-file-tolerant scans, columnar cache
  * correctness, and multi-column IN subqueries.
  */
object Round4Ops39 {

  /** ignoreCorruptFiles: a landing directory with one garbage file must
    * yield every healthy row instead of failing the scan — the
    * half-written-upload reality of object-store ingest. The oracle
    * reads the source rows; corruption must be invisible (and is
    * scoped to this read, not session-wide).
    */
  val s34_corrupt_files = OpQuery(
    "s34_corrupt_files",
    """SELECT doc_id, lang
      |FROM documents
      |WHERE doc_id % 11 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 11 === 0).select("doc_id", "lang")
    val out = graft.queries.GateScratch.dir("graft-corrupt-").toString
    docs.write.mode("overwrite").parquet(out)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "part-99999-garbage.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    spark.read
      .option("ignoreCorruptFiles", "true")
      .schema(docs.schema)
      .parquet(out)
      .orderBy("doc_id")
  }

  /** Columnar cache: the same aggregate computed THROUGH a cached
    * DataFrame must equal the uncached oracle — exercising the
    * InMemoryRelation read path (serialization round-trip through the
    * columnar cache formats is where subtle type bugs live).
    */
  val s35_cache_scan = OpQuery(
    "s35_cache_scan",
    """SELECT o_orderstatus,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders").cache()
    try {
      orders.count() // materialize the cache so the aggregate reads from it
      orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("o_orderstatus")
        .localCheckpoint() // materialize THROUGH the cache before unpersist
    } finally orders.unpersist()
  }

  /** Multi-column IN subquery: (orderkey, linenumber) tuples membership
    * against a derived set — the composite-key semi join written the
    * declarative way.
    */
  val j21_multicol_in = OpQuery(
    "j21_multicol_in",
    """SELECT l.l_orderkey, l.l_linenumber,
      |       CAST(l.l_quantity AS BIGINT) AS qty
      |FROM lineitem l
      |WHERE EXISTS (
      |  SELECT 1 FROM (
      |    SELECT l_orderkey AS k, MIN(l_linenumber) AS m
      |    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5) s
      |  WHERE s.k = l.l_orderkey AND s.m = l.l_linenumber)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("graft_mci_lineitem")
    spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS BIGINT) AS qty
        |FROM graft_mci_lineitem
        |WHERE (l_orderkey, l_linenumber) IN (
        |  SELECT l_orderkey, MIN(l_linenumber)
        |  FROM graft_mci_lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(s34_corrupt_files, s35_cache_scan, j21_multicol_in)
}
