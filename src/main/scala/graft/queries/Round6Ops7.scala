package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{LshTextIndex, TableStore}

/** Round-6 batch 7: incremental corpus deduplication against a
  * PERSISTED LSH index. Index one corpus slice, reopen in a fresh
  * handle, probe a disjoint "daily batch" slice — the indexed corpus is
  * never re-tokenized. Slices are 10% each (was 20%) since round 12:
  * the gate's property — probe-without-reindex equals the exhaustive
  * cross-slice jaccard — is slice-size-independent, and the in-gate
  * index build dominated the bench tail at 8 s (VERDICT r11 item 4);
  * the oracle replays the identical truncated recipe. At the recall-saturating tuning (16 bands x 2
  * rows over 32 hashes, estimate margin 0.35 — the dedup_minhash_
  * verified settings) the verified probe output equals the exhaustive
  * cross-slice jaccard join, which DuckDB computes directly.
  */
object Round6Ops7 {

  val dedup_incremental_probe = OpQuery(
    "dedup_incremental_probe",
    """WITH a AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |), b AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 1
      |), ta AS (
      |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
      |  FROM a
      |), tb AS (
      |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
      |  FROM b
      |), sa AS (SELECT doc_id, COUNT(*) AS n FROM ta GROUP BY doc_id),
      |sb AS (SELECT doc_id, COUNT(*) AS n FROM tb GROUP BY doc_id),
      |inter AS (
      |  SELECT tb.doc_id AS new_id, ta.doc_id AS indexed_id, COUNT(*) AS n_inter
      |  FROM tb JOIN ta ON ta.tok = tb.tok
      |  GROUP BY 1, 2
      |)
      |SELECT new_id, indexed_id,
      |       CAST(ROUND(n_inter * 1.0 / (sb.n + sa.n - n_inter), 6) AS DOUBLE) AS jaccard
      |FROM inter
      |JOIN sb ON sb.doc_id = new_id
      |JOIN sa ON sa.doc_id = indexed_id
      |WHERE n_inter * 1.0 / (sb.n + sa.n - n_inter) >= 0.9
      |ORDER BY new_id, indexed_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val indexed = docs.filter(col("doc_id") % 10 === 0)
    val batch = docs.filter(col("doc_id") % 10 === 1)
    val root = graft.queries.GateScratch.dir("graft-lshidx-").toString
    val store = new TableStore(spark, root)
    LshTextIndex.build(store, "c", indexed, numHashes = 32, bands = 16)
    val idx = LshTextIndex.open(store, "c") // fresh handle, tuning from meta
    LshTextIndex.probe(idx, batch, threshold = 0.9, estMargin = 0.35)
      .withColumn("jaccard", round(col("jaccard"), 6).cast("double"))
      .orderBy(col("new_id"), col("indexed_id"))
  }

  val all: Seq[OpQuery] = Seq(dedup_incremental_probe)
}
