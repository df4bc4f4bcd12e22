package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, TableStore}

/** Round-13 batch 1 (VERDICT r12 items 3, 4, 6): table-format lifecycle
  * corners — Delta checkpoint-floored logs, deletion-vector REORG,
  * Iceberg sequence-number inheritance and the same-sequence
  * delete-and-reinsert — plus IVF cell rebalance.
  */
object Round13Ops1 {

  private def t = Tables.load _

  private val docCols = Seq("doc_id", "lang", "source", "n_chars")

  private def docSelect(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars").cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))

  /** (table-root-relative file → row positions) of the rows matching
    * `pred` in a Delta export — the coordinates a DV names.
    */
  private def dvTargets(spark: org.apache.spark.sql.SparkSession,
      exp: String, pred: org.apache.spark.sql.Column): Seq[(String, Seq[Long])] = {
    val root = java.nio.file.Paths.get(exp).toAbsolutePath.normalize.toString
    spark.read.parquet(s"$exp/gen-*")
      .select(col("doc_id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/")
          .as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(pred)
      .collect()
      .groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq }
  }

  /** Delta CHECKPOINT round trip with deletion vectors (VERDICT r12
    * item 3): [[graft.operators.DeltaExport.writeCheckpoint]] writes a
    * MULTI-PART parquet checkpoint (+`_last_checkpoint`) after a DV
    * DELETE commit, the gate then physically DELETES every JSON commit
    * at-or-below it — the metadata-retention lifecycle — and
    * [[graft.operators.DeltaImport]] must reconstruct the state (live
    * adds, schema, protocol, DV descriptors) from the checkpoint alone.
    * A reader that lost the DV descriptor through the checkpoint would
    * resurrect the deleted rows and hash-fail here.
    */
  val s55_delta_checkpoint_dv: OpQuery = OpQuery(
    "s55_delta_checkpoint_dv",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 13 = 4)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport}
    import java.nio.file.{Files, Paths}
    val scratch = GateScratch.dir("graft-delta-cp-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("cp", docs)
    val exp = DeltaExport.exportTable(
      store, "cp", scratch.resolve("delta").toString).toString
    DeltaExport.appendDeletionVectors(exp,
      dvTargets(spark, exp, col("doc_id") % 13 === 4))
    DeltaExport.writeCheckpoint(spark, exp, version = 1L, parts = 2)
    // retention sweep: the JSON history at-or-below the checkpoint goes
    // away — the import below has ONLY the checkpoint to work from
    val logDir = Paths.get(exp, "_delta_log")
    val removed = (0L to 1L).map(v => f"$v%020d.json")
      .count(n => Files.deleteIfExists(logDir.resolve(n)))
    require(removed == 2, s"s55: expected to delete 2 JSON commits, got $removed")
    val vs = DeltaImport.versions(exp)
    require(vs == Seq(1L),
      s"s55: checkpoint floor should be the only readable version, got $vs")
    docSelect(DeltaImport.read(spark, exp))
  }

  /** REORG ... APPLY (PURGE) for the deletion-vector era (VERDICT r12
    * item 4): after a DV DELETE, [[graft.operators.DeltaReorg.purge]]
    * rewrites every DV-bearing file minus its deleted rows and commits
    * clean adds. Pinned three ways: the purge touches exactly the
    * DV-bearing files, a second purge finds NOTHING to do (DV count is
    * zero), and the table reads row-identical before and after — the
    * oracle hashes the logical table, which the reorg must not change.
    */
  val s56_dv_reorg: OpQuery = OpQuery(
    "s56_dv_reorg",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 11 = 2)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport, DeltaReorg}
    val scratch = GateScratch.dir("graft-delta-reorg-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("rg", docs)
    val exp = DeltaExport.exportTable(
      store, "rg", scratch.resolve("delta").toString).toString
    val targets = dvTargets(spark, exp, col("doc_id") % 11 === 2)
    DeltaExport.appendDeletionVectors(exp, targets)
    val pre = DeltaImport.read(spark, exp).localCheckpoint(true)
    val purged = DeltaReorg.purge(spark, exp)
    require(purged == targets.size,
      s"s56: purged $purged files, expected ${targets.size} DV-bearing ones")
    require(DeltaReorg.purge(spark, exp) == 0,
      "s56: a second purge still found deletion vectors — purge left DVs live")
    val post = DeltaImport.read(spark, exp)
    val diff = post.exceptAll(pre).count() + pre.exceptAll(post).count()
    require(diff == 0,
      s"s56: reorg changed the logical table by $diff rows")
    docSelect(post)
  }

  /** Iceberg v2 sequence-number INHERITANCE (VERDICT r12 item 3): the
    * delete manifest's entries carry NULL sequence numbers — the spec's
    * inheritance form, what real writers emit for entries added in the
    * manifest's own snapshot — and the reader must resolve them from
    * the manifest-list entry before the position-delete scoping rule
    * (`dseq >= fseq`) can fire. A reader that defaulted null to 0 would
    * scope the delete below every data file and serve the deleted rows.
    */
  val s57_iceberg_seq_inherit: OpQuery = OpQuery(
    "s57_iceberg_seq_inherit",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 13 = 0)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    val scratch = GateScratch.dir("graft-iceberg-inherit-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("inh", docs)
    val exported = IcebergExport.exportTable(
      store, "inh", scratch.resolve("ice").toString)
    val withPos = IcebergImport.read(spark, exported.toString)
      .select(col("doc_id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/")
          .as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("doc_id") % 13 === 0)
      .collect()
    val byFile = withPos.groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f -> rs.map(_.getLong(2)).toSeq }
    IcebergExport.appendPositionDeletes(spark, exported.toString, byFile,
      inheritSequence = true)
    val origSnap = IcebergImport.snapshots(spark, exported.toString)
      .minBy(_._2)._1
    val preCount = IcebergImport.read(spark, exported.toString, Some(origSnap)).count()
    require(preCount == docs.count(),
      s"s57: pre-delete snapshot serves $preCount rows — history rewritten")
    docSelect(IcebergImport.read(spark, exported.toString))
  }

  /** Iceberg same-sequence DELETE-AND-REINSERT (the CDC upsert — the
    * corner the v2 strict-below rule exists for): ONE snapshot at
    * sequence N carries an equality delete on (lang, source) keys AND a
    * new data file re-inserting half the matching rows. Old versions of
    * the keys (data sequence < N) die; the reinserted file (data
    * sequence = N, inherited from its manifest) survives. Both
    * manifests use null entry sequences, so inheritance is on the read
    * path twice.
    */
  val s58_iceberg_upsert_seq: OpQuery = OpQuery(
    "s58_iceberg_upsert_seq",
    """WITH k AS (SELECT DISTINCT lang, source FROM documents WHERE doc_id % 19 = 0)
      |SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d
      |WHERE NOT EXISTS (SELECT 1 FROM k
      |                  WHERE k.lang IS NOT DISTINCT FROM d.lang
      |                    AND k.source IS NOT DISTINCT FROM d.source)
      |UNION ALL
      |SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d
      |WHERE EXISTS (SELECT 1 FROM k
      |              WHERE k.lang IS NOT DISTINCT FROM d.lang
      |                AND k.source IS NOT DISTINCT FROM d.source)
      |  AND d.doc_id % 2 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    val scratch = GateScratch.dir("graft-iceberg-upsert-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("ups", docs)
    val exported = IcebergExport.exportTable(
      store, "ups", scratch.resolve("ice").toString)
    val keys = docs.filter(col("doc_id") % 19 === 0)
      .select(col("lang"), col("source")).distinct().localCheckpoint(true)
    val reinsert = docs.join(keys,
        docs("lang") <=> keys("lang") && docs("source") <=> keys("source"),
        "left_semi")
      .filter(col("doc_id") % 2 === 0)
      .localCheckpoint(true)
    require(reinsert.count() > 0, "s58: empty reinsert slice — fixture broke")
    IcebergExport.appendEqualityUpsert(
      spark, exported.toString, keys, Seq("lang", "source"), reinsert)
    val origSnap = IcebergImport.snapshots(spark, exported.toString)
      .minBy(_._2)._1
    val preCount = IcebergImport.read(spark, exported.toString, Some(origSnap)).count()
    require(preCount == docs.count(),
      s"s58: pre-upsert snapshot serves $preCount rows — history rewritten")
    val served = IcebergImport.read(spark, exported.toString)
    // the reinserted rows MUST be present — a `<=` scoping bug or an
    // inheritance default-to-0 would silently drop them
    val missing = reinsert.select(col("doc_id"))
      .join(served.select(col("doc_id")), Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"s58: $missing reinserted rows were deleted by their own snapshot's eq-delete")
    docSelect(served)
  }

  /** IVF cell REBALANCE (VERDICT r12 item 6): build a deliberately
    * under-celled index (4 cells over the corpus), split every
    * oversized cell with [[AnnIndex.rebalance]] (local re-Lloyd,
    * O(split-cell rows)), and serve a FULL-PROBE search over the
    * rebalanced index — with every cell probed, IVF is exactly brute
    * force whatever the assignment, so the DuckDB brute-force oracle
    * pins that the rebalance lost, duplicated, or corrupted nothing.
    * Structure is REQUIREd in-gate: more cells than before, no split
    * cell surviving, max cell strictly smaller, postings count
    * unchanged. Partial-probe recall and untouched-partition
    * byte-identity are pinned in AnnIndexSpec.
    */
  val sim_ivf_rebalance: OpQuery = OpQuery(
    "sim_ivf_rebalance",
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8
      |), scored AS (
      |  SELECT q.query_id, e.vec_id AS corpus_id,
      |         list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> q.query_id
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, corpus_id ASC) AS INT) AS rank,
      |         score
      |  FROM scored
      |)
      |SELECT query_id, corpus_id, rank, CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = t(spark, dir, "embeddings")
    val n = emb.count()
    val store = new TableStore(spark, GateScratch.dir("graft-annreb-").toString)
    AnnIndex.build(store, "emb_reb", emb, numCells = 4)
    val h = AnnIndex.open(store, "emb_reb")
    val beforeCells = h.centroids.count()
    val beforeMax = h.postings.groupBy(col("cell_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    val splitAt = n / 5 // 4 cells over n rows: at least one cell exceeds n/5
    AnnIndex.rebalance(h, maxCellSize = splitAt, subCells = 2)
    val afterCells = h.centroids.count()
    val afterSizes = h.postings.groupBy(col("cell_id")).count()
      .agg(max(col("count")), sum(col("count"))).head()
    require(afterCells > beforeCells,
      s"sim_ivf_rebalance: cell count $beforeCells -> $afterCells — nothing split")
    require(afterSizes.getLong(1) == n,
      s"sim_ivf_rebalance: postings count drifted ${afterSizes.getLong(1)} != $n")
    require(afterSizes.getLong(0) < beforeMax,
      s"sim_ivf_rebalance: max cell ${afterSizes.getLong(0)} not below $beforeMax")
    val served = AnnIndex.search(h, emb.filter(col("vec_id") < 8), k = 5,
      nprobe = afterCells.toInt)
    served
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[OpQuery] = Seq(
    s55_delta_checkpoint_dv, s56_dv_reorg, s57_iceberg_seq_inherit,
    s58_iceberg_upsert_seq, sim_ivf_rebalance)
}
