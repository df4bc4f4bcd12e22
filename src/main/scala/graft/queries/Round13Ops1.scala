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

  /** Iceberg EXPIRE SNAPSHOTS — the metadata-retention twin of s55's
    * Delta checkpoint cleanup: three table generations export as three
    * snapshots, `expireSnapshots(keep = 1)` prunes the two old ones
    * from metadata and physically deletes their manifest lists,
    * unshared manifests, and unreferenced data files. Pinned: the
    * CURRENT state reads identically (the oracle), exactly 2 snapshots
    * expired, time travel to an expired snapshot refuses loudly, and
    * the expired snapshots' data bytes are really gone from disk
    * (hardlink-backed, so the space claim is real).
    */
  val s59_iceberg_expire: OpQuery = OpQuery(
    "s59_iceberg_expire",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 5 = 0)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    val scratch = GateScratch.dir("graft-iceberg-expire-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("exp", docs)
    store.overwrite("exp", docs.filter(col("doc_id") % 3 =!= 0))
    store.overwrite("exp", docs.filter(col("doc_id") % 5 =!= 0))
    val exported = IcebergExport.exportTable(
      store, "exp", scratch.resolve("ice").toString)
    val snapsBefore = IcebergImport.snapshots(spark, exported.toString)
    require(snapsBefore.size == 3,
      s"s59: expected 3 exported snapshots, got ${snapsBefore.size}")
    val oldest = snapsBefore.minBy(_._2)._1
    def dataBytes(): Long = {
      val s = java.nio.file.Files.walk(exported)
      try {
        import scala.collection.JavaConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size(_)).sum
      } finally s.close()
    }
    val bytesBefore = dataBytes()
    val expired = IcebergExport.expireSnapshots(exported.toString, keep = 1)
    require(expired == 2, s"s59: expired $expired snapshots, expected 2")
    require(IcebergImport.snapshots(spark, exported.toString).size == 1,
      "s59: metadata still lists expired snapshots")
    require(dataBytes() < bytesBefore,
      "s59: expiry deleted no data bytes — orphan cleanup is a no-op")
    val refused = try {
      IcebergImport.read(spark, exported.toString, Some(oldest)).count(); false
    } catch { case _: IllegalArgumentException => true }
    require(refused, "s59: time travel to an expired snapshot still served rows")
    docSelect(IcebergImport.read(spark, exported.toString))
  }

  /** Delta time travel BY TIMESTAMP (`timestampAsOf`): three table
    * generations export as three commits whose `commitInfo.timestamp`s
    * the gate pins to a deliberately NON-monotonic wall clock (1000,
    * 3000, 2000 — a skewed second writer). The reader must apply stock
    * Delta's monotonicity adjustment (`ts(v)=max(ts(v),ts(v-1)+1)` →
    * 1000, 3000, 3001) before resolving: a reader comparing raw clocks
    * would serve the LATEST version for asOf(2500) (version 2's raw
    * 2000 <= 2500) instead of version 0, silently showing a future
    * state. Pinned: asOf(2500)→v0, asOf(3000)→v1 (the oracle),
    * asOf(now)→v2, and a timestamp before the first commit refuses
    * loudly.
    */
  val s60_delta_timestamp_as_of: OpQuery = OpQuery(
    "s60_delta_timestamp_as_of",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 3 = 0)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport}
    import java.nio.file.{Files, Paths}
    val scratch = GateScratch.dir("graft-delta-tts-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("tt", docs)
    store.overwrite("tt", docs.filter(col("doc_id") % 3 =!= 0))
    store.overwrite("tt", docs.filter(col("doc_id") % 5 =!= 0))
    val exp = DeltaExport.exportTable(
      store, "tt", scratch.resolve("delta").toString).toString
    // pin each commit's in-commit timestamp; version 2's clock runs
    // BEHIND version 1's (skewed writer) to exercise the adjustment
    val logDir = Paths.get(exp, "_delta_log")
    Seq(0L -> 1000L, 1L -> 3000L, 2L -> 2000L).foreach { case (v, ts) =>
      val p = logDir.resolve(f"$v%020d.json")
      val patched = Files.readString(p).replaceFirst(
        """("commitInfo":\{"timestamp":)\d+""", "$1" + ts)
      Files.writeString(p, patched)
    }
    val adjusted = DeltaImport.commitTimestamps(spark, exp)
    require(adjusted.map(_._2) == Seq(1000L, 3000L, 3001L),
      s"s60: monotonicity adjustment wrong: $adjusted")
    val full = docs.count()
    require(DeltaImport.readAsOfTimestamp(spark, exp, 2500L).count() == full,
      "s60: asOf(2500) must serve version 0 — raw-clock resolution leaked a future state")
    require(DeltaImport.readAsOfTimestamp(spark, exp, 3001L).count() ==
      docs.filter(col("doc_id") % 5 =!= 0).count(),
      "s60: asOf(3001) must serve the current version")
    val refused = try {
      DeltaImport.readAsOfTimestamp(spark, exp, 999L); false
    } catch { case _: IllegalArgumentException => true }
    require(refused, "s60: a timestamp before the first commit must refuse")
    docSelect(DeltaImport.readAsOfTimestamp(spark, exp, 3000L))
  }

  /** Iceberg ADD-COLUMN schema evolution:
    * [[graft.operators.IcebergExport.appendEvolvedColumns]] commits a
    * snapshot whose data file carries a NEW trailing column under an
    * evolved schema (next schema-id, fresh field-id — existing ids
    * never move), and the reader must (a) null-fill the added column
    * for pre-evolution data files and (b) serve the OLD shape when
    * time-traveling to a pre-evolution snapshot (each snapshot names
    * its own schema-id). A reader pinned to the current schema would
    * grow a phantom column in the old snapshot; one resolving
    * positionally instead of by schema would misalign the evolved
    * file's columns and hash-fail.
    */
  val s61_iceberg_schema_evolution: OpQuery = OpQuery(
    "s61_iceberg_schema_evolution",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
      |       CAST(NULL AS BIGINT) AS extra_tokens
      |FROM documents
      |UNION ALL
      |SELECT doc_id + 10000000, lang, source, CAST(n_chars AS BIGINT),
      |       CAST(n_chars * 2 AS BIGINT)
      |FROM documents WHERE doc_id % 9 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    val scratch = GateScratch.dir("graft-iceberg-evolve-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("ev", docs)
    val exp = IcebergExport.exportTable(
      store, "ev", scratch.resolve("ice").toString).toString
    val preSnap = IcebergImport.snapshots(spark, exp).maxBy(_._2)._1
    val evolvedRows = docs.filter(col("doc_id") % 9 === 0)
      .withColumn("doc_id", col("doc_id") + 10000000)
      .withColumn("extra_tokens", (col("n_chars") * 2).cast("bigint"))
    IcebergExport.appendEvolvedColumns(spark, exp, evolvedRows)
    // time travel to the pre-evolution snapshot serves the OLD shape
    val old = IcebergImport.read(spark, exp, Some(preSnap))
    require(!old.columns.contains("extra_tokens"),
      "s61: pre-evolution snapshot grew a phantom evolved column")
    require(old.count() == docs.count(),
      "s61: pre-evolution snapshot row count changed")
    val now = IcebergImport.read(spark, exp)
    require(now.columns.last == "extra_tokens",
      s"s61: evolved column missing from current read: ${now.columns.mkString(",")}")
    now.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars").cast("bigint").as("n_chars"),
      col("extra_tokens").cast("bigint").as("extra_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Delta VACUUM — the data-file-retention lifecycle (s59's Iceberg
    * expire, Delta side): after three overwrite generations and a DV
    * DELETE, [[graft.operators.DeltaVacuum.vacuum]] at retention-0
    * deletes exactly the tombstoned old-generation files while keeping
    * every live add AND the live deletion-vector file. Pinned: a
    * within-retention vacuum deletes NOTHING (the tombstone clock is
    * honored), the logical table reads identically after the purge
    * (the oracle), the DV file survives, a second vacuum finds nothing,
    * and time travel to a vacuumed version fails instead of serving a
    * partial table.
    */
  val s62_delta_vacuum: OpQuery = OpQuery(
    "s62_delta_vacuum",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 5 = 0) AND NOT (doc_id % 7 = 3)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport, DeltaVacuum}
    import java.nio.file.{Files, Paths}
    val scratch = GateScratch.dir("graft-delta-vacuum-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("vc", docs)
    store.overwrite("vc", docs.filter(col("doc_id") % 3 =!= 0))
    store.overwrite("vc", docs.filter(col("doc_id") % 5 =!= 0))
    val currentGen = f"gen-v${store.currentVersion("vc")}%05d"
    val exp = DeltaExport.exportTable(
      store, "vc", scratch.resolve("delta").toString).toString
    // DV DELETE on the CURRENT generation only (old gens aren't live)
    val targets = dvTargets(spark, exp, col("doc_id") % 7 === 3)
      .filter(_._1.startsWith(currentGen))
    require(targets.nonEmpty, "s62: no DV targets in the current generation")
    DeltaExport.appendDeletionVectors(exp, targets)
    def files(prefix: String): Seq[java.nio.file.Path] = {
      val w = Files.walk(Paths.get(exp))
      try {
        import scala.collection.JavaConverters._
        w.iterator().asScala.filter(p => Files.isRegularFile(p) &&
          Paths.get(exp).relativize(p).toString.startsWith(prefix)).toList
      } finally w.close()
    }
    val oldGenFiles = files("gen-").filterNot(p =>
      Paths.get(exp).relativize(p).toString.startsWith(currentGen))
    require(oldGenFiles.nonEmpty, "s62: no old-generation files to vacuum")
    val now = System.currentTimeMillis()
    // within the retention window the tombstones are too fresh to collect
    require(DeltaVacuum.vacuum(exp, 7L * 24 * 3600 * 1000, now) == 0,
      "s62: a within-retention vacuum deleted files")
    val n = DeltaVacuum.vacuum(exp, 0L, now + 60000)
    require(n == oldGenFiles.size,
      s"s62: vacuumed $n files, expected the ${oldGenFiles.size} old-gen ones")
    require(DeltaVacuum.vacuum(exp, 0L, now + 60000) == 0,
      "s62: a second vacuum still found files")
    require(files("deletion_vector_").nonEmpty,
      "s62: the LIVE deletion-vector file was collected")
    val timeTravelFails = try {
      DeltaImport.read(spark, exp, Some(0L)).count(); false
    } catch { case _: Throwable => true }
    require(timeTravelFails,
      "s62: time travel to a vacuumed version served rows from deleted files")
    docSelect(DeltaImport.read(spark, exp))
  }

  /** Iceberg DERIVED partition transforms (bucket / truncate): a table
    * whose default spec buckets `doc_id` and truncates `lang` must read
    * correctly — the derived partition values are IGNORED (the source
    * columns live in the data files; only identity transforms need
    * reattachment) after a footer probe proves the source columns are
    * really there. An unknown transform still refuses loudly. The
    * fixture patches an exported table's spec — the manifest shape real
    * writers produce after a spec evolution on existing manifests.
    */
  val s63_iceberg_bucket_transform: OpQuery = OpQuery(
    "s63_iceberg_bucket_transform",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    import java.nio.file.{Files, Paths}
    val scratch = GateScratch.dir("graft-iceberg-bucket-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("bk", docs)
    val exp = IcebergExport.exportTable(
      store, "bk", scratch.resolve("ice").toString).toString
    val mdFile = Paths.get(exp, "metadata", "v1.metadata.json")
    val plainSpec = """"partition-specs": [{"spec-id": 0, "fields": []}]"""
    val md = Files.readString(mdFile)
    require(md.contains(plainSpec), "s63: unexpected exported spec layout")
    // field ids are position+1 in the exported schema: doc_id=1, lang=2
    def withSpec(fields: String): Unit = Files.writeString(mdFile,
      md.replace(plainSpec,
        s""""partition-specs": [{"spec-id": 0, "fields": [$fields]}]"""))
    withSpec(
      """{"name": "doc_id_bucket", "transform": "bucket[4]", "source-id": 1, "field-id": 1000},
        | {"name": "lang_trunc", "transform": "truncate[2]", "source-id": 2, "field-id": 1001}"""
        .stripMargin.replace("\n", ""))
    val read = IcebergImport.read(spark, exp)
    require(read.count() == docs.count(),
      "s63: bucketed table read lost rows")
    require(!read.columns.contains("doc_id_bucket"),
      "s63: a derived partition value leaked into the schema")
    // unknown transforms must refuse, never guess
    withSpec("""{"name": "z", "transform": "zorder", "source-id": 1, "field-id": 1000}""")
    val refused = try { IcebergImport.read(spark, exp).count(); false }
    catch { case _: IllegalArgumentException => true }
    require(refused, "s63: an unknown partition transform was silently served")
    withSpec(
      """{"name": "doc_id_bucket", "transform": "bucket[4]", "source-id": 1, "field-id": 1000}""")
    docSelect(IcebergImport.read(spark, exp))
  }

  /** Delta COLUMN MAPPING (name mode) — the modern-writer shape this
    * reader previously refused: parquet files and `partitionValues`
    * keys carry PHYSICAL names (`col-*`), the schemaString's per-field
    * `delta.columnMapping.physicalName` metadata maps them back, and
    * the DataFrame speaks logical names. The fixture is a handcrafted
    * stock-shaped log (protocol 2/5, mode=name, lang-partitioned with a
    * physical partitionValues key — the spec's writer requirement).
    * ID mode (parquet field-id resolution) still refuses loudly.
    */
  val s64_delta_column_mapping: OpQuery = OpQuery(
    "s64_delta_column_mapping",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.DeltaImport
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{MetadataBuilder, StructType}
    import scala.collection.JavaConverters._
    val scratch = GateScratch.dir("graft-delta-cm-")
    val table = scratch.resolve("table")
    Files.createDirectories(table.resolve("_delta_log"))
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    val physOf = Map("doc_id" -> "col-d0", "lang" -> "col-l1",
      "source" -> "col-s2", "n_chars" -> "col-n3")
    def jsonStr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
    // data files: one per lang partition, PHYSICAL column names, the
    // partition column physically omitted (the stock layout)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    val adds = langs.zipWithIndex.map { case (l, i) =>
      val tmp = Files.createTempDirectory(scratch, "cm-part-")
      docs.filter(col("lang") === l)
        .select(col("doc_id").as("col-d0"), col("source").as("col-s2"),
          col("n_chars").as("col-n3"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val w = Files.list(tmp)
        try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally w.close()
      }
      val name = f"part-$i%05d.parquet"
      Files.move(part, table.resolve(name))
      s"""{"add":{"path":"$name","partitionValues":{"col-l1":${jsonStr(l)}},""" +
        s""""size":${Files.size(table.resolve(name))},""" +
        s""""modificationTime":0,"dataChange":true}}"""
    }
    val mapped = StructType(docs.schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong("delta.columnMapping.id", i + 1L)
        .putString("delta.columnMapping.physicalName", physOf(f.name)).build())
    })
    val commit = Seq(
      """{"commitInfo":{"timestamp":0,"operation":"WRITE","engineInfo":"stock-shaped fixture"}}""",
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"cm-fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonStr(mapped.json)},"partitionColumns":["lang"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"4"},"createdTime":0}}""") ++ adds
    val logFile = table.resolve("_delta_log").resolve(f"${0L}%020d.json")
    Files.writeString(logFile, commit.mkString("", "\n", "\n"))
    // ID mode must refuse — it resolves by parquet field id, which this
    // reader does not implement
    val asId = Files.readString(logFile).replace(
      """"delta.columnMapping.mode":"name"""",
      """"delta.columnMapping.mode":"id"""")
    Files.writeString(logFile, asId)
    val refused = try { DeltaImport.read(spark, table.toString).count(); false }
    catch { case _: IllegalArgumentException => true }
    require(refused, "s64: column mapping ID mode was silently served")
    Files.writeString(logFile, commit.mkString("", "\n", "\n"))
    val read = DeltaImport.read(spark, table.toString)
    require(read.columns.toSeq == docCols,
      s"s64: logical schema mismatch: ${read.columns.mkString(",")}")
    docSelect(read)
  }

  /** Log-derived Delta CHANGE FEED: two overwrite commits then a DV
    * DELETE, read back as per-commit row changes. The overwrites emit
    * file-level delete+insert (stock CDF's rewrite granularity); the DV
    * commit emits ONLY the newly-covered rows as deletes — the log
    * names the changed files and the DV diff names the rows, so a
    * 1-row delete never scans-and-emits the whole table. Oracle: the
    * five change slices stated directly in SQL. REQUIREs pin the
    * DV-diff-only tail and the checkpoint-collapse refusal.
    */
  val s65_delta_changes: OpQuery = OpQuery(
    "s65_delta_changes",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
      |       'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      |FROM documents
      |UNION ALL
      |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT), 'insert', 1
      |FROM documents WHERE NOT (doc_id % 3 = 0)
      |UNION ALL
      |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT), 'delete', 2
      |FROM documents WHERE NOT (doc_id % 3 = 0)
      |UNION ALL
      |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT), 'insert', 2
      |FROM documents WHERE NOT (doc_id % 5 = 0)
      |UNION ALL
      |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT), 'delete', 3
      |FROM documents WHERE NOT (doc_id % 5 = 0) AND doc_id % 7 = 3
      |ORDER BY _commit_version, _change_type, doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport}
    val scratch = GateScratch.dir("graft-delta-cdf-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("cf", docs)
    store.overwrite("cf", docs.filter(col("doc_id") % 3 =!= 0))
    store.overwrite("cf", docs.filter(col("doc_id") % 5 =!= 0))
    val currentGen = f"gen-v${store.currentVersion("cf")}%05d"
    val exp = DeltaExport.exportTable(
      store, "cf", scratch.resolve("delta").toString).toString
    val targets = dvTargets(spark, exp, col("doc_id") % 7 === 3)
      .filter(_._1.startsWith(currentGen))
    DeltaExport.appendDeletionVectors(exp, targets)
    // the DV-commit slice alone: exactly the diff rows, no full-file echo
    val dvOnly = DeltaImport.readChanges(spark, exp, 2L, 3L)
    val expectDv = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 3).count()
    require(dvOnly.count() == expectDv,
      s"s65: DV commit emitted ${dvOnly.count()} changes, expected the $expectDv diff rows")
    require(dvOnly.filter(col("_change_type") =!= "delete").count() == 0,
      "s65: a pure DV-cover commit emitted non-delete changes")
    val all = DeltaImport.readChanges(spark, exp, 0L, 3L)
    all.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars").cast("bigint").as("n_chars"),
      col("_change_type"), col("_commit_version").cast("bigint").as("_commit_version"))
      .orderBy(col("_commit_version"), col("_change_type"), col("doc_id"))
  }

  /** Iceberg INCREMENTAL APPEND SCAN — s65's Delta change feed, Iceberg
    * side: two `IcebergExport.appendRows` snapshots on top of the
    * initial load, read back incrementally. Only the appended data
    * files are scanned (the manifests name them — a nightly 0.1%
    * append reads 0.1% of the table). Stock parity on refusal: a range
    * crossing a non-append snapshot (here the CDC upsert, operation
    * `delete`) refuses loudly instead of misstating it as adds.
    */
  val s66_iceberg_incremental: OpQuery = OpQuery(
    "s66_iceberg_incremental",
    """SELECT doc_id + 20000000 AS doc_id, lang, source,
      |       CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents WHERE doc_id % 3 = 0
      |UNION ALL
      |SELECT doc_id + 40000000, lang, source, CAST(n_chars AS BIGINT)
      |FROM documents WHERE doc_id % 7 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport}
    val scratch = GateScratch.dir("graft-iceberg-inc-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = t(spark, dir, "documents").select(docCols.map(col): _*)
    store.overwrite("inc", docs)
    val exp = IcebergExport.exportTable(
      store, "inc", scratch.resolve("ice").toString).toString
    def shifted(mod: Int, off: Long) = docs.filter(col("doc_id") % mod === 0)
      .withColumn("doc_id", col("doc_id") + off)
    IcebergExport.appendRows(spark, exp, shifted(3, 20000000L))
    IcebergExport.appendRows(spark, exp, shifted(7, 40000000L))
    val snapIds = IcebergImport.snapshots(spark, exp).sortBy(_._2).map(_._1)
    require(snapIds.size == 3, s"s66: expected 3 snapshots, got ${snapIds.size}")
    // the tail-only range sees only the second append
    val tail = IcebergImport.readIncremental(spark, exp, snapIds(1), snapIds(2))
    require(tail.count() == shifted(7, 0).count(),
      "s66: tail incremental range read more than the last append's files")
    // a range crossing a non-append snapshot refuses
    IcebergExport.appendEqualityUpsert(spark, exp,
      docs.filter(col("doc_id") % 11 === 0).limit(5), Seq("doc_id"),
      shifted(11, 60000000L).limit(5))
    val snapIds2 = IcebergImport.snapshots(spark, exp).sortBy(_._2).map(_._1)
    val refused = try {
      IcebergImport.readIncremental(spark, exp, snapIds2(2), snapIds2(3)); false
    } catch { case _: IllegalArgumentException => true }
    require(refused, "s66: an incremental scan silently crossed a delete snapshot")
    docSelect(IcebergImport.readIncremental(spark, exp, snapIds(0), snapIds(2)))
  }

  val all: Seq[OpQuery] = Seq(
    s55_delta_checkpoint_dv, s56_dv_reorg, s57_iceberg_seq_inherit,
    s58_iceberg_upsert_seq, s59_iceberg_expire, s60_delta_timestamp_as_of,
    s61_iceberg_schema_evolution, s62_delta_vacuum,
    s63_iceberg_bucket_transform, s64_delta_column_mapping, s65_delta_changes,
    s66_iceberg_incremental, sim_ivf_rebalance)
}
