package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, TableStore}

/** Round-12 batch 1: incremental ANN-index maintenance on the driver's
  * correctness surface (VERDICT r11 item 3 — [[AnnIndex.append]] and
  * [[PqIndex.append]] shipped with spec pins but no oracle gate, so the
  * "daily embedding batch without a full re-encode" claim was invisible
  * to the driver's DuckDB compare).
  */
object Round12Ops1 {

  private def t = Tables.load _

  /** Incremental IVF append == one-shot rebuild, end to end: build the
    * persisted index on the FIRST HALF of the corpus, append the second
    * half as a later-day batch ([[AnnIndex.append]] — frozen centroids,
    * partition-aligned copy-on-write of only the touched cells), and
    * serve the same query batch as `sim_ivf_persisted`.
    *
    * The centroid seed is the first 16 vectors by id
    * ([[graft.operators.Similarity.centroids]]), and the first half
    * contains all 16 — so the frozen coarse quantizer of the
    * incremental index IS the quantizer a one-shot full build selects,
    * and append-then-search must equal build-everything-then-search bit
    * for bit. Pinned twice: an in-gate REQUIRE diffs the served results
    * against a one-shot full index (both directions, zero rows), and
    * the DuckDB oracle replays the full-corpus IVF math — the SAME
    * oracle `sim_ivf_persisted` hash-matches, so any divergence the
    * append path introduced (stale rows, double rows, drifted cells)
    * hash-fails here.
    */
  val sim_ivf_append = OpQuery(
    "sim_ivf_append",
    """WITH cents AS (
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
      |    SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS qvec, c.cell_id,
      |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |             ORDER BY -list_cosine_similarity(q.embedding::DOUBLE[], c.centroid) ASC,
      |                      c.cell_id ASC) AS rn
      |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 8)
      |  WHERE rn <= 4
      |), scored AS (
      |  SELECT p.query_id, a.vec_id AS corpus_id,
      |         list_cosine_similarity(a.embedding::DOUBLE[], p.qvec) AS score
      |  FROM assigned a JOIN probes p ON p.cell_id = a.cell_id
      |  WHERE a.vec_id <> p.query_id
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY score DESC, corpus_id ASC) AS INT) AS rank,
      |         score
      |  FROM scored)
      |SELECT query_id, corpus_id, rank, CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = t(spark, dir, "embeddings")
    // the split point only has to keep the 16 centroid-seed vectors in
    // the base slice; median-ish keeps both slices corpus-sized
    val half = emb.agg(
      expr("percentile_approx(vec_id, 0.5, 100000)")).head().getLong(0)
    val base = emb.filter(col("vec_id") <= half)
    val batch = emb.filter(col("vec_id") > half)
    val root = GateScratch.dir("graft-annappend-").toString
    val store = new TableStore(spark, root)
    AnnIndex.build(store, "emb_inc", base, numCells = 16)
    // reopen from disk, as a later ingest session would, then append
    val idx = AnnIndex.open(store, "emb_inc")
    AnnIndex.append(idx, batch)
    val queries = emb.filter(col("vec_id") < 8)
    val served = AnnIndex.search(idx, queries, k = 5, nprobe = 4)
    // rebuild-equality REQUIRE: a one-shot index over the full corpus
    // (same centroid rule — seed ids all in `base`) must serve the
    // exact same rows
    AnnIndex.build(store, "emb_full", emb, numCells = 16)
    val oneShot = AnnIndex.search(
      AnnIndex.open(store, "emb_full"), queries, k = 5, nprobe = 4)
    val diff = served.exceptAll(oneShot).count() +
      oneShot.exceptAll(served).count()
    require(diff == 0,
      s"sim_ivf_append: append-then-search diverged from one-shot " +
        s"rebuild by $diff rows — frozen-centroid append is broken")
    served
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Delta deletion-vector read (VERDICT r11 item 7): stock engines'
    * DELETE increasingly writes DVs instead of rewriting files, and
    * [[graft.operators.DeltaImport]] refused them loudly — a real
    * migration user hits the refusal on day one. The gate FORGES a
    * stock-shaped reader-version-3 table (two parquet data files; a
    * second commit re-adds both with deletion vectors marking every
    * `doc_id % 7 = 3` row — one DV as an on-disk `deletion_vector_
    * <uuid>.bin` with z85-uuid "u" addressing, the other inline "i"),
    * then reads it back through the protocol-level importer. The oracle
    * is the logical table: documents minus the deleted predicate — so
    * the bitmap serialization, z85 path derivation, CRC framing, and
    * row-index anti-join must ALL be exactly right for the hash to
    * match.
    */
  val s51_delta_import_dv: OpQuery = OpQuery(
    "s51_delta_import_dv",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 7 = 3)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import java.nio.file.Files
    import graft.operators.{DeletionVectors, DeltaImport}
    val scratch = GateScratch.dir("graft-delta-dv-")
    val table = scratch.resolve("tbl")
    Files.createDirectories(table.resolve("_delta_log"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

    // one sorted single-file slice per parity; returns (fileName,
    // deleted positions within the file's row order, file size)
    def forgeFile(parity: Int): (String, Array[Long], Long) = {
      val name = s"part-dv$parity.parquet"
      val slice = docs.filter(col("doc_id") % 2 === parity)
        .repartition(1).sortWithinPartitions("doc_id")
      val tmp = scratch.resolve(s"tmp$parity")
      slice.write.mode("overwrite").parquet(tmp.toString)
      import scala.collection.JavaConverters._
      val listing = Files.list(tmp)
      val found = try listing.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally listing.close()
      val target = table.resolve(name)
      Files.move(found, target)
      // row i of the file is the i-th doc_id in ascending order (the
      // slice was written sorted from one task); positions of the
      // deleted predicate — bounded collect, fixture-sized
      val ids = slice.select("doc_id").collect().map(_.getLong(0)).sorted
      val deleted = ids.zipWithIndex
        .collect { case (id, i) if id % 7 == 3 => i.toLong }
      (name, deleted, Files.size(target))
    }
    val (nameA, delA, sizeA) = forgeFile(0)
    val (nameB, delB, sizeB) = forgeFile(1)

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val schemaJson = jstr(docs.schema.json)

    // commit 0: plain reader-v1 table with both adds
    Files.write(table.resolve("_delta_log/00000000000000000000.json"),
      (Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"f00d0000-0000-4000-8000-000000000012","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{},"createdTime":0}}""",
        s"""{"add":{"path":"$nameA","partitionValues":{},"size":$sizeA,"modificationTime":0,"dataChange":true}}""",
        s"""{"add":{"path":"$nameB","partitionValues":{},"size":$sizeB,"modificationTime":0,"dataChange":true}}""")
        .mkString("", "\n", "\n")).getBytes("UTF-8"))

    // commit 1: protocol upgrade to v3/deletionVectors; both files
    // re-added with DVs — "u" (on-disk, z85-uuid path) and "i" (inline)
    val (dvPathA, offA) = DeletionVectors.writeFile(table, delA)
    val dvDataA = DeletionVectors.serialize(delA)
    val dvDataB = DeletionVectors.serialize(delB)
    val padB = dvDataB ++ Array.fill((4 - dvDataB.length % 4) % 4)(0.toByte)
    val inlineB = DeletionVectors.z85Encode(padB)
    Files.write(table.resolve("_delta_log/00000000000000000001.json"),
      (Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        s"""{"remove":{"path":"$nameA","deletionTimestamp":1,"dataChange":true}}""",
        s"""{"add":{"path":"$nameA","partitionValues":{},"size":$sizeA,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$dvPathA","offset":$offA,"sizeInBytes":${dvDataA.length},"cardinality":${delA.length}}}}""",
        s"""{"remove":{"path":"$nameB","deletionTimestamp":1,"dataChange":true}}""",
        s"""{"add":{"path":"$nameB","partitionValues":{},"size":$sizeB,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inlineB","sizeInBytes":${dvDataB.length},"cardinality":${delB.length}}}}""")
        .mkString("", "\n", "\n")).getBytes("UTF-8"))

    DeltaImport.read(spark, table.toString)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Iceberg v2 merge-on-read position deletes — the
    * [[s51_delta_import_dv]] twin for the other open table format: a
    * TableStore table exports as Iceberg ([[graft.operators
    * .IcebergExport]]), a DELETE lands as a position-delete snapshot
    * (`appendPositionDeletes` — delete parquet + content-1 manifest +
    * new manifest list, no data file rewritten), and the
    * protocol-level reader serves the table MINUS the deleted
    * positions. The oracle is the logical filter, so the delete-file
    * schema, manifest content codes, sequence-number scoping, and the
    * row-index anti-join must all be exact. An in-gate REQUIRE pins
    * time travel: the pre-delete snapshot still serves every row.
    */
  val s52_iceberg_import_mor: OpQuery = OpQuery(
    "s52_iceberg_import_mor",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 5 = 2)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport, TableStore}
    val scratch = GateScratch.dir("graft-iceberg-mor-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    store.overwrite("mor", docs)
    val exported = IcebergExport.exportTable(
      store, "mor", scratch.resolve("ice").toString)
    // (file, position) of every to-delete row, off the scan metadata —
    // bounded fixture collect (the deleted slice of documents)
    val withPos = spark.read.parquet(s"$exported/data/*")
      .select(col("doc_id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/")
          .as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("doc_id") % 5 === 2)
      .collect()
    val byFile = withPos.groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f -> rs.map(_.getLong(2)).toSeq }
    val before = docs.count()
    IcebergExport.appendPositionDeletes(spark, exported.toString, byFile)
    // time travel REQUIRE: the pre-delete snapshot is untouched
    val origSnap = IcebergImport.snapshots(spark, exported.toString)
      .minBy(_._2)._1
    val preCount = IcebergImport.read(spark, exported.toString, Some(origSnap)).count()
    require(preCount == before,
      s"s52: pre-delete snapshot serves $preCount of $before rows — " +
        "the MOR append rewrote history")
    IcebergImport.read(spark, exported.toString)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Iceberg v2 EQUALITY deletes (the Flink-CDC shape — one row per
    * deleted KEY, no file or position named): the keys of every
    * `doc_id % 17 = 0` document land in an equality-delete snapshot on
    * (lang, source), and the reader must drop every row matching any
    * key null-safely, scoped strictly below the delete's sequence
    * number. Oracle: the NOT EXISTS form of the same key filter
    * (null-robust, unlike NOT IN). The in-gate REQUIRE again pins
    * pre-delete time travel.
    */
  val s53_iceberg_import_eqdel: OpQuery = OpQuery(
    "s53_iceberg_import_eqdel",
    """SELECT d.doc_id, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d
      |WHERE NOT EXISTS (SELECT 1 FROM documents k
      |                  WHERE k.doc_id % 17 = 0
      |                    AND k.lang IS NOT DISTINCT FROM d.lang
      |                    AND k.source IS NOT DISTINCT FROM d.source)
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{IcebergExport, IcebergImport, TableStore}
    val scratch = GateScratch.dir("graft-iceberg-eq-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    store.overwrite("eq", docs)
    val exported = IcebergExport.exportTable(
      store, "eq", scratch.resolve("ice").toString)
    val keys = docs.filter(col("doc_id") % 17 === 0)
      .select(col("lang"), col("source"))
    IcebergExport.appendEqualityDeletes(
      spark, exported.toString, keys, Seq("lang", "source"))
    val origSnap = IcebergImport.snapshots(spark, exported.toString)
      .minBy(_._2)._1
    val preCount = IcebergImport.read(spark, exported.toString, Some(origSnap)).count()
    require(preCount == docs.count(),
      s"s53: pre-delete snapshot serves $preCount rows — history rewritten")
    IcebergImport.read(spark, exported.toString)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Delta deletion-vector ROUND TRIP through the engine's own two
    * halves: [[graft.operators.DeltaExport.appendDeletionVectors]]
    * writes the DELETE commit (protocol upgrade + remove/re-add with a
    * z85-uuid DV file per touched data file — no data rewritten) and
    * [[graft.operators.DeltaImport]] reads it back. `s51` proves the
    * reader against a foreign-shaped forge (incl. inline DVs); this
    * proves the WRITE path emits what the reader (and any stock
    * DV-aware reader) consumes, plus time travel across the DV commit.
    */
  val s54_delta_dv_roundtrip: OpQuery = OpQuery(
    "s54_delta_dv_roundtrip",
    """SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents
      |WHERE NOT (doc_id % 9 = 4)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import graft.operators.{DeltaExport, DeltaImport, TableStore}
    val scratch = GateScratch.dir("graft-delta-dvrt-")
    val store = new TableStore(spark, scratch.resolve("store").toString)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    store.overwrite("rt", docs)
    val exported = DeltaExport.exportTable(
      store, "rt", scratch.resolve("delta").toString)
    // table-root-relative (file, position) pairs of the doomed rows
    val exp = exported.toString
    val pos = spark.read.parquet(s"$exp/gen-*")
      .select(col("doc_id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/")
          .as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("doc_id") % 9 === 4)
      .collect()
    val root = java.nio.file.Paths.get(exp).toAbsolutePath.normalize.toString
    val byFile = pos.groupBy(_.getString(1)).toSeq.map { case (f, rs) =>
      f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq
    }
    DeltaExport.appendDeletionVectors(exp, byFile)
    // time travel REQUIRE: the pre-delete version still serves all rows
    val prevV = DeltaImport.versions(exp).dropRight(1).last
    val preCount = DeltaImport.read(spark, exp, Some(prevV)).count()
    require(preCount == docs.count(),
      s"s54: pre-delete version serves $preCount rows — history rewritten")
    DeltaImport.read(spark, exp)
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(sim_ivf_append, s51_delta_import_dv,
    s52_iceberg_import_mor, s53_iceberg_import_eqdel, s54_delta_dv_roundtrip)
}
