package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions.{col, count, input_file_name, lit}
import org.apache.spark.sql.types._

/** Export a [[TableStore]] table's retained generation history as an
  * Apache Iceberg v2 table (the OTHER major open table format), written
  * per the PUBLIC spec (iceberg.apache.org/spec): `metadata/
  * vN.metadata.json` + `version-hint.text` (the HadoopTables layout a
  * stock reader opens from a bare path), one Avro manifest per
  * generation, one Avro manifest list per snapshot, every Avro field
  * carrying its spec-assigned `field-id` and every manifest carrying
  * the required key/value metadata (schema, partition-spec,
  * format-version, content).
  *
  * TableStore's full-swap generations map onto Iceberg snapshots the
  * same way they map onto Delta commits ([[DeltaExport]]): snapshot k's
  * manifest list references ONLY generation k's manifest, so time
  * travel (`snapshot-id` / sequence number) replays exactly the bytes
  * this engine's own `read(table, asOf)` serves. Data files are
  * hardlinked (immutable parquet ⇒ O(file count) export).
  *
  * Scope (refused loudly otherwise): primitive column types,
  * unpartitioned or Hive-style identity partitions — the shapes
  * TableStore itself writes. Avro classes ship with Spark, so the
  * export runs offline; IcebergExportSpec replays manifests byte-level
  * with the same Avro reader a stock implementation uses.
  */
object IcebergExport {

  def exportTable(store: TableStore, table: String, exportDir: String): Path = {
    // Resolve to an absolute, normalized path up front: record_count is
    // looked up by normalize(input_file_name) vs normalize(s"$out/rel"),
    // and a relative exportDir would make the keys never match — the
    // manifest would silently carry record_count=0, so stock Iceberg
    // readers answering count(*) from the manifest would be wrong.
    val out = Paths.get(exportDir).toAbsolutePath.normalize
    if (Files.exists(out)) deleteRecursively(out)
    val metaDir = out.resolve("metadata")
    Files.createDirectories(metaDir)
    Files.createDirectories(out.resolve("data"))

    val spark = store.spark
    val versions = store.versions(table)
    val current = store.currentVersion(table)
    val partCols = store.partitionColumns(table)

    def srcDir(v: Long): Path =
      if (v == current) Paths.get(store.path(table))
      else Paths.get(store.root, "_history", table.replace('.', '_'), f"v$v%05d")

    val schema = spark.read.parquet(srcDir(versions.last).toString).schema
    val fullSchema = StructType(
      schema.fields ++ partCols.filterNot(schema.fieldNames.contains)
        .map(p => StructField(p, partitionColType(store, table, p))))
    val fieldId: Map[String, Int] =
      fullSchema.fields.zipWithIndex.map { case (f, i) => f.name -> (i + 1) }.toMap
    val schemaJson = icebergSchemaJson(fullSchema, fieldId)
    val specJson = partitionSpecJson(partCols, fieldId)

    val tableUuid = UUID.nameUUIDFromBytes(s"iceberg:$table".getBytes("UTF-8"))
    val manifestEntrySchema = entrySchema(fullSchema, partCols)
    val listSchema = manifestListSchema()

    val snapshots = versions.zipWithIndex.map { case (v, idx) =>
      val seq = idx + 1L
      val snapshotId = 3000000000L + v
      val genDir = out.resolve("data").resolve(f"gen-v$v%05d")
      val files = linkGeneration(srcDir(v), genDir, out)
      // one scan per generation: per-file row counts for the manifest
      val counts: Map[String, Long] =
        spark.read.parquet(genDir.toString)
          .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
          .collect().map(r => normalize(r.getString(0)) -> r.getLong(1)).toMap
      val totalRows = counts.values.sum

      // manifest: every file of this generation as an ADDED entry
      val manifestName = s"${UUID.nameUUIDFromBytes(s"$table-m$v".getBytes)}-m0.avro"
      val manifestPath = metaDir.resolve(manifestName)
      writeAvro(manifestPath, manifestEntrySchema, Map(
        "schema" -> schemaJson,
        "partition-spec" -> specFieldsJson(partCols, fieldId),
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> "data")) { w =>
        files.foreach { fe =>
          val entry = new GenericData.Record(manifestEntrySchema)
          entry.put("status", 1) // ADDED
          entry.put("snapshot_id", snapshotId)
          entry.put("sequence_number", seq)
          entry.put("file_sequence_number", seq)
          val dfSchema = manifestEntrySchema.getField("data_file").schema()
          val df = new GenericData.Record(dfSchema)
          df.put("content", 0)
          df.put("file_path", s"$out/${fe.path}")
          df.put("file_format", "PARQUET")
          val pr = new GenericData.Record(dfSchema.getField("partition").schema())
          partitionValuesOf(fe.path, partCols, fullSchema).foreach {
            case (k, value) => pr.put(k, value)
          }
          df.put("partition", pr)
          // require the match: a silent 0 here corrupts manifest-based
          // count(*) in stock readers (round-5 advice item)
          df.put("record_count", counts.getOrElse(
            normalize(s"$out/${fe.path}"),
            throw new IllegalStateException(
              s"no row count for ${fe.path} — key mismatch in manifest build")))
          df.put("file_size_in_bytes", fe.size)
          entry.put("data_file", df)
          w.append(entry)
        }
      }

      // manifest list for this snapshot
      val listName = s"snap-$snapshotId-1-${UUID.nameUUIDFromBytes(s"$table-s$v".getBytes)}.avro"
      val listPath = metaDir.resolve(listName)
      writeAvro(listPath, listSchema, Map(
        "format-version" -> "2",
        "snapshot-id" -> snapshotId.toString,
        "parent-snapshot-id" -> "null",
        "sequence-number" -> seq.toString)) { w =>
        val mf = new GenericData.Record(listSchema)
        mf.put("manifest_path", manifestPath.toString)
        mf.put("manifest_length", Files.size(manifestPath))
        mf.put("partition_spec_id", 0)
        mf.put("content", 0)
        mf.put("sequence_number", seq)
        mf.put("min_sequence_number", seq)
        mf.put("added_snapshot_id", snapshotId)
        mf.put("added_files_count", files.size)
        mf.put("existing_files_count", 0)
        mf.put("deleted_files_count", 0)
        mf.put("added_rows_count", totalRows)
        mf.put("existing_rows_count", 0L)
        mf.put("deleted_rows_count", 0L)
        w.append(mf)
      }

      val op = if (idx == 0) "append" else "overwrite"
      s"""{"snapshot-id":$snapshotId,"sequence-number":$seq,
         |"timestamp-ms":${System.currentTimeMillis()},
         |"summary":{"operation":"$op"},
         |"manifest-list":"$listPath","schema-id":0}""".stripMargin.replace("\n", "")
    }

    val currentSnapshotId = 3000000000L + versions.last
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "$tableUuid",
         |  "location": "$out",
         |  "last-sequence-number": ${versions.size},
         |  "last-updated-ms": ${System.currentTimeMillis()},
         |  "last-column-id": ${fullSchema.size},
         |  "current-schema-id": 0,
         |  "schemas": [$schemaJson],
         |  "default-spec-id": 0,
         |  "partition-specs": [$specJson],
         |  "last-partition-id": ${999 + partCols.size},
         |  "default-sort-order-id": 0,
         |  "sort-orders": [{"order-id": 0, "fields": []}],
         |  "properties": {"write.format.default": "parquet"},
         |  "current-snapshot-id": $currentSnapshotId,
         |  "snapshots": [${snapshots.mkString(",")}]
         |}""".stripMargin
    Files.writeString(metaDir.resolve("v1.metadata.json"), metadata)
    Files.writeString(metaDir.resolve("version-hint.text"), "1")
    out
  }

  /** Append a MERGE-ON-READ position-delete snapshot (Iceberg v2 row
    * deletes without rewriting data files — what stock Spark/Flink
    * writers produce for DELETE on a MOR table): one position-delete
    * parquet (`file_path` string / `pos` long, field-ids 2147483546/5
    * per the spec, sorted), one delete manifest (`content = 1`), and a
    * new snapshot whose manifest list carries the prior snapshot's data
    * manifests (original sequence numbers — position deletes apply to
    * data files with data sequence number ≤ the delete's) plus the
    * delete manifest at the NEW sequence number.
    *
    * Targets tables laid out by [[exportTable]] (the metadata.json
    * splice assumes this writer's shape — asserted, never silent); the
    * RESULT follows the v2 spec's structures, with one stated gap: the
    * delete parquet is written by Spark without Iceberg field-id
    * metadata (ids 2147483546/2147483545), so name-based readers (this
    * engine's [[IcebergImport]], duckdb, pyiceberg) read it while a
    * strict field-id-resolving reader may not.
    *
    * `deletes`: absolute data-file path → 0-based row positions.
    */
  def appendPositionDeletes(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, deletes: Seq[(String, Seq[Long])],
      inheritSequence: Boolean = false): Unit = {
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mdText = compactMetadata(metaDir, hint)

    val LastSeq = """"last-sequence-number":\s*(\d+)""".r
    val CurSnap = """"current-snapshot-id":\s*(\d+)""".r
    val seq = LastSeq.findFirstMatchIn(mdText).getOrElse(
      throw new IllegalArgumentException(
        s"metadata v$hint has no last-sequence-number — not an exportTable layout")
    ).group(1).toLong + 1
    val prevSnapId = CurSnap.findFirstMatchIn(mdText).get.group(1).toLong
    val snapshotId = 3100000000L + seq

    // the delete parquet, written sorted — one file, moved into data/
    val rows = deletes.flatMap { case (p, ps) => ps.sorted.map(pos => (p, pos)) }
      .sortBy(identity)
    require(rows.nonEmpty, "appendPositionDeletes: empty delete set")
    import spark.implicits._
    val tmp = Files.createTempDirectory(out, "posdel-tmp-")
    rows.toDF("file_path", "pos").coalesce(1).sortWithinPartitions("file_path", "pos")
      .write.mode("overwrite").parquet(tmp.toString)
    val written = {
      val w = Files.list(tmp)
      try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally w.close()
    }
    val delName = s"delete-${UUID.nameUUIDFromBytes(s"posdel-$seq".getBytes)}.parquet"
    val delPath = out.resolve("data").resolve(delName)
    Files.move(written, delPath)
    deleteRecursively(tmp)
    commitDeleteSnapshot(out, delPath, rows.size.toLong,
      fileContent = 1, equalityIds = Seq.empty,
      inheritSequence = inheritSequence)
  }

  /** Append a MERGE-ON-READ EQUALITY-delete snapshot (what Flink CDC
    * writers produce): the delete parquet holds one row per deleted
    * KEY (the `equalityCols` projection), and a reader drops every
    * data row — in files with data sequence number STRICTLY BELOW the
    * delete's (the v2 rule that lets one commit delete-and-reinsert a
    * key) — whose equality columns null-safely match a delete row.
    * Same [[exportTable]]-layout scope and field-id caveat as
    * [[appendPositionDeletes]].
    */
  def appendEqualityDeletes(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, deleteKeys: org.apache.spark.sql.DataFrame,
      equalityCols: Seq[String]): Unit = {
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mdText = compactMetadata(metaDir, hint)
    // resolve the equality field ids from the table schema (exportTable
    // writes {"id": N, "name": "..."} pairs)
    val FieldRe = """\{"id":\s*(\d+),\s*"name":\s*"([^"]+)"""".r
    val idByName: Map[String, Int] = FieldRe.findAllMatchIn(mdText)
      .map(m => m.group(2) -> m.group(1).toInt).toMap
    val eqIds = equalityCols.map(c => idByName.getOrElse(c,
      throw new IllegalArgumentException(
        s"equality column $c not in table schema (have ${idByName.keys.mkString(",")})")))

    val rows = deleteKeys.select(equalityCols.map(
      org.apache.spark.sql.functions.col): _*).distinct()
    val tmp = Files.createTempDirectory(out, "eqdel-tmp-")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val written = {
      val w = Files.list(tmp)
      try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally w.close()
    }
    val n = spark.read.parquet(tmp.toString).count()
    require(n > 0, "appendEqualityDeletes: empty delete set")
    val seqProbe = """"last-sequence-number":\s*(\d+)""".r
      .findFirstMatchIn(mdText).get.group(1).toLong + 1
    val delPath = out.resolve("data").resolve(
      s"eq-delete-${UUID.nameUUIDFromBytes(s"eqdel-$seqProbe".getBytes)}.parquet")
    Files.move(written, delPath)
    deleteRecursively(tmp)
    commitDeleteSnapshot(out, delPath, n, fileContent = 2, equalityIds = eqIds)
  }

  /** One-snapshot DELETE-AND-REINSERT — the CDC upsert shape the v2
    * sequence-number rules exist for: a single new snapshot at sequence
    * N carries BOTH an equality-delete file (keyed on `equalityCols`)
    * and a new DATA file with the `reinsert` rows. A correct reader
    * applies the equality delete STRICTLY below N — killing the old
    * versions of the keys — while the reinserted file, at data sequence
    * N itself, survives. Both manifests' ENTRIES leave
    * `sequence_number` null, so the reader must also exercise the
    * spec's manifest-level sequence INHERITANCE to land on N at all
    * (gate `s58_iceberg_upsert_seq`; a reader that defaulted null to 0
    * would delete the reinserted rows, one that scoped `<=` would too).
    */
  def appendEqualityUpsert(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, deleteKeys: org.apache.spark.sql.DataFrame,
      equalityCols: Seq[String],
      reinsert: org.apache.spark.sql.DataFrame): Unit = {
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mdText = compactMetadata(metaDir, hint)
    val FieldRe = """\{"id":\s*(\d+),\s*"name":\s*"([^"]+)"""".r
    val idByName: Map[String, Int] = FieldRe.findAllMatchIn(mdText)
      .map(m => m.group(2) -> m.group(1).toInt).toMap
    val eqIds = equalityCols.map(c => idByName.getOrElse(c,
      throw new IllegalArgumentException(
        s"equality column $c not in table schema (have ${idByName.keys.mkString(",")})")))
    val seqProbe = """"last-sequence-number":\s*(\d+)""".r
      .findFirstMatchIn(mdText).get.group(1).toLong + 1

    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): (Path, Long) = {
      val tmp = Files.createTempDirectory(out, "upsert-tmp-")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val written = {
        val w = Files.list(tmp)
        try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally w.close()
      }
      val n = spark.read.parquet(tmp.toString).count()
      val dst = out.resolve("data").resolve(name)
      Files.move(written, dst)
      deleteRecursively(tmp)
      (dst, n)
    }
    val (delPath, nKeys) = writeOne(
      deleteKeys.select(equalityCols.map(
        org.apache.spark.sql.functions.col): _*).distinct(),
      s"eq-delete-${UUID.nameUUIDFromBytes(s"upsert-del-$seqProbe".getBytes)}.parquet")
    require(nKeys > 0, "appendEqualityUpsert: empty delete-key set")
    val (dataPath, nData) = writeOne(reinsert,
      s"upsert-${UUID.nameUUIDFromBytes(s"upsert-data-$seqProbe".getBytes)}.parquet")
    require(nData > 0, "appendEqualityUpsert: empty reinsert set")
    commitDeleteSnapshot(out, delPath, nKeys, fileContent = 2,
      equalityIds = eqIds, inheritSequence = true,
      reinsert = Some((dataPath, nData)))
  }

  /** SCHEMA EVOLUTION append (add-column, the v2 spec's safe evolution):
    * commit a new snapshot whose data file carries the table's columns
    * PLUS trailing new ones, registering an evolved schema (next
    * schema-id, new columns assigned fresh field-ids from
    * `last-column-id` — existing ids never move, the invariant every
    * Iceberg reader relies on) and pointing `current-schema-id` at it.
    * Old data files stay untouched; readers null-fill the added columns
    * for them, and time travel to a pre-evolution snapshot serves the
    * OLD shape via the snapshot's own `schema-id` (gate
    * `s61_iceberg_schema_evolution` pins both).
    *
    * `rows`' schema must be exactly the current schema followed by ≥1
    * new column — anything else (rename, drop, type change, reorder)
    * refuses loudly; those evolutions have different id-mapping rules
    * this writer does not implement. Unpartitioned tables only.
    */
  def appendEvolvedColumns(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, rows: org.apache.spark.sql.DataFrame): Unit =
    appendDataSnapshot(spark, tablePath, rows, evolve = true)

  /** Plain APPEND snapshot (operation=append, current schema): the shape
    * [[IcebergImport.readIncremental]] consumes. `rows`' schema must
    * equal the table's current schema exactly.
    */
  def appendRows(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, rows: org.apache.spark.sql.DataFrame): Unit =
    appendDataSnapshot(spark, tablePath, rows, evolve = false)

  private def appendDataSnapshot(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, rows: org.apache.spark.sql.DataFrame,
      evolve: Boolean): Unit = {
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(Files.readString(metaDir.resolve(s"v$hint.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]

    val specs = root.get("partition-specs")
    val defaultSpec = (0 until specs.size).map(specs.get)
      .find(_.get("spec-id").asInt == root.get("default-spec-id").asInt).get
    require(defaultSpec.get("fields").size == 0,
      "appendEvolvedColumns supports unpartitioned tables only")

    val schemas = root.get("schemas")
    val curSchemaId = root.get("current-schema-id").asInt
    val cur = (0 until schemas.size).map(schemas.get)
      .find(_.get("schema-id").asInt == curSchemaId).get
    val curFields = {
      val f = cur.get("fields"); (0 until f.size).map(f.get)
    }
    val sparkFields = rows.schema.fields
    require(!evolve || sparkFields.length > curFields.size,
      s"rows carry ${sparkFields.length} columns but the table already has " +
        s"${curFields.size} — nothing to evolve")
    require(evolve || sparkFields.length == curFields.size,
      s"appendRows: rows carry ${sparkFields.length} columns, table has " +
        s"${curFields.size} — schema must match exactly (use " +
        "appendEvolvedColumns to add columns)")
    curFields.zip(sparkFields).foreach { case (cf, sf) =>
      require(cf.get("name").asText == sf.name &&
        cf.get("type").asText == icebergType(sf.dataType),
        s"existing column mismatch: table has ${cf.get("name").asText}:" +
          s"${cf.get("type").asText}, rows have ${sf.name}:" +
          s"${icebergType(sf.dataType)} — only trailing ADD-column evolution " +
          "is supported")
    }
    val newCols = sparkFields.drop(curFields.size)

    var lastColId = root.get("last-column-id").asInt
    val newSchemaId =
      if (!evolve) curSchemaId
      else (0 until schemas.size).map(schemas.get(_).get("schema-id").asInt).max + 1
    val evolved = mapper.createObjectNode()
    evolved.put("type", "struct")
    evolved.put("schema-id", newSchemaId)
    val fieldsArr = mapper.createArrayNode()
    curFields.foreach(f => fieldsArr.add(f))
    newCols.foreach { sf =>
      lastColId += 1
      val fn = mapper.createObjectNode()
      fn.put("id", lastColId)
      fn.put("name", sf.name)
      // added columns are never required — old files have no value
      fn.put("required", false)
      fn.put("type", icebergType(sf.dataType))
      fieldsArr.add(fn)
    }
    evolved.set("fields", fieldsArr)

    val seq = root.get("last-sequence-number").asLong + 1
    val snapshotId = 3200000000L + seq

    // data file
    val tmp = Files.createTempDirectory(out, "evolve-tmp-")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val written = {
      val w = Files.list(tmp)
      try w.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally w.close()
    }
    val nRows = spark.read.parquet(tmp.toString).count()
    require(nRows > 0, "appendEvolvedColumns: empty row set")
    val dataPath = out.resolve("data").resolve(
      s"evolve-${UUID.nameUUIDFromBytes(s"evolve-$seq".getBytes)}.parquet")
    Files.move(written, dataPath)
    deleteRecursively(tmp)

    // data manifest under the EVOLVED schema
    val mSchema = entrySchema(rows.schema, Seq.empty)
    val manifestPath = metaDir.resolve(
      s"${UUID.nameUUIDFromBytes(s"evolve-m$seq".getBytes)}-m0.avro")
    writeAvro(manifestPath, mSchema, Map(
      "schema" -> evolved.toString,
      "partition-spec" -> "[]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data")) { w =>
      val entry = new GenericData.Record(mSchema)
      entry.put("status", 1)
      entry.put("snapshot_id", snapshotId)
      entry.put("sequence_number", seq)
      entry.put("file_sequence_number", seq)
      val dfSchema = mSchema.getField("data_file").schema()
      val df = new GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", dataPath.toString)
      df.put("file_format", "PARQUET")
      df.put("partition",
        new GenericData.Record(dfSchema.getField("partition").schema()))
      df.put("record_count", nRows)
      df.put("file_size_in_bytes", Files.size(dataPath))
      entry.put("data_file", df)
      w.append(entry)
    }

    // manifest list: prior snapshot's manifests verbatim + ours
    val prevSnapId = root.get("current-snapshot-id").asLong
    val snapsNode = root.get("snapshots")
    val prevSnap = (0 until snapsNode.size).map(snapsNode.get)
      .find(_.get("snapshot-id").asLong == prevSnapId).get
    val listSchema = manifestListSchema()
    val prevEntries = {
      val r = new org.apache.avro.file.DataFileReader[GenericRecord](
        new java.io.File(normalize(prevSnap.get("manifest-list").asText)),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toList finally r.close()
    }
    val listPath = metaDir.resolve(
      s"snap-$snapshotId-1-${UUID.nameUUIDFromBytes(s"evolve-s$seq".getBytes)}.avro")
    writeAvro(listPath, listSchema, Map(
      "format-version" -> "2",
      "snapshot-id" -> snapshotId.toString,
      "parent-snapshot-id" -> prevSnapId.toString,
      "sequence-number" -> seq.toString)) { w =>
      prevEntries.foreach { e =>
        val copy = new GenericData.Record(listSchema)
        listSchema.getFields.asScala.foreach(f => copy.put(f.name(), e.get(f.name())))
        w.append(copy)
      }
      val mf = new GenericData.Record(listSchema)
      mf.put("manifest_path", manifestPath.toString)
      mf.put("manifest_length", Files.size(manifestPath))
      mf.put("partition_spec_id", 0)
      mf.put("content", 0)
      mf.put("sequence_number", seq)
      mf.put("min_sequence_number", seq)
      mf.put("added_snapshot_id", snapshotId)
      mf.put("added_files_count", 1)
      mf.put("existing_files_count", 0)
      mf.put("deleted_files_count", 0)
      mf.put("added_rows_count", nRows)
      mf.put("existing_rows_count", 0L)
      mf.put("deleted_rows_count", 0L)
      w.append(mf)
    }

    // splice the metadata: evolved schema registered (evolution only),
    // current pointers advanced, the new snapshot stamped with ITS
    // schema-id
    if (evolve) {
      schemas.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].add(evolved)
      root.put("current-schema-id", newSchemaId)
      root.put("last-column-id", lastColId)
    }
    root.put("last-sequence-number", seq)
    root.put("current-snapshot-id", snapshotId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapshotId)
    snapNode.put("sequence-number", seq)
    snapNode.put("timestamp-ms", System.currentTimeMillis())
    snapNode.set("summary",
      mapper.createObjectNode().put("operation", "append"))
    snapNode.put("manifest-list", listPath.toString)
    snapNode.put("schema-id", newSchemaId)
    snapsNode.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].add(snapNode)
    val newV = hint.toInt + 1
    Files.writeString(metaDir.resolve(s"v$newV.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.writeString(metaDir.resolve("version-hint.text"), newV.toString)
  }

  /** EXPIRE SNAPSHOTS — the Iceberg metadata-retention lifecycle (the
    * twin of Delta's checkpoint+JSON-cleanup, gate `s55`): retain the
    * `keep` most recent snapshots by sequence number (the current
    * snapshot always survives), write a v(N+1) metadata.json with the
    * expired entries pruned, and physically delete everything only
    * they referenced — their manifest lists, manifests not shared with
    * a retained snapshot, and data/delete files not referenced by any
    * retained manifest. Returns the number of snapshots expired.
    *
    * Reference semantics: Iceberg's own `expireSnapshots` — time
    * travel to an expired snapshot must fail loudly afterwards while
    * the current state reads byte-identically (gate
    * `s59_iceberg_expire` pins both). Metadata-sized driver work, same
    * posture as the import's manifest walk.
    */
  def expireSnapshots(tablePath: String, keep: Int): Int = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mdText = Files.readString(metaDir.resolve(s"v$hint.metadata.json"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = mapper.readTree(mdText)
    val snaps = root.get("snapshots")
    require(snaps != null && snaps.isArray, "metadata carries no snapshots array")
    val all = (0 until snaps.size).map(snaps.get)
    if (all.size <= keep) return 0
    val current = root.get("current-snapshot-id").asLong()
    val bySeq = all.sortBy(-_.get("sequence-number").asLong())
    val retained = bySeq.take(keep)
    require(retained.exists(_.get("snapshot-id").asLong() == current),
      s"expire would drop the CURRENT snapshot $current — keep=$keep is " +
        "smaller than the current snapshot's recency rank; refusing")
    val expired = bySeq.drop(keep)

    def manifestsOf(listPath: String): Seq[String] = {
      val r = new org.apache.avro.file.DataFileReader[GenericRecord](
        new java.io.File(listPath.replaceFirst("^file:/*", "/")),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.map(_.get("manifest_path").toString).toList
      finally r.close()
    }
    def filesOf(manifestPath: String): Seq[String] = {
      val r = new org.apache.avro.file.DataFileReader[GenericRecord](
        new java.io.File(manifestPath.replaceFirst("^file:/*", "/")),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.map(e =>
        e.get("data_file").asInstanceOf[GenericRecord].get("file_path").toString)
        .toList
      finally r.close()
    }
    val retainedLists = retained.map(_.get("manifest-list").asText())
    val expiredLists = expired.map(_.get("manifest-list").asText())
    val retainedManifests = retainedLists.flatMap(manifestsOf).toSet
    val expiredManifests =
      expiredLists.flatMap(manifestsOf).toSet -- retainedManifests
    val retainedFiles = retainedManifests.toSeq.flatMap(filesOf).toSet
    val expiredFiles =
      expiredManifests.toSeq.flatMap(filesOf).toSet -- retainedFiles

    // prune the metadata FIRST (the only pointer readers follow), then
    // delete orphans — a crash mid-cleanup leaves unreferenced files,
    // never a referenced-but-deleted one
    val pruned = mapper.createArrayNode()
    retained.sortBy(_.get("sequence-number").asLong())
      .foreach(s => pruned.add(s))
    root.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .set("snapshots", pruned)
    val newV = hint.toInt + 1
    Files.writeString(metaDir.resolve(s"v$newV.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.writeString(metaDir.resolve("version-hint.text"), newV.toString)
    (expiredLists ++ expiredManifests ++ expiredFiles).foreach { p =>
      Files.deleteIfExists(Paths.get(p.replaceFirst("^file:/*", "/")))
    }
    expired.size
  }

  /** Shared tail of the delete writers: content-1 delete manifest for
    * `delPath`, a new manifest list carrying the prior snapshot's
    * manifests verbatim (original sequence numbers), and the spliced
    * v(N+1) metadata + version hint.
    *
    * `inheritSequence = true` writes the new manifests' ENTRY
    * `sequence_number`/`file_sequence_number` as NULL (the spec's
    * inheritance form — a reader resolves them from the manifest-list
    * entry's sequence number; round 13, VERDICT item 3).
    * `reinsert = Some((path, rows))` additionally commits a new DATA
    * manifest at the SAME sequence number — the delete-and-reinsert
    * snapshot [[appendEqualityUpsert]] builds.
    */
  /** metadata.json text normalized to COMPACT JSON: the regex-based
    * splice helpers assume `"key":value` with no whitespace around the
    * colon and single-line snapshot objects, while the jackson-rewriting
    * writers (expireSnapshots, appendDataSnapshot) emit pretty-printed
    * form — without this, an upsert after an appendRows would fail to
    * find any schema field (caught by gate s66).
    */
  private def compactMetadata(metaDir: Path, hint: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    mapper.readTree(
      Files.readString(metaDir.resolve(s"v$hint.metadata.json"))).toString
  }

  private def commitDeleteSnapshot(out: Path, delPath: Path,
      recordCount: Long, fileContent: Int, equalityIds: Seq[Int],
      inheritSequence: Boolean = false,
      reinsert: Option[(Path, Long)] = None): Unit = {
    val metaDir = out.resolve("metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text")).trim
    val mdText = compactMetadata(metaDir, hint)
    val LastSeq = """"last-sequence-number":\s*(\d+)""".r
    val CurSnap = """"current-snapshot-id":\s*(\d+)""".r
    val seq = LastSeq.findFirstMatchIn(mdText).getOrElse(
      throw new IllegalArgumentException(
        s"metadata v$hint has no last-sequence-number — not an exportTable layout")
    ).group(1).toLong + 1
    val prevSnapId = CurSnap.findFirstMatchIn(mdText).get.group(1).toLong
    val snapshotId = 3100000000L + seq

    // delete manifest: one entry for the delete file (unpartitioned
    // scope — exportTable's partitioned tables would need
    // partition-scoped delete records)
    val mSchema = deleteEntrySchema(
      withEqualityIds = equalityIds.nonEmpty, nullableSeq = inheritSequence)
    def writeOneFileManifest(path: Path, content: String, filePath: Path,
        fContent: Int, rows: Long, eqIds: Seq[Int]): Unit =
      writeAvro(path, mSchema, Map(
        "schema" -> """{"type": "struct", "schema-id": 0, "fields": []}""",
        "partition-spec" -> "[]",
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> content)) { w =>
        val entry = new GenericData.Record(mSchema)
        entry.put("status", 1)
        entry.put("snapshot_id", snapshotId)
        // inheritance form: null entry sequence numbers — the reader
        // resolves them from the manifest-list entry (spec §manifests)
        entry.put("sequence_number", if (inheritSequence) null else Long.box(seq))
        entry.put("file_sequence_number", if (inheritSequence) null else Long.box(seq))
        val dfSchema = mSchema.getField("data_file").schema()
        val df = new GenericData.Record(dfSchema)
        df.put("content", fContent) // 0 = data, 1 = position, 2 = equality
        df.put("file_path", filePath.toString)
        df.put("file_format", "PARQUET")
        df.put("partition",
          new GenericData.Record(dfSchema.getField("partition").schema()))
        df.put("record_count", rows)
        df.put("file_size_in_bytes", Files.size(filePath))
        if (eqIds.nonEmpty)
          df.put("equality_ids", eqIds.map(Int.box).asJava)
        entry.put("data_file", df)
        w.append(entry)
      }
    val manifestPath = metaDir.resolve(
      s"${UUID.nameUUIDFromBytes(s"del-m$seq-$fileContent".getBytes)}-m0.avro")
    writeOneFileManifest(manifestPath, "deletes", delPath, fileContent,
      recordCount, equalityIds)
    val reinsertManifest = reinsert.map { case (dataPath, rows) =>
      val p = metaDir.resolve(
        s"${UUID.nameUUIDFromBytes(s"upsert-m$seq".getBytes)}-m0.avro")
      writeOneFileManifest(p, "data", dataPath, 0, rows, Seq.empty)
      (p, rows)
    }

    // new manifest list: the prior snapshot's manifests verbatim + ours
    val prevListPath = {
      // non-greedy across the nested summary object: each snapshot is
      // one line with exactly one manifest-list after its id
      val SnapList = (""""snapshot-id":""" + prevSnapId +
        """,.*?"manifest-list":"([^"]+)"""").r
      SnapList.findFirstMatchIn(mdText).getOrElse(throw new IllegalArgumentException(
        s"snapshot $prevSnapId has no manifest-list in metadata v$hint")).group(1)
    }
    val listSchema = manifestListSchema()
    val prevEntries = {
      val r = new org.apache.avro.file.DataFileReader[GenericRecord](
        new java.io.File(prevListPath),
        new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toList finally r.close()
    }
    val listPath = metaDir.resolve(
      s"snap-$snapshotId-1-${UUID.nameUUIDFromBytes(s"del-s$seq".getBytes)}.avro")
    writeAvro(listPath, listSchema, Map(
      "format-version" -> "2",
      "snapshot-id" -> snapshotId.toString,
      "parent-snapshot-id" -> prevSnapId.toString,
      "sequence-number" -> seq.toString)) { w =>
      prevEntries.foreach { e =>
        val copy = new GenericData.Record(listSchema)
        listSchema.getFields.asScala.foreach(f => copy.put(f.name(), e.get(f.name())))
        w.append(copy)
      }
      def appendManifest(path: Path, content: Int, rows: Long): Unit = {
        val mf = new GenericData.Record(listSchema)
        mf.put("manifest_path", path.toString)
        mf.put("manifest_length", Files.size(path))
        mf.put("partition_spec_id", 0)
        mf.put("content", content) // 0 = data, 1 = deletes
        mf.put("sequence_number", seq)
        mf.put("min_sequence_number", seq)
        mf.put("added_snapshot_id", snapshotId)
        mf.put("added_files_count", 1)
        mf.put("existing_files_count", 0)
        mf.put("deleted_files_count", 0)
        mf.put("added_rows_count", rows)
        mf.put("existing_rows_count", 0L)
        mf.put("deleted_rows_count", 0L)
        w.append(mf)
      }
      appendManifest(manifestPath, 1, recordCount)
      reinsertManifest.foreach { case (p, rows) => appendManifest(p, 0, rows) }
    }

    val newSnapJson =
      s"""{"snapshot-id":$snapshotId,"sequence-number":$seq,""" +
        s""""timestamp-ms":${System.currentTimeMillis()},""" +
        s""""summary":{"operation":"delete"},""" +
        s""""manifest-list":"$listPath","schema-id":0}"""
    val spliced = LastSeq.replaceFirstIn(
      CurSnap.replaceFirstIn(mdText,
        s""""current-snapshot-id": $snapshotId"""),
      s""""last-sequence-number": $seq""")
    val withSnap = {
      // exportTable writes "snapshots" as the LAST key, so the final ']'
      // closes that array — assert the shape instead of trusting it
      val i = spliced.lastIndexOf("]")
      require(i > spliced.indexOf("\"snapshots\"") && spliced.indexOf("\"snapshots\"") > 0,
        "unexpected metadata layout — snapshots array must close the document")
      spliced.substring(0, i) + "," + newSnapJson + spliced.substring(i)
    }
    val newV = hint.toInt + 1
    Files.writeString(metaDir.resolve(s"v$newV.metadata.json"), withSnap)
    Files.writeString(metaDir.resolve("version-hint.text"), newV.toString)
  }

  /** Manifest-entry schema for delete manifests: the [[entrySchema]]
    * shape (empty partition record) plus the spec's optional
    * `equality_ids` list (field-id 135) when writing equality deletes.
    */
  private def deleteEntrySchema(withEqualityIds: Boolean,
      nullableSeq: Boolean = false): Schema = {
    // optional per the spec (data files never carry it — the upsert
    // snapshot writes a data manifest with the same entry schema)
    val eqField =
      if (!withEqualityIds) ""
      else """,
        |    {"name": "equality_ids", "field-id": 135, "default": null,
        |     "type": ["null", {"type": "array", "items": "int", "element-id": 136}]}""".stripMargin
    // inheritance form: the spec marks entry sequence numbers OPTIONAL —
    // null means "inherit from the manifest-list entry"
    val seqType =
      if (nullableSeq) """["null", "long"], "default": null"""
      else "\"long\""
    new Schema.Parser().parse(
      s"""{"type": "record", "name": "manifest_entry", "fields": [
         |  {"name": "status", "type": "int", "field-id": 0},
         |  {"name": "snapshot_id", "type": "long", "field-id": 1},
         |  {"name": "sequence_number", "type": $seqType, "field-id": 3},
         |  {"name": "file_sequence_number", "type": $seqType, "field-id": 4},
         |  {"name": "data_file", "field-id": 2, "type": {"type": "record", "name": "r2", "fields": [
         |    {"name": "content", "type": "int", "field-id": 134},
         |    {"name": "file_path", "type": "string", "field-id": 100},
         |    {"name": "file_format", "type": "string", "field-id": 101},
         |    {"name": "partition", "field-id": 102,
         |     "type": {"type": "record", "name": "r102", "fields": []}},
         |    {"name": "record_count", "type": "long", "field-id": 103},
         |    {"name": "file_size_in_bytes", "type": "long", "field-id": 104}$eqField
         |  ]}}
         |]}""".stripMargin)
  }

  // ---- schema translation --------------------------------------------

  private def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"IcebergExport supports primitive columns only, got ${other.sql}")
  }

  private def icebergSchemaJson(schema: StructType, fieldId: Map[String, Int]): String = {
    val fields = schema.fields.map { f =>
      s"""{"id": ${fieldId(f.name)}, "name": "${f.name}", """ +
        s""""required": ${!f.nullable}, "type": "${icebergType(f.dataType)}"}"""
    }
    s"""{"type": "struct", "schema-id": 0, "fields": [${fields.mkString(", ")}]}"""
  }

  private def specFieldsJson(partCols: Seq[String], fieldId: Map[String, Int]): String =
    partCols.zipWithIndex.map { case (p, i) =>
      s"""{"name": "$p", "transform": "identity", "source-id": ${fieldId(p)}, "field-id": ${1000 + i}}"""
    }.mkString("[", ", ", "]")

  private def partitionSpecJson(partCols: Seq[String], fieldId: Map[String, Int]): String =
    s"""{"spec-id": 0, "fields": ${specFieldsJson(partCols, fieldId)}}"""

  private def partitionColType(store: TableStore, table: String, colName: String): DataType = {
    // partition columns live in the directory names; recover the type
    // Spark's partition discovery infers on a normal read
    store.read(table).schema(colName).dataType
  }

  private def partitionValuesOf(
      relPath: String, partCols: Seq[String], schema: StructType): Seq[(String, Any)] = {
    val kvs = relPath.split('/').filter(_.contains('=')).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      // Hive unescaping (the inverse of how the dirs were written) —
      // URLDecoder would additionally fold '+' into a space
      k -> org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(v)
    }.toMap
    partCols.map { p =>
      val raw = kvs.getOrElse(p, throw new IllegalArgumentException(
        s"partition column $p missing from path $relPath"))
      val typed: Any = schema(p).dataType match {
        case IntegerType => raw.toInt
        case LongType => java.lang.Long.valueOf(raw)
        case StringType => raw
        case other => throw new IllegalArgumentException(
          s"identity partition on ${other.sql} not supported")
      }
      p -> typed
    }
  }

  // ---- avro schemas (field-ids per the Iceberg spec) -----------------

  private def avroPrimitive(dt: DataType): String = dt match {
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case StringType => "\"string\""
    case other => throw new IllegalArgumentException(
      s"identity partition on ${other.sql} not supported")
  }

  private def entrySchema(schema: StructType, partCols: Seq[String]): Schema = {
    // every field is written with a concrete value, so plain required
    // Avro types are used throughout — a reader whose expected schema
    // marks these optional resolves writer-required → reader-union per
    // standard Avro schema resolution
    val partFields = partCols.zipWithIndex.map { case (p, i) =>
      s"""{"name": "$p", "type": ${avroPrimitive(schema(p).dataType)}, "field-id": ${1000 + i}}"""
    }.mkString(", ")
    new Schema.Parser().parse(
      s"""{"type": "record", "name": "manifest_entry", "fields": [
         |  {"name": "status", "type": "int", "field-id": 0},
         |  {"name": "snapshot_id", "type": "long", "field-id": 1},
         |  {"name": "sequence_number", "type": "long", "field-id": 3},
         |  {"name": "file_sequence_number", "type": "long", "field-id": 4},
         |  {"name": "data_file", "field-id": 2, "type": {"type": "record", "name": "r2", "fields": [
         |    {"name": "content", "type": "int", "field-id": 134},
         |    {"name": "file_path", "type": "string", "field-id": 100},
         |    {"name": "file_format", "type": "string", "field-id": 101},
         |    {"name": "partition", "field-id": 102,
         |     "type": {"type": "record", "name": "r102", "fields": [$partFields]}},
         |    {"name": "record_count", "type": "long", "field-id": 103},
         |    {"name": "file_size_in_bytes", "type": "long", "field-id": 104}
         |  ]}}
         |]}""".stripMargin)
  }

  private def manifestListSchema(): Schema =
    new Schema.Parser().parse(
      """{"type": "record", "name": "manifest_file", "fields": [
        |  {"name": "manifest_path", "type": "string", "field-id": 500},
        |  {"name": "manifest_length", "type": "long", "field-id": 501},
        |  {"name": "partition_spec_id", "type": "int", "field-id": 502},
        |  {"name": "content", "type": "int", "field-id": 517},
        |  {"name": "sequence_number", "type": "long", "field-id": 515},
        |  {"name": "min_sequence_number", "type": "long", "field-id": 516},
        |  {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        |  {"name": "added_files_count", "type": "int", "field-id": 504},
        |  {"name": "existing_files_count", "type": "int", "field-id": 505},
        |  {"name": "deleted_files_count", "type": "int", "field-id": 506},
        |  {"name": "added_rows_count", "type": "long", "field-id": 512},
        |  {"name": "existing_rows_count", "type": "long", "field-id": 513},
        |  {"name": "deleted_rows_count", "type": "long", "field-id": 514}
        |]}""".stripMargin)

  // ---- plumbing -------------------------------------------------------

  private def writeAvro(target: Path, schema: Schema, meta: Map[String, String])(
      body: DataFileWriter[GenericRecord] => Unit): Unit = {
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => writer.setMeta(k, v) }
    writer.create(schema, target.toFile)
    try body(writer) finally writer.close()
  }

  private case class FileEntry(path: String, size: Long)

  private def linkGeneration(srcDir: Path, genDir: Path, exportRoot: Path): Seq[FileEntry] = {
    val walk = Files.walk(srcDir)
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .filter(p => !srcDir.relativize(p).toString.startsWith("_"))
      .map { p =>
        val rel = srcDir.relativize(p)
        val dst = genDir.resolve(rel)
        Files.createDirectories(dst.getParent)
        try Files.createLink(dst, p)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(p, dst)
        }
        FileEntry(exportRoot.relativize(dst).toString, Files.size(dst))
      }
      .toSeq.sortBy(_.path)
    finally walk.close()
  }

  /** input_file_name() URIs vs Path strings: strip the scheme and any
    * duplicate slashes so per-file row counts key consistently.
    */
  private def normalize(p: String): String =
    java.net.URLDecoder.decode(p.replaceFirst("^file:/*", "/"), "UTF-8")

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    val all = try s.iterator().asScala.toSeq finally s.close()
    all.reverse.foreach(Files.delete)
  }
}
