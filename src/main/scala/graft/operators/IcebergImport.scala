package graft.operators

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read an Apache Iceberg v2 table (HadoopTables layout) without
  * Iceberg jars: version-hint → metadata.json → snapshot → manifest
  * list (Avro) → manifests (Avro) → parquet, with identity partition
  * values reattached from each data_file's `partition` record (the
  * spec's source of truth) and `snapshot-id` time travel.
  *
  * Companion to [[IcebergExport]] — together with [[DeltaImport]]/
  * [[DeltaExport]] the engine now speaks both major open table formats
  * in both directions, offline. Scope: identity partitions, primitive
  * types, and (round 12 — the Delta deletion-vector twin) merge-on-read
  * row-level deletes, BOTH kinds: POSITION deletes (delete parquet's
  * (file_path, pos) rows, scoped to files with data seq ≤ the delete's,
  * anti-joined on `_metadata.row_index`) and EQUALITY deletes (the
  * Flink-CDC shape: key rows matched null-safely on the equality
  * field-id columns, scoped STRICTLY below the delete's sequence).
  * Unknown delete contents still refuse loudly, never silently
  * mis-read.
  *
  * Scale note: metadata parsing is file-count-bound, not data-bound —
  * manifests stream through the bundled Avro reader one record at a
  * time (no spark-avro connector ships offline); the file→partition
  * mapping then broadcasts against the distributed parquet scan
  * exactly as in [[DeltaImport]].
  */
object IcebergImport {

  /** Live data at `snapshotId` (default: current snapshot). */
  def read(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val md = metadata(spark, tablePath)
    val snaps = md.getAs[scala.collection.Seq[Row]]("snapshots")
    val snap = snapshotId match {
      case Some(id) => snaps.find(_.getAs[Long]("snapshot-id") == id)
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot $id not found; have ${snaps.map(_.getAs[Long]("snapshot-id"))}"))
      case None =>
        val cur = md.getAs[Long]("current-snapshot-id")
        snaps.find(_.getAs[Long]("snapshot-id") == cur).getOrElse(
          throw new IllegalArgumentException(s"current snapshot $cur missing"))
    }

    // schema evolution: each snapshot names the schema it was written
    // under (`schema-id`) — time travel must serve THAT shape, not the
    // current one, or a pre-evolution read would grow phantom null
    // columns (spec §snapshots; gate s61 pins it)
    val snapSchemaId: Long =
      if (snap.schema.fieldNames.contains("schema-id") &&
        !snap.isNullAt(snap.fieldIndex("schema-id")))
        snap.getAs[Long]("schema-id")
      else md.getAs[Long]("current-schema-id")
    val schema = schemaOf(md, snapSchemaId)
    val partCols = partitionColsOf(md)
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))

    val mfs = manifestEntries(snap.getAs[String]("manifest-list"))
    val files = mfs.data
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(schema.fields))

    // derived-transform partitions (bucket/truncate/date): the source
    // columns must actually be IN the data files — the explicit-schema
    // scan below would null-fill a missing one silently, the worst
    // failure mode. One footer probe, metadata-sized.
    val derived = nonIdentitySources(md)
    if (derived.nonEmpty) {
      val probe = spark.read.parquet(files.head._1).schema.fieldNames.toSet
      derived.foreach { case (t, src) =>
        require(probe.contains(src),
          s"partition transform $t: source column '$src' absent from data " +
            s"file ${files.head._1} — cannot reconstruct a derived partition value")
      }
    }

    val scan = spark.read.schema(dataSchema).parquet(files.map(_._1): _*)
    val pathExpr = regexp_replace(url_decode(input_file_name()), "^file:/*", "/")
    val anyDeletes = mfs.posDeletes.nonEmpty || mfs.eqDeletes.nonEmpty
    lazy val fileSeq = spark.createDataFrame(
      spark.sparkContext.parallelize(
        files.map(f => Row(normPath(f._1), f._3)).toSeq, 1),
      StructType(Seq(StructField("__path", StringType),
        StructField("__fseq", LongType))))

    // merge-on-read POSITION deletes (round 12 — previously refused):
    // each delete parquet holds (file_path, pos) rows; a delete applies
    // to data files whose DATA sequence number is <= the delete's (the
    // v2 scoping rule), so join the delete rows to the per-file sequence
    // map first, then anti-join the scan on (path, row position).
    val posApplied =
      if (mfs.posDeletes.isEmpty) {
        if (anyDeletes || partCols.nonEmpty) scan.withColumn("__path", pathExpr)
        else scan
      } else {
        val deleteRows = mfs.posDeletes.map { case (p, dseq) =>
          spark.read.schema("file_path string, pos long").parquet(p)
            .select(
              regexp_replace(col("file_path"), "^file:/*", "/").as("__path"),
              col("pos").as("__pos"), lit(dseq).as("__dseq"))
        }.reduce(_ unionByName _)
        val applicable = deleteRows
          .join(broadcast(fileSeq), Seq("__path"))
          .filter(col("__dseq") >= col("__fseq"))
          .select(col("__path"), col("__pos"))
        scan
          .withColumn("__path", pathExpr)
          .withColumn("__pos", col("_metadata.row_index"))
          .join(applicable, Seq("__path", "__pos"), "left_anti")
          .drop("__pos")
      }

    // merge-on-read EQUALITY deletes (the Flink-CDC shape): each delete
    // parquet holds one row per deleted key; a data row is dropped when
    // its equality columns null-safely match any delete row AND its
    // file's data sequence number is STRICTLY below the delete's (the
    // v2 rule that lets one commit delete-and-reinsert a key).
    val applied =
      if (mfs.eqDeletes.isEmpty) posApplied
      else {
        val idToName: Map[Int, String] = fieldIdToName(md)
        val withSeq = posApplied.join(broadcast(fileSeq), Seq("__path"))
        mfs.eqDeletes.foldLeft(withSeq) { case (acc, (p, dseq, ids)) =>
          val names = ids.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"equality field id $id not in table schema")))
          names.foreach(n => require(acc.columns.contains(n),
            s"equality delete on '$n' — partition-column equality deletes " +
              "not supported by this offline reader"))
          val delDf = spark.read.parquet(p).select(names.map(col): _*)
          val cond = names.map(n => acc(n) <=> delDf(n)).reduce(_ && _) &&
            acc("__fseq") < lit(dseq)
          acc.join(delDf, cond, "left_anti")
        }.drop("__fseq")
      }

    if (partCols.isEmpty)
      (if (anyDeletes) applied.drop("__path") else applied)
    else {
      val mappingSchema = StructType(
        StructField("__path", StringType) +:
          partCols.map(p => StructField(s"__$p", schema(p).dataType)))
      val mappingRows = files.map { case (path, pvals, _) =>
        Row.fromSeq(normPath(path) +: partCols.map(pvals.get(_).orNull))
      }
      val mapping = spark.createDataFrame(
        spark.sparkContext.parallelize(mappingRows.toSeq, 1), mappingSchema)
      // __path is always attached upstream when partCols is non-empty
      val joined = applied.join(broadcast(mapping), Seq("__path"))
      partCols.foldLeft(joined)((df, p) => df.withColumn(p, col(s"__$p")))
        .select(schema.map(f => col(f.name)): _*)
    }
  }

  /** INCREMENTAL APPEND SCAN (stock `IncrementalAppendScan` semantics):
    * the rows added by snapshots in `(fromSnapshotId, toSnapshotId]`,
    * reading ONLY the data files those snapshots appended — the log
    * names them, so a nightly 0.1% append reads 0.1% of the table.
    * Stock parity on the refusal surface too: any snapshot in range
    * whose operation is not `append` (overwrite, delete, CDC upsert)
    * refuses loudly — its changes are not expressible as pure adds, and
    * serving just the added files would silently misstate them.
    *
    * Identity partition values reattach from the manifests' partition
    * records exactly as in [[read]]; the schema is the TO snapshot's.
    */
  def readIncremental(spark: SparkSession, tablePath: String,
      fromSnapshotId: Long, toSnapshotId: Long): DataFrame = {
    val md = metadata(spark, tablePath)
    val snaps = md.getAs[scala.collection.Seq[Row]]("snapshots")
    def seqOf(id: Long): Long = snaps.find(_.getAs[Long]("snapshot-id") == id)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $id not found; have ${snaps.map(_.getAs[Long]("snapshot-id"))}"))
      .getAs[Long]("sequence-number")
    val (fromSeq, toSeq) = (seqOf(fromSnapshotId), seqOf(toSnapshotId))
    require(fromSeq < toSeq,
      s"empty incremental range: sequence $fromSeq !< $toSeq")
    val inRange = snaps.filter { s =>
      val q = s.getAs[Long]("sequence-number"); q > fromSeq && q <= toSeq
    }.sortBy(_.getAs[Long]("sequence-number"))
    inRange.foreach { s =>
      val op = Option(s.getAs[Row]("summary"))
        .map(_.getAs[String]("operation")).getOrElse("?")
      require(op == "append",
        s"snapshot ${s.getAs[Long]("snapshot-id")} in range is '$op' — an " +
          "incremental APPEND scan cannot express overwrites or deletes; " +
          "read full snapshots instead")
    }

    val toSnap = inRange.last
    val snapSchemaId: Long =
      if (toSnap.schema.fieldNames.contains("schema-id") &&
        !toSnap.isNullAt(toSnap.fieldIndex("schema-id")))
        toSnap.getAs[Long]("schema-id")
      else md.getAs[Long]("current-schema-id")
    val schema = schemaOf(md, snapSchemaId)
    val partCols = partitionColsOf(md)
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))

    // files ADDED by each in-range snapshot: its own manifests (by
    // added_snapshot_id), ADDED entries only; a delete manifest or a
    // DELETED entry inside an "append" snapshot is a mislabeled writer —
    // refuse rather than misread
    val added: Seq[(String, Map[String, Any])] = inRange.toSeq.flatMap { s =>
      val sid = s.getAs[Long]("snapshot-id")
      readAvro(s.getAs[String]("manifest-list"))
        .filter(_.get("added_snapshot_id").asInstanceOf[Long] == sid)
        .flatMap { mf =>
          val content =
            if (mf.get("content") == null) 0 else mf.get("content").asInstanceOf[Int]
          require(content == 0,
            s"append snapshot $sid added a DELETE manifest — refusing")
          readAvro(mf.get("manifest_path").toString).flatMap { entry =>
            val status = entry.get("status").asInstanceOf[Int]
            require(status != 2,
              s"append snapshot $sid carries a DELETED entry — refusing")
            val esid =
              if (entry.get("snapshot_id") == null) sid
              else entry.get("snapshot_id").asInstanceOf[Long]
            if (status == 1 && esid == sid) {
              val df = entry.get("data_file").asInstanceOf[GenericRecord]
              val part = df.get("partition").asInstanceOf[GenericRecord]
              val pvals: Map[String, Any] =
                if (part == null) Map.empty
                else part.getSchema.getFields.asScala.map { f =>
                  f.name() -> (part.get(f.name()) match {
                    case u: org.apache.avro.util.Utf8 => u.toString
                    case v => v
                  })
                }.toMap
              Some(df.get("file_path").toString -> pvals)
            } else None
          }
        }
    }
    if (added.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(schema.fields))

    val scan = spark.read.schema(dataSchema).parquet(added.map(_._1): _*)
    if (partCols.isEmpty) scan
    else {
      val pathExpr = regexp_replace(url_decode(input_file_name()), "^file:/*", "/")
      val mappingSchema = StructType(
        StructField("__path", StringType) +:
          partCols.map(p => StructField(s"__$p", schema(p).dataType)))
      val mappingRows = added.map { case (path, pvals) =>
        Row.fromSeq(normPath(path) +: partCols.map(pvals.get(_).orNull))
      }
      val mapping = spark.createDataFrame(
        spark.sparkContext.parallelize(mappingRows.toSeq, 1), mappingSchema)
      val joined = scan.withColumn("__path", pathExpr)
        .join(broadcast(mapping), Seq("__path"))
      partCols.foldLeft(joined)((df, p) => df.withColumn(p, col(s"__$p")))
        .select(schema.map(f => col(f.name)): _*)
    }
  }

  /** (snapshot-id, sequence-number) pairs, ascending by sequence. */
  def snapshots(spark: SparkSession, tablePath: String): Seq[(Long, Long)] =
    metadata(spark, tablePath).getAs[scala.collection.Seq[Row]]("snapshots")
      .map(s => (s.getAs[Long]("snapshot-id"), s.getAs[Long]("sequence-number")))
      .sortBy(_._2).toSeq

  // ---- internals ------------------------------------------------------

  /** Manifest paths are plain absolute paths in this layout; strip any
    * scheme so they key identically with the scan's decoded
    * input_file_name form.
    */
  private def normPath(p: String): String = p.replaceFirst("^file:/*", "/")

  private def metadata(spark: SparkSession, tablePath: String): Row = {
    val hintFile = Paths.get(tablePath, "metadata", "version-hint.text")
    require(Files.exists(hintFile),
      s"not a HadoopTables Iceberg table (no metadata/version-hint.text): $tablePath")
    val hint = Files.readString(hintFile).trim
    val md = spark.read.option("multiLine", true)
      .json(s"$tablePath/metadata/v$hint.metadata.json").head()
    require(md.getAs[Long]("format-version") == 2L,
      s"only Iceberg format-version 2 supported, got ${md.getAs[Long]("format-version")}")
    md
  }

  /** field id → column name for the current schema (equality deletes
    * reference columns by field id).
    */
  private def fieldIdToName(md: Row): Map[Int, String] = {
    val currentId = md.getAs[Long]("current-schema-id")
    val schemas = md.getAs[scala.collection.Seq[Row]]("schemas")
    val s = schemas.find(_.getAs[Long]("schema-id") == currentId)
      .getOrElse(throw new IllegalArgumentException("current schema not found"))
    s.getAs[scala.collection.Seq[Row]]("fields")
      .map(f => f.getAs[Long]("id").toInt -> f.getAs[String]("name")).toMap
  }

  private def schemaOf(md: Row, schemaId: Long): StructType = {
    val schemas = md.getAs[scala.collection.Seq[Row]]("schemas")
    val s = schemas.find(_.getAs[Long]("schema-id") == schemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"schema $schemaId not found in metadata"))
    StructType(s.getAs[scala.collection.Seq[Row]]("fields").map { f =>
      StructField(f.getAs[String]("name"), icebergToSpark(f.getAs[String]("type")),
        nullable = !f.getAs[Boolean]("required"))
    }.toSeq)
  }

  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r

  private def icebergToSpark(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "binary" => BinaryType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg type: $other")
  }

  /** Identity-transform partition columns — the only ones whose values
    * must be REATTACHED from the partition record (data files
    * legitimately omit them). Non-identity transforms (bucket[N],
    * truncate[W], year/month/day/hour, void) are DERIVED values: the
    * source column is stored in the data file itself, so the reader
    * scans it directly and ignores the derived partition value —
    * [[nonIdentitySources]] names the source columns so [[read]] can
    * verify they really are in the files (a file missing its source
    * column would otherwise null-fill silently).
    */
  private def partitionColsOf(md: Row): Seq[String] = {
    val fields = defaultSpecFields(md)
    fields.filter(_.getAs[String]("transform") == "identity")
      .map(_.getAs[String]("name"))
  }

  private val KnownDerived =
    """(bucket\[\d+\]|truncate\[\d+\]|year|month|day|hour|void)""".r

  /** (transform, source column name) for every non-identity partition
    * field of the default spec; unknown transforms refuse loudly.
    */
  private def nonIdentitySources(md: Row): Seq[(String, String)] = {
    lazy val idToName = fieldIdToName(md)
    defaultSpecFields(md)
      .filter(_.getAs[String]("transform") != "identity")
      .map { f =>
        val t = f.getAs[String]("transform")
        require(KnownDerived.pattern.matcher(t).matches(),
          s"unknown partition transform '$t' — refusing to guess its semantics")
        val sid = f.getAs[Long]("source-id").toInt
        t -> idToName.getOrElse(sid, throw new IllegalArgumentException(
          s"partition transform $t references unknown source field id $sid"))
      }
  }

  private def defaultSpecFields(md: Row): Seq[Row] = {
    val specId = md.getAs[Long]("default-spec-id")
    val specs = md.getAs[scala.collection.Seq[Row]]("partition-specs")
    val spec = specs.find(_.getAs[Long]("spec-id") == specId)
      .getOrElse(throw new IllegalArgumentException("default partition spec not found"))
    val fields = spec.getAs[scala.collection.Seq[Row]]("fields")
    if (fields == null) Seq.empty else fields.toSeq
  }

  private final case class ManifestFiles(
      data: Seq[(String, Map[String, Any], Long)], // path, partition values, data seq
      posDeletes: Seq[(String, Long)],             // path, delete seq
      eqDeletes: Seq[(String, Long, Seq[Int])])    // path, delete seq, equality field ids

  /** All files of a snapshot, split into data files and position-delete
    * files with their sequence numbers (entry sequence, inherited from
    * the manifest when null — the spec's inheritance rule); equality
    * delete entries carry their equality field-id list.
    */
  private def manifestEntries(manifestListPath: String): ManifestFiles = {
    val data = Seq.newBuilder[(String, Map[String, Any], Long)]
    val dels = Seq.newBuilder[(String, Long)]
    val eqs = Seq.newBuilder[(String, Long, Seq[Int])]
    readAvro(manifestListPath).foreach { mf =>
      val mfContent =
        if (mf.get("content") == null) 0 else mf.get("content").asInstanceOf[Int]
      require(mfContent == 0 || mfContent == 1,
        s"unknown manifest content $mfContent in $manifestListPath")
      val mfSeq =
        if (mf.get("sequence_number") == null) 0L
        else mf.get("sequence_number").asInstanceOf[Long]
      readAvro(mf.get("manifest_path").toString).foreach { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status != 2) { // DELETED entries drop out of the snapshot
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content =
            if (df.get("content") == null) 0 else df.get("content").asInstanceOf[Int]
          val seq =
            if (entry.get("sequence_number") == null) mfSeq
            else entry.get("sequence_number").asInstanceOf[Long]
          content match {
            case 0 =>
              val part = df.get("partition").asInstanceOf[GenericRecord]
              val pvals: Map[String, Any] =
                if (part == null) Map.empty
                else part.getSchema.getFields.asScala.map { f =>
                  f.name() -> (part.get(f.name()) match {
                    case u: org.apache.avro.util.Utf8 => u.toString
                    case v => v
                  })
                }.toMap
              data += ((df.get("file_path").toString, pvals, seq))
            case 1 => dels += ((df.get("file_path").toString, seq))
            case 2 =>
              val ids = df.get("equality_ids") match {
                case null => throw new IllegalArgumentException(
                  s"equality delete file ${df.get("file_path")} carries no equality_ids")
                case l: java.util.List[_] =>
                  l.asScala.map(_.asInstanceOf[Int]).toSeq
                case a: org.apache.avro.generic.GenericData.Array[_] =>
                  a.asScala.map(_.asInstanceOf[Int]).toSeq
              }
              eqs += ((df.get("file_path").toString, seq, ids))
            case other => throw new IllegalArgumentException(
              s"unknown delete file content=$other in $manifestListPath")
          }
        }
      }
    }
    ManifestFiles(data.result(), dels.result(), eqs.result())
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path.replaceFirst("^file:/*", "/")),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }
}
