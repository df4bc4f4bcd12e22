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
  * in both directions, offline. The same scope rules: identity
  * partitions, primitive types; merge-on-read position/equality
  * deletes are REFUSED loudly (content ≠ data), never silently
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

    val schema = schemaOf(md)
    val partCols = partitionColsOf(md)
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))

    val files = manifestEntries(snap.getAs[String]("manifest-list"))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(schema.fields))

    val scan = spark.read.schema(dataSchema).parquet(files.map(_._1): _*)
    if (partCols.isEmpty) scan
    else {
      val mappingSchema = StructType(
        StructField("__path", StringType) +:
          partCols.map(p => StructField(s"__$p", schema(p).dataType)))
      val mappingRows = files.map { case (path, pvals) =>
        Row.fromSeq(path +: partCols.map(pvals.get(_).orNull))
      }
      val mapping = spark.createDataFrame(
        spark.sparkContext.parallelize(mappingRows.toSeq, 1), mappingSchema)
      val joined = scan
        .withColumn("__path",
          regexp_replace(url_decode(input_file_name()), "^file:/*", "/"))
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

  private def schemaOf(md: Row): StructType = {
    val currentId = md.getAs[Long]("current-schema-id")
    val schemas = md.getAs[scala.collection.Seq[Row]]("schemas")
    val s = schemas.find(_.getAs[Long]("schema-id") == currentId)
      .getOrElse(throw new IllegalArgumentException("current schema not found"))
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

  private def partitionColsOf(md: Row): Seq[String] = {
    val specId = md.getAs[Long]("default-spec-id")
    val specs = md.getAs[scala.collection.Seq[Row]]("partition-specs")
    val spec = specs.find(_.getAs[Long]("spec-id") == specId)
      .getOrElse(throw new IllegalArgumentException("default partition spec not found"))
    val fields = spec.getAs[scala.collection.Seq[Row]]("fields")
    if (fields == null) Seq.empty
    else fields.map { f =>
      require(f.getAs[String]("transform") == "identity",
        s"only identity partition transforms supported, got ${f.getAs[String]("transform")}")
      f.getAs[String]("name")
    }.toSeq
  }

  /** All data files of a snapshot: (path, partition values). Streams
    * each Avro manifest; refuses delete manifests (merge-on-read).
    */
  private def manifestEntries(manifestListPath: String): Seq[(String, Map[String, Any])] = {
    readAvro(manifestListPath).flatMap { mf =>
      require(mf.get("content") == null || mf.get("content").asInstanceOf[Int] == 0,
        "delete manifests (merge-on-read) not supported by this offline reader")
      readAvro(mf.get("manifest_path").toString).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED entries drop out of the snapshot
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          require(df.get("content") == null || df.get("content").asInstanceOf[Int] == 0,
            "position/equality delete files not supported by this offline reader")
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
        }
      }
    }
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path.replaceFirst("^file:/*", "/")),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toList finally reader.close()
  }
}
