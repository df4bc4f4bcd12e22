package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Avro container files as a table source/sink WITHOUT the spark-avro
  * connector (absent offline; only the core `org.apache.avro` jars
  * ship with Spark). The remaining major row format next to parquet/
  * CSV/JSON/JDBC/binaryFile and the Delta/Iceberg importers — Kafka
  * archive dumps and legacy ingest pipelines speak Avro.
  *
  * Scale shape: WRITE runs one Avro container file per partition from
  * `mapPartitions` (executor-side streaming encode — the driver never
  * sees rows); READ parallelizes over the file list and streams each
  * container through `DataFileReader` (records decode lazily, one
  * block at a time — memory is block-sized, not file-sized). Schema
  * comes from the FIRST file's embedded writer schema and every other
  * file must declare the identical schema — loud refusal beats a
  * silently coerced union.
  *
  * Type surface (documented, validated loudly): long/int/double/float/
  * boolean/string/bytes, each optionally nullable via `union[null, T]`.
  * Nested records/arrays/maps/decimals are refused at write AND read —
  * flatten first (the same contract the reference's landing CSVs obey).
  */
object AvroTable {

  private def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case dt => throw new IllegalArgumentException(
          s"AvroTable supports flat primitive columns only; " +
            s"column '${f.name}' is $dt — flatten or cast first")
      }
      if (f.nullable)
        fs.name(f.name).`type`(Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), base).asJava)).withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  private def fromAvroSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro type must be record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      def primitive(s: Schema): DataType = s.getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case t => throw new IllegalArgumentException(
          s"unsupported Avro type $t for field '${f.name}' — " +
            "AvroTable reads flat primitive records only")
      }
      f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          require(branches.size == 2 &&
            branches.exists(_.getType == Schema.Type.NULL),
            s"field '${f.name}': only union[null, T] supported")
          StructField(f.name,
            primitive(branches.find(_.getType != Schema.Type.NULL).get),
            nullable = true)
        case _ => StructField(f.name, primitive(f.schema()), nullable = false)
      }
    }.toArray)
  }

  /** One container file per partition under `dir` (cleared first). */
  def write(df: DataFrame, dir: String): Unit = {
    val out = Paths.get(dir)
    if (Files.exists(out)) {
      val s = Files.walk(out)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(Files.delete)
    }
    Files.createDirectories(out)
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema, "row").toString // Schema isn't serializable pre-1.9-style; ship JSON
    val dirStr = out.toAbsolutePath.toString
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      // task-commit protocol: write to an attempt-unique temp name and
      // rename into place only on success — a retried or speculative
      // attempt writing the final path directly would race the original
      // and could leave a torn container that only fails at read time
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val file = new File(dirStr, f".part-$pid%05d.avro.$attempt%d.tmp")
      writer.create(schema, file)
      var n = 0L
      rows.foreach { internal =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v =
            if (internal.isNullAt(i)) null
            else f.dataType match {
              case LongType => java.lang.Long.valueOf(internal.getLong(i))
              case IntegerType => java.lang.Integer.valueOf(internal.getInt(i))
              case DoubleType => java.lang.Double.valueOf(internal.getDouble(i))
              case FloatType => java.lang.Float.valueOf(internal.getFloat(i))
              case BooleanType => java.lang.Boolean.valueOf(internal.getBoolean(i))
              case StringType => internal.getUTF8String(i).toString
              case BinaryType => java.nio.ByteBuffer.wrap(internal.getBinary(i))
              case dt => throw new IllegalStateException(s"unreachable: $dt")
            }
          rec.put(f.name, v)
        }
        writer.append(rec); n += 1
      }
      writer.close()
      // POSIX rename: atomic publish; a losing/failed attempt's temp
      // file is simply never renamed — read() ignores it because it
      // filters on the `.avro` SUFFIX (the `.tmp` tail is the
      // load-bearing part of the temp name, not the dot prefix)
      Files.move(file.toPath, new File(dirStr, f"part-$pid%05d.avro").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Iterator.single(n)
    }.count() // action: materialize the write
    // orphan sweep: temp files from failed/lost task attempts would
    // otherwise accumulate full-size containers forever (the pre-write
    // cleanup above only runs on the NEXT write to this directory). By
    // now every task has committed or been cancelled, so anything still
    // wearing the .tmp suffix is garbage.
    Option(out.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".tmp"))
      .foreach(f => Files.deleteIfExists(f.toPath))
    ()
  }

  /** Read every `*.avro` container under `dir` as one DataFrame. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
      .map(_.getAbsolutePath).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    def writerSchema(path: String): Schema = {
      val r = new DataFileReader[GenericRecord](
        new File(path), new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    val first = writerSchema(files.head)
    val sparkSchema = fromAvroSchema(first)
    val mismatched = files.tail.filter(f => writerSchema(f) != first)
    require(mismatched.isEmpty,
      s"files with divergent schemas (vs ${files.head}): ${mismatched.mkString(", ")}")
    val schemaJson = first.toString
    val enc = RowEncoder.encoderFor(sparkSchema)
    import spark.implicits._
    spark.createDataset(files.toSeq)
      .repartition(math.min(files.length, spark.sparkContext.defaultParallelism))
      .mapPartitions { paths =>
        val schema = new Schema.Parser().parse(schemaJson)
        val fields = fromAvroSchema(schema).fields
        paths.flatMap { p =>
          val reader = new DataFileReader[GenericRecord](
            new File(p), new GenericDatumReader[GenericRecord](schema))
          // close on task completion too: an early-exit operator (limit)
          // or a mid-read exception abandons the iterator before the
          // drained-to-exhaustion close below ever runs — without this
          // the fd leaks for the executor's lifetime
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              scala.util.Try(reader.close())))
          // DataFileReader streams blocks lazily; drain it inside the
          // iterator so memory stays block-bounded
          new Iterator[Row] {
            // once exhausted the reader is CLOSED — a later hasNext
            // (consumers may legally probe repeatedly) must answer
            // false without touching the closed reader, whose
            // underlying stream can throw
            private var done = false
            def hasNext: Boolean = {
              if (done) false
              else {
                val h = reader.hasNext
                if (!h) { done = true; reader.close() }
                h
              }
            }
            def next(): Row = {
              val rec = reader.next()
              Row.fromSeq(fields.map { f =>
                rec.get(f.name) match {
                  case null => null
                  case u: org.apache.avro.util.Utf8 => u.toString
                  case bb: java.nio.ByteBuffer =>
                    val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                  case other => other
                }
              }.toSeq)
            }
          }
        }
      }(enc)
  }
}
