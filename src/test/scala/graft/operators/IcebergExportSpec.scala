package graft.operators

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replays the Iceberg export the way a stock reader would: version-hint
  * → metadata.json → snapshot's manifest list (Avro) → manifests (Avro)
  * → data files, checking spec conformance (field-ids, required
  * manifest metadata, v2 fields) and row identity with TableStore time
  * travel at every snapshot.
  */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def readAvro(path: String): (org.apache.avro.Schema, Seq[GenericRecord]) = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try (reader.getSchema, reader.iterator().asScala.toList)
    finally reader.close()
  }

  private def avroMeta(path: String, key: String): String = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try new String(reader.getMeta(key), "UTF-8") finally reader.close()
  }

  private def metadataJson(exportDir: String): org.apache.spark.sql.Row = {
    val hint = Files.readString(Paths.get(exportDir, "metadata", "version-hint.text")).trim
    spark.read.option("multiLine", true)
      .json(s"$exportDir/metadata/v$hint.metadata.json").head()
  }

  test("unpartitioned export: spec shape + row identity per snapshot") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ib-").toString)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    store.overwrite("t", Seq((5L, "e")).toDF("id", "v"))
    val out = IcebergExport.exportTable(store, "t",
      Files.createTempDirectory("graft-ibo-").toString).toString

    val md = metadataJson(out)
    assert(md.getAs[Long]("format-version") == 2L)
    assert(md.getAs[Long]("last-sequence-number") == 3L)
    val snaps = md.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("snapshots")
      .sortBy(_.getAs[Long]("sequence-number"))
    assert(snaps.size == store.versions("t").size)
    assert(md.getAs[Long]("current-snapshot-id") ==
      snaps.last.getAs[Long]("snapshot-id"))

    snaps.zip(store.versions("t")).foreach { case (snap, graftV) =>
      val (listSchema, manifests) = readAvro(snap.getAs[String]("manifest-list"))
      // spec field-ids on the manifest_file schema
      assert(listSchema.getField("manifest_path").getObjectProp("field-id") == 500)
      assert(listSchema.getField("manifest_length").getObjectProp("field-id") == 501)
      assert(listSchema.getField("content").getObjectProp("field-id") == 517)
      assert(manifests.nonEmpty)
      val rows = manifests.flatMap { mf =>
        val mPath = mf.get("manifest_path").toString
        assert(Files.size(Paths.get(mPath)) ==
          mf.get("manifest_length").asInstanceOf[Long])
        // required manifest key/value metadata
        assert(avroMeta(mPath, "format-version") == "2")
        assert(avroMeta(mPath, "content") == "data")
        assert(avroMeta(mPath, "schema").contains("\"type\": \"struct\""))
        val (eSchema, entries) = readAvro(mPath)
        val dfField = eSchema.getField("data_file")
        assert(dfField.getObjectProp("field-id") == 2)
        assert(dfField.schema().getField("file_path").getObjectProp("field-id") == 100)
        assert(dfField.schema().getField("record_count").getObjectProp("field-id") == 103)
        entries.map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          (df.get("file_path").toString, df.get("record_count").asInstanceOf[Long])
        }
      }
      val replayed = spark.read.parquet(rows.map(_._1): _*)
      assert(replayed.count() == rows.map(_._2).sum,
        "manifest record_count disagrees with parquet contents")
      val expected = store.read("t", graftV)
      assert(replayed.collect().map(_.toString).sorted.toSeq ==
        expected.collect().map(_.toString).sorted.toSeq,
        s"row mismatch at graft version $graftV")
    }
  }

  test("identity-partitioned export: spec fields + typed partition values in manifests") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ibp-").toString)
    store.overwrite("p",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.overwrite("p",
      Seq((3, 2024, "c"), (4, 2025, "d")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = IcebergExport.exportTable(store, "p",
      Files.createTempDirectory("graft-ibpo-").toString).toString

    val md = metadataJson(out)
    val specs = md.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("partition-specs")
    val fields = specs.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("fields")
    assert(fields.size == 1 && fields.head.getAs[String]("name") == "year"
      && fields.head.getAs[String]("transform") == "identity"
      && fields.head.getAs[Long]("field-id") == 1000L)

    val snaps = md.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("snapshots")
      .sortBy(_.getAs[Long]("sequence-number"))
    // latest snapshot: partition values in the manifest match the data
    val (_, manifests) = readAvro(snaps.last.getAs[String]("manifest-list"))
    val filesWithYear = manifests.flatMap { mf =>
      readAvro(mf.get("manifest_path").toString)._2.map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        (df.get("file_path").toString, part.get("year").asInstanceOf[Int])
      }
    }
    assert(filesWithYear.map(_._2).toSet == Set(2024, 2025))
    // reattach the partition value per manifest (data files omit it) and
    // compare against the live generation
    val replayed = filesWithYear.map { case (path, year) =>
      spark.read.parquet(path).withColumn("year", lit(year))
    }.reduce(_ unionByName _).select("id", "year", "v")
    val expected = store.read("p").select("id", "year", "v")
    assert(replayed.collect().map(_.toString).sorted.toSeq ==
      expected.collect().map(_.toString).sorted.toSeq)
  }

  test("non-primitive columns refused loudly") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ibn-").toString)
    store.overwrite("n", Seq((1L, Seq("a", "b"))).toDF("id", "arr"))
    val e = intercept[IllegalArgumentException] {
      IcebergExport.exportTable(store, "n",
        Files.createTempDirectory("graft-ibno-").toString)
    }
    assert(e.getMessage.contains("primitive"))
  }
}
