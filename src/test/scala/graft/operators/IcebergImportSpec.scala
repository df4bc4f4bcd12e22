package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Round trip through the Iceberg v2 protocol: export → import must be
  * observationally invisible at every snapshot, including typed
  * partition reattachment and snapshot-id time travel.
  */
class IcebergImportSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("unpartitioned round trip at every snapshot") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ii-").toString)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "v"))
    store.overwrite("t", Seq((6L, "f")).toDF("id", "v"))
    val out = IcebergExport.exportTable(store, "t",
      Files.createTempDirectory("graft-iio-").toString).toString

    val snaps = IcebergImport.snapshots(spark, out)
    assert(snaps.map(_._2) == Seq(1L, 2L, 3L))
    snaps.map(_._1).zip(store.versions("t")).foreach { case (snapId, graftV) =>
      assert(sortedRows(IcebergImport.read(spark, out, Some(snapId))) ==
        sortedRows(store.read("t", graftV)),
        s"mismatch at snapshot $snapId / graft version $graftV")
    }
    assert(sortedRows(IcebergImport.read(spark, out)) ==
      sortedRows(store.read("t")))
  }

  test("partitioned round trip: typed partition columns, time travel") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-iip-").toString)
    store.overwrite("p",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.overwrite("p",
      Seq((3, 2024, "c"), (4, 2025, "d")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = IcebergExport.exportTable(store, "p",
      Files.createTempDirectory("graft-iipo-").toString).toString

    val imported = IcebergImport.read(spark, out)
    assert(imported.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(sortedRows(imported.select("id", "year", "v")) ==
      sortedRows(store.read("p").select("id", "year", "v")))
    val firstSnap = IcebergImport.snapshots(spark, out).head._1
    assert(sortedRows(IcebergImport.read(spark, out, Some(firstSnap))
        .select("id", "year", "v")) ==
      sortedRows(store.read("p", store.versions("p").head).select("id", "year", "v")))
  }

  test("DELETED manifest entries (status=2) drop out of the snapshot") {
    // handcraft a foreign manifest: re-use an export, then append a
    // second manifest whose only entry is a DELETED tombstone for one
    // of the live files — a stock compaction writes exactly this
    val store = new TableStore(spark, Files.createTempDirectory("graft-iid-").toString)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), numFiles = 2)
    val out = IcebergExport.exportTable(store, "t",
      Files.createTempDirectory("graft-iido-").toString).toString

    val snaps = IcebergImport.snapshots(spark, out)
    val before = IcebergImport.read(spark, out).select("id").as[Long].collect().sorted
    assert(before.sameElements(Array(1L, 2L)))

    // rewrite the snapshot's manifest: flip one entry's status to 2
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    import scala.collection.JavaConverters._
    val md = spark.read.option("multiLine", true)
      .json(s"$out/metadata/v1.metadata.json").head()
    val listPath = md.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("snapshots")
      .head.getAs[String]("manifest-list")
    val mfReader = new DataFileReader[GenericRecord](
      new java.io.File(listPath), new GenericDatumReader[GenericRecord]())
    val mPath = mfReader.iterator().asScala.toList.head.get("manifest_path").toString
    mfReader.close()
    val eReader = new DataFileReader[GenericRecord](
      new java.io.File(mPath), new GenericDatumReader[GenericRecord]())
    val schema = eReader.getSchema
    val entries = eReader.iterator().asScala.toList
    val metaKeys = Seq("schema", "partition-spec", "partition-spec-id",
      "format-version", "content")
      .map(k => k -> new String(eReader.getMeta(k), "UTF-8"))
    eReader.close()
    assert(entries.size == 2)
    entries.head.put("status", 2) // DELETED
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    metaKeys.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, new java.io.File(mPath))
    entries.foreach(w.append)
    w.close()

    val after = IcebergImport.read(spark, out).select("id").as[Long].collect().sorted
    val deletedFile = entries.head.get("data_file")
      .asInstanceOf[GenericRecord].get("file_path").toString
    val survivorIds = spark.read.parquet(
        entries(1).get("data_file").asInstanceOf[GenericRecord].get("file_path").toString)
      .select("id").as[Long].collect().sorted
    assert(after.sameElements(survivorIds),
      s"DELETED entry $deletedFile still served: ${after.toSeq}")
  }

  test("unknown snapshot id and non-iceberg paths refused loudly") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-iir-").toString)
    store.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    val out = IcebergExport.exportTable(store, "t",
      Files.createTempDirectory("graft-iiro-").toString).toString
    intercept[IllegalArgumentException] {
      IcebergImport.read(spark, out, Some(123456789L))
    }
    intercept[IllegalArgumentException] {
      IcebergImport.read(spark, Files.createTempDirectory("graft-nope-").toString)
    }
  }

  test("position deletes: applied at the new snapshot, invisible to the old (MOR)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-imor-").toString)
    store.overwrite("m",
      (1L to 40L).map(i => (i, 2000 + (i % 2).toInt, s"v$i"))
        .toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = IcebergExport.exportTable(store, "m",
      Files.createTempDirectory("graft-imoro-").toString).toString

    // delete every id % 5 == 0 row by (file, position)
    import org.apache.spark.sql.functions._
    val pos = spark.read.parquet(s"$out/data/*")
      .select(col("id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/").as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("id") % 5 === 0).collect()
    assert(pos.nonEmpty)
    val byFile = pos.groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f -> rs.map(_.getLong(2)).toSeq }
    IcebergExport.appendPositionDeletes(spark, out, byFile)

    // new snapshot: deleted rows gone, partition column still typed
    val served = IcebergImport.read(spark, out)
    assert(served.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(served.filter(col("id") % 5 === 0).count() == 0)
    assert(served.count() == 32)
    assert(sortedRows(served.select("id", "year", "v")) ==
      sortedRows(store.read("m").filter(col("id") % 5 =!= 0)
        .select("id", "year", "v")))
    // old snapshot: untouched (time travel across a MOR delete)
    val first = IcebergImport.snapshots(spark, out).minBy(_._2)._1
    assert(IcebergImport.read(spark, out, Some(first)).count() == 40)
  }

  test("equality deletes: null-safe key matching, old snapshot untouched") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ieq-").toString)
    store.overwrite("e",
      Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
        (4L, Option("b")), (5L, Option.empty[String]), (6L, Option("c")))
        .toDF("id", "v"))
    val out = IcebergExport.exportTable(store, "e",
      Files.createTempDirectory("graft-ieqo-").toString).toString

    // delete keys: v = 'b' and v IS NULL — the null key must match the
    // null rows (null-safe equality), not silently match nothing
    IcebergExport.appendEqualityDeletes(spark, out,
      Seq(Option("b"), Option.empty[String]).toDF("v"), Seq("v"))

    import org.apache.spark.sql.functions._
    val served = IcebergImport.read(spark, out)
    assert(sortedRows(served.select("id")) == Seq("[1]", "[6]"))
    val first = IcebergImport.snapshots(spark, out).minBy(_._2)._1
    assert(IcebergImport.read(spark, out, Some(first)).count() == 6)
  }
}
