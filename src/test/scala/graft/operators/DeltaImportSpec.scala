package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.JavaConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DeltaImport against both our own export (round-trip) and handcrafted
  * stock logs (another engine's table: removes, checkpoint, cleaned-up
  * early JSON, refused v3 features).
  */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private def writeSingleParquet(df: DataFrame, target: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-di-part-")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("round-trip: import of our export equals TableStore time travel at every version") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dio-").toString)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    store.overwrite("t", Seq((5L, "e")).toDF("id", "v"))

    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-diox-").toString).toString
    val deltaVersions = DeltaImport.versions(out)
    assert(deltaVersions == store.versions("t").indices.map(_.toLong))

    deltaVersions.zip(store.versions("t")).foreach { case (dv, gv) =>
      val imported = DeltaImport.read(spark, out, Some(dv))
      assert(sortedRows(imported) == sortedRows(store.read("t", gv)),
        s"mismatch at delta version $dv / graft version $gv")
    }
    // default = latest
    assert(sortedRows(DeltaImport.read(spark, out)) ==
      sortedRows(store.read("t")))
  }

  test("partitioned round-trip reattaches partition columns with schema types") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dip-").toString)
    store.overwrite("p",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.overwrite("p",
      Seq((3, 2024, "c"), (4, 2025, "d")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))

    val out = DeltaExport.exportTable(store, "p",
      Files.createTempDirectory("graft-dipx-").toString).toString
    val imported = DeltaImport.read(spark, out)
    // partition column present, integer-typed (cast from partitionValues
    // strings per the table schema), and the rows match
    assert(imported.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(sortedRows(imported.select("id", "year", "v")) ==
      sortedRows(store.read("p").select("id", "year", "v")))
    // time travel to the first generation
    assert(sortedRows(DeltaImport.read(spark, out, Some(0L)).select("id", "year", "v")) ==
      sortedRows(store.read("p", store.versions("p").head).select("id", "year", "v")))
  }

  test("stock log: removes, checkpoint, cleaned-up early JSON") {
    val table = Files.createTempDirectory("graft-dis-")
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json
      .replace("\"", "\\\"")

    writeSingleParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      table.resolve("f0.parquet"))
    writeSingleParquet(Seq((3L, "c")).toDF("id", "v"),
      table.resolve("f1.parquet"))
    writeSingleParquet(Seq((4L, "d")).toDF("id", "v"),
      table.resolve("f2.parquet"))

    def commit(v: Long, lines: Seq[String]): Unit =
      Files.writeString(log.resolve(f"$v%020d.json"), lines.mkString("", "\n", "\n"))

    commit(0, Seq(
      """{"commitInfo":{"timestamp":1,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    commit(1, Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    commit(2, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":2,"dataChange":true}}"""))

    def ids(v: Long): Seq[Long] =
      DeltaImport.read(spark, table.toString, Some(v))
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids(0) == Seq(1L, 2L))
    assert(ids(1) == Seq(1L, 2L, 3L))
    assert(ids(2) == Seq(3L))

    // checkpoint at version 2 (state: f1 live) — written the way a stock
    // engine would: one parquet with one row per action
    val cpJson = Seq(
      s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":false}}""")
    val cpDf = spark.read.json(spark.createDataset(cpJson))
    writeSingleParquet(cpDf, log.resolve(f"${2L}%020d.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":2,"size":3}""")
    // simulate log cleanup: versions 0-2 JSON deleted
    (0L to 2L).foreach(v => Files.delete(log.resolve(f"$v%020d.json")))
    // a post-checkpoint commit
    commit(3, Seq(
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))

    assert(ids(2) == Seq(3L), "checkpoint-only read")
    assert(ids(3) == Seq(3L, 4L), "checkpoint + tail JSON read")
    assert(DeltaImport.versions(table.toString).max == 3L)
  }

  test("multi-part checkpoint: all parts read, state reconstructed") {
    val table = Files.createTempDirectory("graft-dimp-")
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json
      .replace("\"", "\\\"")

    writeSingleParquet(Seq((1L, "a")).toDF("id", "v"), table.resolve("f0.parquet"))
    writeSingleParquet(Seq((2L, "b")).toDF("id", "v"), table.resolve("f1.parquet"))

    // version-2 checkpoint split into two parts (the protocol's
    // NNNN.checkpoint.<part>.<of>.parquet naming), each carrying a
    // slice of the actions; no JSON predecessors at all
    val metaPart = Seq(
      s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000003","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":false}}""")
    val addPart = Seq(
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":false}}""")
    writeSingleParquet(spark.read.json(spark.createDataset(metaPart)),
      log.resolve(f"${2L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"))
    writeSingleParquet(spark.read.json(spark.createDataset(addPart)),
      log.resolve(f"${2L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"),
      """{"version":2,"size":4,"parts":2}""")

    val ids = DeltaImport.read(spark, table.toString, Some(2L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L), "multi-part checkpoint must union all parts")
  }

  test("refuses unsupported reader-v3 features and column-mapping ID mode loudly") {
    // name mode is READ since round 13; the refusal surface is now ID
    // mode (parquet field-id resolution) and any rv3 feature beyond
    // [deletionVectors, columnMapping]
    val schemaJson = Seq((1L, "x")).toDF("id", "v").schema.json
      .replace("\"", "\\\"")
    def forge(protocol: String, cmMode: String): String = {
      val table = Files.createTempDirectory("graft-dir3-")
      val log = table.resolve("_delta_log")
      Files.createDirectories(log)
      Files.writeString(log.resolve(f"${0L}%020d.json"), Seq(
        protocol,
        s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000002","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"$cmMode"},"createdTime":1}}""",
        """{"add":{"path":"f0.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
      table.toString
    }
    val e1 = intercept[IllegalArgumentException] {
      DeltaImport.read(spark, forge(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
        "none"))
    }
    assert(e1.getMessage.contains("v2Checkpoint"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.read(spark, forge(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""", "id"))
    }
    assert(e2.getMessage.contains("column mapping mode 'id'"))
  }

  test("appendDeletionVectors: partitioned table, two sequential DV commits") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dvw-").toString)
    store.overwrite("t",
      (1L to 30L).map(i => (i, 2000 + (i % 2).toInt, s"v$i")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-dvwo-").toString).toString
    val root = Paths.get(out).toAbsolutePath.normalize.toString

    def positionsOf(pred: org.apache.spark.sql.Column) =
      spark.read.parquet(s"$out/gen-*")
        .select(col("id"),
          regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/").as("f"),
          expr("_metadata.row_index").as("p"))
        .filter(pred).collect()
        .groupBy(_.getString(1)).toSeq
        .map { case (f, rs) => f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq }

    // commit 1: delete id % 5 == 0; commit 2: delete id % 7 == 0 over
    // the SAME files — the writer must MERGE each touched file's
    // existing bitmap into the new one (ADVICE r12: the old writer
    // replaced the descriptor outright, resurrecting the %5 rows)
    val first = positionsOf(col("id") % 5 === 0)
    DeltaExport.appendDeletionVectors(out, first)
    val second = positionsOf(col("id") % 7 === 0 && col("id") % 5 =!= 0)
    DeltaExport.appendDeletionVectors(out, second)

    val served = DeltaImport.read(spark, out)
    assert(served.filter(col("id") % 5 === 0 || col("id") % 7 === 0).count() == 0)
    assert(served.count() ==
      (1L to 30L).count(i => i % 5 != 0 && i % 7 != 0))
    // partition column survives the DV anti-join
    assert(served.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // pre-delete version intact
    val v0 = DeltaImport.versions(out).head
    assert(DeltaImport.read(spark, out, Some(v0)).count() == 30)

    // the protocol upgrade UNIONS the legacy-implied writer features
    // (minWriterVersion 2 → appendOnly, invariants) with deletionVectors
    // instead of clobbering them (ADVICE r12)
    val lastCommit = Files.readAllLines(Paths.get(out, "_delta_log")
      .toFile.listFiles().map(_.toPath).filter(_.toString.endsWith(".json"))
      .maxBy(_.getFileName.toString)).asScala.mkString("\n")
    for (feat <- Seq("appendOnly", "invariants", "deletionVectors"))
      assert(lastCommit.contains("\"" + feat + "\""),
        s"protocol lost feature $feat: $lastCommit")

    // deleting from a path that is not a live add refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaExport.appendDeletionVectors(out, Seq("no/such/file.parquet" -> Seq(0L)))
    }
    assert(e.getMessage.contains("not a live add"))
  }

  test("checkpoint: partitioned + DV table reads back from the checkpoint alone") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cpw-").toString)
    store.overwrite("t",
      (1L to 40L).map(i => (i, 2000 + (i % 3).toInt, s"v$i")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-cpwo-").toString).toString
    val root = Paths.get(out).toAbsolutePath.normalize.toString
    val doomed = spark.read.parquet(s"$out/gen-*")
      .select(col("id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/").as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("id") % 4 === 1).collect()
      .groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq }
    DeltaExport.appendDeletionVectors(out, doomed)

    // single-part checkpoint at the DV commit, then burn the JSON history
    DeltaExport.writeCheckpoint(spark, out, version = 1L)
    val logDir = Paths.get(out, "_delta_log")
    Seq(0L, 1L).foreach(v => Files.delete(logDir.resolve(f"$v%020d.json")))
    assert(Files.exists(logDir.resolve("_last_checkpoint")))

    val served = DeltaImport.read(spark, out)
    assert(served.filter(col("id") % 4 === 1).count() == 0)
    assert(served.count() == (1L to 40L).count(_ % 4 != 1))
    // partition column type + values come from the checkpoint's
    // metaData/partitionValues, not the data files
    assert(served.schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(served.select("year").distinct().count() == 3)
  }

  test("column mapping name mode survives a column RENAME (logical differs from history)") {
    // the point of name mode: renaming a column only rewrites the
    // schemaString's logical name — the parquet files keep the original
    // physical name. A reader resolving by CURRENT logical name against
    // the file would null-fill; physical resolution reads the data.
    val dir = Files.createTempDirectory("graft-cmr-")
    val table = dir.resolve("t")
    Files.createDirectories(table.resolve("_delta_log"))
    writeSingleParquet(
      Seq((1L, 10L), (2L, 20L)).toDF("col-a", "col-b"),
      table.resolve("part-0.parquet"))
    val schema =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-a"}},
        |{"name":"renamed_chars","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-b"}}
        |]}""".stripMargin.replace("\n", "")
    val esc = schema.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(table.resolve("_delta_log").resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |{"add":{"path":"part-0.parquet","partitionValues":{},"size":${Files.size(table.resolve("part-0.parquet"))},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    val df = DeltaImport.read(spark, table.toString)
    assert(df.columns.toSeq == Seq("id", "renamed_chars"))
    assert(df.as[(Long, Long)].collect().sorted.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("column mapping survives the checkpoint path (configuration + field metadata)") {
    // a checkpoint that dropped metaData.configuration (or the
    // schemaString's physicalName metadata) would make a
    // checkpoint-floored read resolve cm=none and serve PHYSICAL
    // col-* names — silently. Pin the full lifecycle: forge cm table →
    // checkpoint → delete JSON history → read from checkpoint alone.
    val dir = Files.createTempDirectory("graft-cmcp-")
    val table = dir.resolve("t")
    Files.createDirectories(table.resolve("_delta_log"))
    writeSingleParquet(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("col-a", "col-b"),
      table.resolve("part-0.parquet"))
    val schema =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-a"}},
        |{"name":"n","type":"long","nullable":true,"metadata":
        |  {"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-b"}}
        |]}""".stripMargin.replace("\n", "")
    val esc = schema.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(table.resolve("_delta_log").resolve(f"${0L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}
         |{"add":{"path":"part-0.parquet","partitionValues":{},"size":${Files.size(table.resolve("part-0.parquet"))},"modificationTime":0,"dataChange":true}}
         |""".stripMargin)
    DeltaExport.writeCheckpoint(spark, table.toString, version = 0L)
    Files.delete(table.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    val df = DeltaImport.read(spark, table.toString)
    assert(df.columns.toSeq == Seq("id", "n"),
      s"checkpoint lost the column mapping: ${df.columns.mkString(",")}")
    assert(df.as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("readChanges: a DV shrink (restore) emits the uncovered rows as inserts; refusals") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cdf-").toString)
    store.overwrite("t", (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-cdfo-").toString).toString
    val root = Paths.get(out).toAbsolutePath.normalize.toString
    val targets = spark.read.parquet(s"$out/gen-*")
      .select(col("id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/").as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("id") % 5 === 0)
      .collect().groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq }
    DeltaExport.appendDeletionVectors(out, targets)

    // forge v2: remove + re-add every DV-bearing file WITHOUT its DV —
    // the RESTORE shape; readChanges must emit exactly the previously
    // covered rows as inserts
    val dvPaths = targets.map(_._1).toSet
    val logDir = Paths.get(out, "_delta_log")
    val v1Lines = Files.readAllLines(logDir.resolve(f"${1L}%020d.json")).asScala
    val readds = v1Lines.filter(l => l.contains("\"add\"") &&
      dvPaths.exists(p => l.contains(s""""path":"$p"""")))
      // the DV object is the add's LAST field and z85 pathOrInlineDv may
      // contain literal '}' (hit: "ObAF^3}9)=…"), so a [^}]* strip can
      // truncate mid-blob and corrupt the line — anchor to the tail
      .map(_.replaceAll(""","deletionVector":\{.*\}\}\}\s*$""", "}}"))
    assert(readds.nonEmpty && !readds.exists(_.contains("deletionVector")))
    val removes = dvPaths.toSeq.sorted.map(p =>
      s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":true}}""")
    Files.writeString(logDir.resolve(f"${2L}%020d.json"),
      (removes ++ readds).mkString("", "\n", "\n"))
    val restored = DeltaImport.readChanges(spark, out, 1L, 2L)
    assert(restored.filter(col("_change_type") === "insert").count() == 4)
    assert(restored.count() == 4)
    assert(restored.select("id").as[Long].collect().sorted.toSeq ==
      Seq(5L, 10L, 15L, 20L))
    assert(DeltaImport.read(spark, out).count() == 20) // the restore took

    // cdc actions refuse (a writer-provided change feed we don't read)
    Files.writeString(logDir.resolve(f"${3L}%020d.json"),
      """{"cdc":{"path":"_change_data/x.parquet","partitionValues":{},"size":1,"dataChange":false}}""" + "\n")
    val e1 = intercept[IllegalArgumentException] {
      DeltaImport.readChanges(spark, out, 1L, 3L)
    }
    assert(e1.getMessage.contains("cdc"))
    Files.delete(logDir.resolve(f"${3L}%020d.json"))

    // checkpoint-collapsed history refuses per-commit derivation
    DeltaExport.writeCheckpoint(spark, out, version = 2L)
    Files.delete(logDir.resolve(f"${1L}%020d.json"))
    val e2 = intercept[IllegalArgumentException] {
      DeltaImport.readChanges(spark, out, 0L, 2L)
    }
    assert(e2.getMessage.contains("no JSON commit"))
  }

  test("readChanges: dataChange=false (OPTIMIZE) commits emit nothing but apply to state") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cdc0-").toString)
    store.overwrite("t", (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-cdc0o-").toString).toString
    val logDir = Paths.get(out, "_delta_log")
    val root = Paths.get(out).toAbsolutePath.normalize.toString
    val liveFiles = DeltaImport.read(spark, out)
      .select(regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/")
        .as("f")).distinct().as[String].collect().toSeq
      .map(_.stripPrefix(root + "/")).sorted
    // v1: compaction — remove every live file, add one merged file, ALL
    // with dataChange:false (the stock OPTIMIZE shape)
    writeSingleParquet(DeltaImport.read(spark, out),
      Paths.get(out, "compact-0.parquet"))
    Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      (liveFiles.map(p =>
        s"""{"remove":{"path":"$p","deletionTimestamp":0,"dataChange":false}}""") :+
        s"""{"add":{"path":"compact-0.parquet","partitionValues":{},"size":${
          Files.size(Paths.get(out, "compact-0.parquet"))},"modificationTime":0,"dataChange":false}}""")
        .mkString("", "\n", "\n"))
    assert(DeltaImport.read(spark, out).count() == 20) // compaction took
    assert(DeltaImport.readChanges(spark, out, 0L, 1L).count() == 0,
      "an OPTIMIZE commit leaked into the change feed")
    // v2: a REAL delete of the merged file — the state replay must know
    // the compacted file (applied from the dataChange=false add) to
    // serve its rows as deletes
    Files.writeString(logDir.resolve(f"${2L}%020d.json"),
      """{"remove":{"path":"compact-0.parquet","deletionTimestamp":0,"dataChange":true}}""" + "\n")
    val ch = DeltaImport.readChanges(spark, out, 0L, 2L)
    assert(ch.count() == 20)
    assert(ch.filter(col("_change_type") === "delete").count() == 20)
    assert(ch.select("_commit_version").distinct().as[Long].collect().toSeq == Seq(2L))
  }

  test("a multi-part checkpoint with a missing part refuses loudly") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cpp-").toString)
    store.overwrite("t", (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-cppo-").toString).toString
    DeltaExport.writeCheckpoint(spark, out, version = 0L, parts = 2)
    val logDir = Paths.get(out, "_delta_log")
    Files.delete(logDir.resolve(f"${0L}%020d.json"))
    // intact: reads fine through both parts
    assert(DeltaImport.read(spark, out).count() == 20)
    // drop part 2 of 2 → a silent read would serve roughly half the
    // adds; the reader must refuse instead
    Files.delete(logDir.resolve(
      f"${0L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.read(spark, out).count()
    }
    assert(e.getMessage.contains("incomplete"))
  }
}
