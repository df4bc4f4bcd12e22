package graft.operators

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Replays the exported Delta log the way a stock Delta reader would —
  * JSON actions in commit order, add/remove file-set reconstruction —
  * and checks every commit serves exactly the rows of the corresponding
  * TableStore generation.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._
  // minimal single-line JSON field extractor for the replay (the log is
  // engine-written, one action per line)
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def strField(line: String, field: String): Option[String] =
    ("\"" + field + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(line).map(m => unescape(m.group(1)))

  private case class Commit(adds: Seq[String], removes: Seq[String],
      hasProtocol: Boolean, hasMetaData: Boolean, schemaJson: Option[String])

  private def readLog(exportDir: String): Seq[Commit] = {
    val logDir = Paths.get(exportDir, "_delta_log")
    val commits = Files.list(logDir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".json")).sortBy(_.getFileName.toString)
    // Delta requires contiguous versions from 0
    assert(commits.zipWithIndex.forall { case (p, i) =>
      p.getFileName.toString == f"$i%020d.json"
    }, s"non-contiguous commit files: ${commits.map(_.getFileName)}")
    commits.map { p =>
      val lines = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      Commit(
        adds = lines.filter(_.startsWith("{\"add\":"))
          .flatMap(strField(_, "path")),
        removes = lines.filter(_.startsWith("{\"remove\":"))
          .flatMap(strField(_, "path")),
        hasProtocol = lines.exists(_.startsWith("{\"protocol\":")),
        hasMetaData = lines.exists(_.startsWith("{\"metaData\":")),
        schemaJson = lines.find(_.startsWith("{\"metaData\":"))
          .flatMap(strField(_, "schemaString")))
    }
  }

  test("export replays row-identical to TableStore time travel") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dx-").toString)
    store.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("id", "v"))
    store.overwrite("t", Seq((5L, "e")).toDF("id", "v"))

    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-dxo-").toString).toString
    val commits = readLog(out)
    assert(commits.size == store.versions("t").size)
    assert(commits.head.hasProtocol && commits.head.hasMetaData)

    // replay: live file set after commit k = adds - removes, in order
    var live = Set.empty[String]
    commits.zip(store.versions("t")).foreach { case (c, graftV) =>
      c.removes.foreach { r =>
        assert(live.contains(r), s"remove of non-live file $r")
        live -= r
      }
      c.adds.foreach { a =>
        assert(!live.contains(a), s"double add of $a")
        live += a
      }
      val files = live.toSeq.map(rel => s"$out/$rel")
      files.foreach(f => assert(Files.exists(Paths.get(f)), s"missing $f"))
      val replayed = spark.read.parquet(files: _*).select("id", "v")
      val expected = store.read("t", graftV).select("id", "v")
      assert(replayed.except(expected).count() == 0
        && expected.except(replayed).count() == 0,
        s"row mismatch at graft version $graftV")
    }
  }

  test("partitioned export carries partitionValues and replays per version") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dxp-").toString)
    store.overwrite("p",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.overwrite("p",
      Seq((3, 2024, "c"), (4, 2025, "d")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))

    val out = DeltaExport.exportTable(store, "p",
      Files.createTempDirectory("graft-dxpo-").toString).toString
    val commits = readLog(out)
    // every add under a year= dir must carry the partition value
    val logText = Files.list(Paths.get(out, "_delta_log")).iterator().asScala
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap(p => Files.readAllLines(p).asScala).mkString("\n")
    assert(logText.contains(""""partitionValues":{"year":"2023"}"""))
    assert(logText.contains(""""partitionValues":{"year":"2024"}"""))
    // schemaString present and includes the partition column
    assert(commits.head.schemaJson.exists(_.contains("year")))

    var live = Set.empty[String]
    commits.zip(store.versions("p")).foreach { case (c, graftV) =>
      live = live -- c.removes ++ c.adds
      // read with partition discovery relative to a synthetic base: read
      // files directly and recover year from the path via Delta's
      // partitionValues instead — here simply compare non-partition cols
      val replayed = spark.read.parquet(live.toSeq.map(rel => s"$out/$rel"): _*)
        .select("id", "v")
      val expected = store.read("p", graftV).select("id", "v")
      assert(replayed.except(expected).count() == 0
        && expected.except(replayed).count() == 0,
        s"row mismatch at graft version $graftV")
    }
  }

  test("partition-evolved history exports per-generation metaData (DeltaImport replays both layouts)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dxe-").toString)
    // generation 0: FLAT layout
    store.overwrite("e", Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"))
    // generation 1: evolved to year= partitions
    store.evolvePartitioning("e", Seq("year"))
    val out = DeltaExport.exportTable(store, "e",
      Files.createTempDirectory("graft-dxeo-").toString).toString
    // VERSION AS OF 0 must read the flat generation with year as a DATA
    // column (metaData for commit 0 declares no partition columns)
    val v0 = DeltaImport.read(spark, out, Some(0L))
      .select("id", "year", "v").as[(Int, Int, String)].collect().sorted.toSeq
    assert(v0 === Seq((1, 2023, "a"), (2, 2024, "b")))
    // latest reads the partitioned layout with year reattached
    val v1 = DeltaImport.read(spark, out)
      .select("id", "year", "v").as[(Int, Int, String)].collect().sorted.toSeq
    assert(v1 === v0)
  }

  test("export survives source vacuum (hardlinked files remain readable)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dxv-").toString)
    (1 to 4).foreach(i =>
      store.overwrite("t", Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-dxvo-").toString).toString
    val commits = readLog(out)
    store.vacuumVersions("t", keep = 0)
    // all exported generations still read
    var live = Set.empty[String]
    commits.foreach { c => live = live -- c.removes ++ c.adds }
    assert(spark.read.parquet(live.toSeq.map(rel => s"$out/$rel"): _*)
      .count() == 1)
    // and the first commit's file set still reads the first generation
    val firstFiles = commits.head.adds.map(rel => s"$out/$rel")
    assert(spark.read.parquet(firstFiles: _*).as[(Long, String)]
      .collect().toSeq.map(_._1) == Seq(1L))
  }
}
