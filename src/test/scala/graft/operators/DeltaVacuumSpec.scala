package graft.operators

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The corners the `s62_delta_vacuum` gate doesn't exercise: untracked
  * orphans (mtime clock), the keep-set under a purge (REORG leaves the
  * old DV-bearing files tombstoned), and log immunity.
  */
class DeltaVacuumSpec extends SparkSpec {
  import spark.implicits._

  private def export2gen(): (String, TableStore) = {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dv-").toString)
    store.overwrite("t", (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    store.overwrite("t", (1L to 40L).filter(_ % 2 == 0).map(i => (i, s"v$i")).toDF("id", "v"))
    (DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-dvx-").toString).toString, store)
  }

  private def regularFiles(root: String): Seq[String] = {
    val w = Files.walk(Paths.get(root))
    try w.iterator().asScala.filter(Files.isRegularFile(_))
      .map(p => Paths.get(root).relativize(p).toString).toList
    finally w.close()
  }

  test("untracked orphans go by file mtime; fresh ones survive the window") {
    val (out, _) = export2gen()
    val orphan = Paths.get(out, "gen-v00001", "orphan-crashed-writer.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val now = System.currentTimeMillis()
    // orphan mtime ~now: a 1h-retention vacuum keeps it (and the fresh
    // tombstones); only the far-future clock collects everything
    DeltaVacuum.vacuum(out, 3600L * 1000, now)
    assert(Files.exists(orphan), "fresh orphan collected inside the window")
    val n = DeltaVacuum.vacuum(out, 0L, now + 60000)
    assert(!Files.exists(orphan), "expired orphan survived")
    // gen-0 files + the orphan are gone; live gen-1 files remain
    assert(n >= 2)
    assert(regularFiles(out).filterNot(_.startsWith("_delta_log"))
      .forall(_.startsWith("gen-v00001")))
    assert(DeltaImport.read(spark, out).count() == 20)
  }

  test("after a DV purge, vacuum collects the replaced files but never the replacements") {
    val (out, _) = export2gen()
    // DV-delete ids % 10 == 0 from the live generation, then REORG-purge
    val root = Paths.get(out).toAbsolutePath.normalize.toString
    val targets = spark.read.parquet(s"$out/gen-v00001")
      .select(col("id"),
        regexp_replace(url_decode(expr("_metadata.file_path")), "^file:/*", "/").as("f"),
        expr("_metadata.row_index").as("p"))
      .filter(col("id") % 10 === 0)
      .collect().groupBy(_.getString(1)).toSeq
      .map { case (f, rs) => f.stripPrefix(root + "/") -> rs.map(_.getLong(2)).toSeq }
    DeltaExport.appendDeletionVectors(out, targets)
    assert(DeltaReorg.purge(spark, out) == targets.size)
    val before = DeltaImport.read(spark, out).as[(Long, String)].collect().sorted
    DeltaVacuum.vacuum(out, 0L, System.currentTimeMillis() + 60000)
    // the purge's rewritten files are live and must read identically;
    // the pre-purge DV file is unreferenced now and must be gone
    val after = DeltaImport.read(spark, out).as[(Long, String)].collect().sorted
    assert(after.toSeq == before.toSeq)
    assert(!regularFiles(out).exists(_.startsWith("deletion_vector_")),
      "orphaned DV file survived a retention-0 vacuum")
    assert(after.length == 16 && !after.exists(_._1 % 10 == 0))
  }

  test("partitioned layout: old generation collected, empty partition dirs pruned") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-dvp-").toString)
    store.overwrite("t",
      (1L to 30L).map(i => (i, 2000 + (i % 3).toInt, s"v$i")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.overwrite("t",
      (1L to 30L).filter(_ % 2 == 0)
        .map(i => (i, 2000 + ((i / 2) % 2).toInt, s"v$i")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val out = DeltaExport.exportTable(store, "t",
      Files.createTempDirectory("graft-dvpo-").toString).toString
    val n = DeltaVacuum.vacuum(out, 0L, System.currentTimeMillis() + 60000)
    assert(n > 0)
    // gen-0's partition tree is gone entirely — files AND the now-empty
    // year=... / gen dirs; the live generation still reads with its
    // partition values intact
    assert(!Files.exists(Paths.get(out, "gen-v00000")))
    val df = DeltaImport.read(spark, out)
    assert(df.count() == 15)
    assert(df.select("year").distinct().count() == 2)
  }

  test("the log directory is immune at any retention") {
    val (out, _) = export2gen()
    val logBefore = regularFiles(out).filter(_.startsWith("_delta_log")).sorted
    DeltaVacuum.vacuum(out, 0L, System.currentTimeMillis() + 60000)
    assert(regularFiles(out).filter(_.startsWith("_delta_log")).sorted == logBefore)
  }
}
