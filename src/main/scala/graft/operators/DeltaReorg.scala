package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `REORG TABLE ... APPLY (PURGE)` analog for the deletion-vector era
  * (VERDICT r12 item 4): [[DeltaExport.appendDeletionVectors]] deletes
  * rows WITHOUT rewriting data files — the right trade at delete time,
  * but every subsequent read pays the DV anti-join, and a file that is
  * 90% deleted still ships 100% of its bytes. `purge` materializes the
  * soft deletes back into clean files: each live add carrying a DV is
  * rewritten minus its deleted positions and committed as
  * `remove(old) + add(new, no DV)` — logically a no-op (read-equivalent
  * before and after, pinned by the `s56_dv_reorg` gate), physically the
  * compaction step of the delete lifecycle.
  *
  * Scale posture: the rewrite is per-file and distributed (each file's
  * scan + anti-join runs as its own Spark job over that file's rows
  * only); the driver holds just the file list and DV descriptors —
  * O(DV-bearing files), the same state a table-format engine's REORG
  * planner holds. Files without DVs are untouched, byte for byte.
  *
  * The commit preserves the table's protocol (features were unioned in
  * by the DELETE commit and stay — readers that tolerated DVs tolerate
  * their absence). Partition values carry over from the old add
  * verbatim, and the new file lands in the same partition directory.
  */
object DeltaReorg {

  /** Rewrites every DV-bearing live file of the Delta table at
    * `tablePath`; returns the number of files purged (0 = nothing to
    * do, no commit written).
    */
  def purge(spark: SparkSession, tablePath: String): Int = {
    val out = Paths.get(tablePath).toAbsolutePath.normalize
    val (liveAdds, _, maxVersion) = DeltaLogReplay.replay(out)
    val targets = liveAdds.values.filter(_.dv.isDefined).toSeq.sortBy(_.path)
    if (targets.isEmpty) return 0
    val ts = System.currentTimeMillis()
    val actions = Seq.newBuilder[String]
    actions += s"""{"commitInfo":{"timestamp":$ts,"operation":"REORG","operationParameters":{"applyPurge":"true"},"engineInfo":"graft"}}"""
    targets.foreach { t =>
      val d = t.dv.get
      val srcFile = out.resolve(t.path)
      require(Files.isRegularFile(srcFile), s"missing data file: ${t.path}")
      // rewrite this ONE file minus its deleted row positions — the
      // anti-join key is the scan-time row index, exactly the coordinate
      // the DV addresses (same join DeltaImport serves reads with). The
      // bitmap decodes in an EXECUTOR task from its descriptor, like
      // DeltaImport's read path — positions never sit on the driver.
      import spark.implicits._
      val tableRoot = out.toString
      val posDf = Seq((d.storageType, d.pathOrInlineDv, d.offset,
          d.sizeInBytes, d.cardinality))
        .toDS()
        .flatMap { case (st, p, off, sz, card) =>
          DeletionVectors.load(tableRoot, st, p, off, sz, card)
        }
        .toDF("__pos")
      val kept = spark.read.parquet(srcFile.toString)
        .withColumn("__pos", col("_metadata.row_index"))
        .join(posDf, Seq("__pos"), "left_anti")
        .drop("__pos")
      val tmp = Files.createTempDirectory(out, ".reorg-tmp-")
      // written BEFORE the commit references it: a crash here leaves an
      // orphan temp dir, never a commit pointing at a missing file
      kept.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val s = Files.list(tmp)
        try s.iterator().asScala
          .find(p => p.getFileName.toString.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"rewrite of ${t.path} produced no parquet part"))
        finally s.close()
      }
      val parentRel = Option(Paths.get(t.path).getParent)
        .map(_.toString + "/").getOrElse("")
      val newRel = s"${parentRel}part-reorg-${UUID.randomUUID()}.parquet"
      val dst = out.resolve(newRel)
      Files.createDirectories(dst.getParent)
      Files.move(part, dst)
      val walk = Files.walk(tmp)
      val leftover = try walk.iterator().asScala.toSeq finally walk.close()
      leftover.reverse.foreach(p => Files.deleteIfExists(p))
      actions += s"""{"remove":{"path":${jsonStr(t.path)},"deletionTimestamp":$ts,"dataChange":false}}"""
      actions += s"""{"add":{"path":${jsonStr(newRel)},""" +
        s""""partitionValues":${t.partitionValuesJson},""" +
        s""""size":${Files.size(dst)},"modificationTime":${
          Files.getLastModifiedTime(dst).toMillis},"dataChange":false}}"""
    }
    Files.writeString(
      out.resolve("_delta_log").resolve(f"${maxVersion + 1}%020d.json"),
      actions.result().mkString("", "\n", "\n"))
    targets.size
  }

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
