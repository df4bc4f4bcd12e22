package graft.operators

import java.nio.file.{Files, Path, Paths}

import scala.collection.JavaConverters._

/** Delta VACUUM — physically delete data files the table no longer
  * references, honoring the tombstone retention window (stock Delta's
  * `VACUUM t RETAIN n HOURS`). The metadata-retention twin of
  * [[IcebergExport.expireSnapshots]] (gate `s59`), on the Delta side
  * (gate `s62_delta_vacuum`); together with the checkpoint-floored read
  * (`s55`) this closes the Delta storage-lifecycle loop: checkpoint →
  * drop old JSON → vacuum old data.
  *
  * Semantics (PROTOCOL.md `remove` actions + stock behavior):
  *   - a file named by any LIVE add — or a live add's deletion-vector
  *     file — is NEVER deleted, at any retention;
  *   - a tombstoned file (named by a `remove`) is deleted once its
  *     `deletionTimestamp` is older than `now - retentionMillis`;
  *   - an untracked file (present on disk, never named in the log —
  *     e.g. a crashed writer's orphan) falls back to its filesystem
  *     mtime against the same cutoff, as stock VACUUM does;
  *   - `_delta_log` (JSON commits, checkpoints, `_last_checkpoint`) is
  *     never touched — log retention is the CHECKPOINT lifecycle
  *     (`s55`), not VACUUM's.
  *
  * `nowMillis` is a parameter (not the wall clock) so callers — and the
  * oracle gates — can pin the window deterministically. Driver-side
  * metadata walk + filesystem deletes, same posture as the log replay
  * it builds on; the file listing is table-directory-sized, not
  * data-sized.
  *
  * Returns the number of files deleted. Empty partition directories
  * left behind by the deletes are pruned.
  */
object DeltaVacuum {

  def vacuum(tablePath: String, retentionMillis: Long, nowMillis: Long): Int = {
    require(retentionMillis >= 0, s"negative retention: $retentionMillis")
    val root = Paths.get(tablePath).toAbsolutePath.normalize
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"not a Delta table: $root")
    val cutoff = nowMillis - retentionMillis

    val (liveAdds, _, _) = DeltaLogReplay.replay(root)
    val keep: Set[Path] = liveAdds.values.flatMap { a =>
      val dataFile = root.resolve(a.path).normalize
      val dvFile = a.dv.flatMap(d =>
        DeletionVectors.resolveFile(root.toString, d.storageType, d.pathOrInlineDv))
        .map(_.toAbsolutePath.normalize)
      dataFile +: dvFile.toList
    }.toSet

    // tombstone clock: latest remove.deletionTimestamp per relative path
    // (driver-side line scan of the JSON commits — metadata-sized)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val tombstoned: Map[Path, Long] = {
      val listing = Files.list(logDir)
      val jsons = try listing.iterator().asScala
        .filter(_.getFileName.toString.matches("""\d{20}\.json"""))
        .toList finally listing.close()
      jsons.flatMap { p =>
        Files.readAllLines(p).asScala.flatMap { line =>
          val n = mapper.readTree(line).get("remove")
          if (n == null) None
          else Some(root.resolve(n.get("path").asText).normalize ->
            (if (n.has("deletionTimestamp")) n.get("deletionTimestamp").asLong
            else 0L))
        }
      }.groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2).max }
    }

    val walk = Files.walk(root)
    val candidates = try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.startsWith(logDir))
      .map(_.toAbsolutePath.normalize)
      .filterNot(keep)
      .toList finally walk.close()

    val deleted = candidates.filter { p =>
      val expiry = tombstoned.getOrElse(p,
        Files.getLastModifiedTime(p).toMillis)
      expiry < cutoff
    }
    deleted.foreach(Files.delete)

    // prune now-empty directories bottom-up (never the root or the log)
    val dirs = {
      val w = Files.walk(root)
      try w.iterator().asScala
        .filter(p => Files.isDirectory(p) && p != root && !p.startsWith(logDir))
        .toList.sortBy(-_.getNameCount) finally w.close()
    }
    dirs.foreach { d =>
      val s = Files.list(d)
      val empty = try !s.iterator().hasNext finally s.close()
      if (empty) Files.delete(d)
    }
    deleted.size
  }
}
