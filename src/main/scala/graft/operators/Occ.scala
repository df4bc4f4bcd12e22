package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

/** A concurrent writer lost the race: the table advanced past the
  * transaction's snapshot in a way that invalidates its writes. The
  * caller re-reads and retries (see [[OptimisticWriter.withRetry]]) —
  * the same contract as Delta's `ConcurrentModificationException`
  * family.
  */
final class ConcurrentWriteException(
    val table: String, val readVersion: Int, val committedVersion: Int,
    detail: String)
  extends RuntimeException(
    s"concurrent write to '$table': transaction read v$readVersion but " +
      s"v$committedVersion is now committed — $detail")

/** Snapshot handle for one optimistic transaction: the version the
  * writer's reads (and therefore its staged output) are based on.
  */
final case class OccTxn(table: String, readVersion: Int)

/** Optimistic concurrency over [[TableStore]] — true MULTI-WRITER
  * semantics on top of the store's single-writer swap protocol, shaped
  * after the commit rules of the Delta Lake paper (Armbrust et al.,
  * VLDB 2020, §3.2: optimistic writers, blind appends always win,
  * conflicts detected at commit against the versions that landed since
  * the transaction's snapshot).
  *
  * Why this beats the plain [[TableStore]] writer API at scale: the
  * store's own mutators hold the table lock for the WHOLE operation,
  * so a 20-minute merge serializes every other writer behind it. Here
  * the expensive part — the Spark job that computes and stages the new
  * files — runs entirely OUTSIDE the lock; the lock guards only a
  * file-move + version-bump critical section (milliseconds). Writers
  * scale until their commits genuinely collide.
  *
  * Conflict rules, checked inside the commit critical section against
  * every version in `(readVersion, current]`:
  *
  *   - [[commitAppend]] is a blind append: it carries no read
  *     dependency, so it NEVER conflicts on data — it re-verifies only
  *     that the live schema still matches the staged files (a
  *     concurrent schema change is a metadata conflict, as in Delta).
  *   - [[commitOverwrite]] replaces the whole table it READ: any
  *     intervening commit conflicts (compare-and-swap on the version).
  *   - [[commitReplacePartitions]] rewrites a declared partition set:
  *     it conflicts only with intervening commits whose touched
  *     partitions OVERLAP its own; disjoint partition writers commit
  *     concurrently, each rebasing onto the other's result.
  *
  * Partition-level detection needs per-version "what did v touch"
  * metadata: each OCC commit appends a tiny record to
  * `root/_txlog/<table>/v<N>` inside the lock, AFTER its swap — a
  * crash between swap and record leaves the version without a record,
  * and a missing record is read as "touched everything" (conservative:
  * may abort a loser that could have won, never commits a writer that
  * should have lost). Legacy [[TableStore]] mutators write no records
  * and are likewise treated as full-table touches. Records are a few
  * bytes per version; they are NOT vacuumed with history (conflict
  * checks look only at versions newer than a live transaction's
  * snapshot, so stale records are dead weight measured in bytes).
  *
  * Crash-safety inherits the store's protocol wholesale: staged-but-
  * uncommitted transaction output is an unmarked `.tmp-` stray that
  * [[TableStore.recover]] clears, and the commit section itself is the
  * store's existing swap/append/partition-overwrite machinery with its
  * enumerated injection points.
  */
final class OptimisticWriter(val store: TableStore) {

  /** Instrumentation hook: called with the nanoseconds each commit
    * spent INSIDE the table lock (the serial fraction of a writer
    * fleet — what [[graft.StressOcc]] measures). No-op in production.
    */
  private[graft] var commitTimer: Long => Unit = _ => ()

  private def timed[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally commitTimer(System.nanoTime() - t0)
  }

  /** Open a transaction against the table's current version. */
  def begin(table: String): OccTxn = {
    require(store.exists(table),
      s"optimistic transactions target existing tables; '$table' does not exist " +
        "(create it with a plain overwrite — creation has nothing to race with)")
    OccTxn(table, store.currentVersion(table))
  }

  /** The transaction's snapshot read. Pinned to `readVersion`, so a
    * concurrent commit cannot leak into this writer's input mid-plan
    * (requires the version to still be retained — size
    * `retainVersions` to cover the longest-running writer).
    */
  def readSnapshot(txn: OccTxn): DataFrame =
    store.read(txn.table, txn.readVersion)

  /** Blind append: stages OUTSIDE the lock, commits with no data
    * conflict check (appends commute). Returns the committed version.
    */
  def commitAppend(txn: OccTxn, df: DataFrame): Int = {
    require(store.partitionColumns(txn.table).isEmpty,
      s"append targets unpartitioned tables; '${txn.table}' is partitioned — " +
        "use commitReplacePartitions")
    val tmp = store.stage(txn.table, df, numFiles = 0)
    cleanupOnConflict(tmp) { store.withTableLock(txn.table) { timed {
      // metadata conflict check: the schema the staged files must land
      // beside is the CURRENT one, not the snapshot's
      val live = store.read(txn.table).schema.map(f => f.name -> f.dataType).toMap
      val staged = store.spark.read.parquet(tmp.toString)
        .schema.map(f => f.name -> f.dataType).toMap
      if (live != staged)
        throw new ConcurrentWriteException(txn.table, txn.readVersion,
          store.currentVersion(txn.table),
          "the table's schema changed under the append")
      store.appendStaged(txn.table, tmp)
      logCommit(txn.table, "append", None)
    } } }
  }

  /** Full-table compare-and-swap: commits only if NOTHING landed since
    * the snapshot (an overwrite read the whole table, so any
    * intervening commit invalidates it). Returns the committed version.
    */
  def commitOverwrite(txn: OccTxn, df: DataFrame, numFiles: Int = 0,
      partitionBy: Seq[String] = Nil): Int = {
    val tmp = store.stage(txn.table, df, numFiles, partitionBy)
    cleanupOnConflict(tmp) { store.withTableLock(txn.table) { timed {
      val cur = store.currentVersion(txn.table)
      if (cur != txn.readVersion)
        throw new ConcurrentWriteException(txn.table, txn.readVersion, cur,
          "a full-table overwrite conflicts with every intervening commit")
      store.swapIn(txn.table, tmp)
      logCommit(txn.table, "overwrite", None)
    } } }
  }

  /** Partition-scoped replace: commits as long as every intervening
    * commit touched a DISJOINT partition set — the winning case for
    * concurrent backfills, per-day reprocessing, and fan-in pipelines
    * where N writers each own a slice. On overlap (or an intervening
    * full-table commit) the transaction aborts. Returns the committed
    * version.
    */
  def commitReplacePartitions(
      txn: OccTxn, df: DataFrame, partCol: String, values: Seq[Any]): Int = {
    require(!values.contains(null),
      s"null $partCol partition values are not supported by the partition-aligned path")
    val mine: Set[String] =
      values.map(v => s"$partCol=${ExternalCatalogUtils.escapePathName(v.toString)}")
        .toSet
    val tmp = store.stage(txn.table, df, numFiles = 0, partitionBy = Seq(partCol))
    cleanupOnConflict(tmp) { store.withTableLock(txn.table) { timed {
      val cur = store.currentVersion(txn.table)
      ((txn.readVersion + 1) to cur).foreach { v =>
        touchedBy(txn.table, v) match {
          case Some(parts) if parts.intersect(mine).isEmpty => // disjoint: rebase
          case Some(parts) =>
            throw new ConcurrentWriteException(txn.table, txn.readVersion, cur,
              s"v$v rewrote overlapping partitions: " +
                parts.intersect(mine).toSeq.sorted.mkString(", "))
          case None =>
            throw new ConcurrentWriteException(txn.table, txn.readVersion, cur,
              s"v$v has no commit record (a legacy or interrupted writer) — " +
                "treated as a full-table touch")
        }
      }
      store.applyStagedPartitions(txn.table, tmp, partCol, values)
      logCommit(txn.table, "replace", Some(mine))
    } } }
  }

  /** SCD1 MERGE as an optimistic transaction — the op the whole layer
    * exists for: a merge's Spark work (three key-wise joins over the
    * snapshot) is exactly the long-running stage that must NOT hold the
    * table lock. When the table is partitioned by a merge key, the
    * merge is partition-scoped: only partitions PRESENT in the source
    * are read (partition-pruned snapshot scan), merged, and committed
    * via [[commitReplacePartitions]] — so concurrent merges into
    * disjoint partition sets (per-region feeds, per-day backfills)
    * commit without retries. Otherwise it degrades to a full CAS
    * overwrite. Conflicts retry with a fresh snapshot up to
    * `maxAttempts`. Returns the committed version (or the snapshot
    * version untouched for an empty source).
    *
    * The partition-scoped path is sound because the partition column
    * being a MERGE KEY means an update can never move a row across
    * partitions, and inserts land only in source-present partitions —
    * the same constraint Delta's `replaceWhere` merges rely on.
    */
  def mergeScd1(table: String, source: DataFrame, keys: Seq[String],
      updateCols: Seq[String], maxAttempts: Int = 3): Int =
    withRetry(maxAttempts) { () =>
      val txn = begin(table)
      val snapshot = readSnapshot(txn)
      store.partitionColumns(table) match {
        case Seq(pc) if keys.contains(pc) =>
          import org.apache.spark.sql.functions.col
          val touched = source.select(col(pc)).distinct()
            .collect().map(_.get(0)).toSeq
          require(!touched.contains(null),
            s"source rows with a null partition key '$pc' cannot merge " +
              "through the partition-aligned path")
          if (touched.isEmpty) txn.readVersion
          else commitReplacePartitions(txn,
            Merge.scd1(snapshot.filter(col(pc).isInCollection(touched)),
              source, keys, updateCols),
            pc, touched)
        case parts =>
          commitOverwrite(txn, Merge.scd1(snapshot, source, keys, updateCols),
            partitionBy = parts)
      }
    }

  /** Run `body` (begin → stage → commit) until it commits, retrying on
    * [[ConcurrentWriteException]] with a fresh snapshot each attempt —
    * the standard optimistic loop. Non-conflict failures propagate
    * immediately; the last conflict propagates after `maxAttempts`.
    */
  def withRetry[T](maxAttempts: Int = 3)(body: () => T): T = {
    var attempt = 1
    while (true) {
      try return body()
      catch {
        case _: ConcurrentWriteException if attempt < maxAttempts => attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** A conflicted transaction must leave no trace, but its staged
    * directory can be large — delete it AFTER the lock is released so
    * losers don't stretch every winner's critical section. Non-conflict
    * failures keep the staging dir as crash evidence for
    * [[TableStore.recover]].
    */
  private def cleanupOnConflict[T](tmp: Path)(body: => T): T =
    try body
    catch {
      case e: ConcurrentWriteException =>
        if (Files.exists(tmp)) store.deleteRecursively(tmp)
        throw e
    }

  // ---- commit log -----------------------------------------------------

  private def txlogDir(table: String): Path =
    Paths.get(store.root, "_txlog", store.flat(table))

  /** Record what the JUST-COMMITTED current version touched. Must be
    * called inside the table lock, after the swap — so the version
    * number is stable and a crash before this write degrades to the
    * conservative missing-record reading.
    */
  private def logCommit(table: String, op: String, parts: Option[Set[String]]): Int = {
    val v = store.currentVersion(table)
    Files.createDirectories(txlogDir(table))
    val body = (op +: parts.toSeq.flatMap(_.toSeq.sorted)).mkString("\n")
    Files.write(txlogDir(table).resolve(f"v$v%05d"),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    v
  }

  /** Partition set version `v` touched: `Some(parts)` for a recorded
    * partition-scoped commit, `Some(∅)` never occurs (an append records
    * no read/write partition footprint and returns the empty set via
    * the "append" op), `None` for full-table or unrecorded commits.
    */
  private def touchedBy(table: String, v: Int): Option[Set[String]] = {
    val f = txlogDir(table).resolve(f"v$v%05d")
    if (!Files.exists(f)) return None
    val lines = new String(Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
    lines.headOption match {
      case Some("append") => Some(Set.empty) // no partition footprint
      case Some("replace") => Some(lines.tail.filter(_.nonEmpty).toSet)
      case _ => None // "overwrite" or unknown: full-table touch
    }
  }
}
