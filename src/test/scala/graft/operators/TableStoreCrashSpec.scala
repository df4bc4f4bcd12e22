package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Crash-consistency fuzz for the TableStore write protocols: a writer
  * is "killed" (via [[TableStore.crashHook]]) at EVERY labeled
  * injection point of overwrite / append / overwritePartitions, and
  * after [[TableStore.recover]] the table must read as exactly the OLD
  * generation or exactly the NEW one — never a torn mix, never
  * unreadable. A follow-up write must then succeed (no stuck locks, no
  * poisoned staging state).
  *
  * The injection points are enumerated centrally
  * ([[TableStore.injectionPoints]]); this spec fails if a new point is
  * added to the protocol without a scenario here.
  */
class TableStoreCrashSpec extends SparkSpec {
  import spark.implicits._

  private final class InjectedCrash extends RuntimeException("injected crash")

  private def freshStore(): TableStore = {
    val root = Files.createTempDirectory("graft-crash-").toString
    new TableStore(spark, root)
  }

  private def rows(store: TableStore, table: String): Set[(Long, String)] =
    store.read(table).select("k", "v").as[(Long, String)].collect().toSet

  /** Kill the writer at `point` while running `op`; returns whether the
    * crash actually fired (a point not on this op's path never fires).
    */
  private def crashAt(store: TableStore, point: String)(op: => Unit): Boolean = {
    var fired = false
    store.crashHook = p => if (p == point) { fired = true; throw new InjectedCrash }
    try { op; false }
    catch { case _: InjectedCrash => true }
    finally store.crashHook = _ => ()
  }

  private val oldRows = Set(1L -> "a", 2L -> "b", 3L -> "c")
  private val newRows = Set(1L -> "a2", 4L -> "d")

  private def oldDf = oldRows.toSeq.toDF("k", "v")
  private def newDf = newRows.toSeq.toDF("k", "v")

  // ---- full-swap overwrite --------------------------------------------

  for (point <- Seq("overwrite:staged", "swap:marked", "swap:old-archived")) {
    test(s"overwrite killed at $point: recover leaves exactly old or new") {
      val store = freshStore()
      store.overwrite("t", oldDf)
      assert(crashAt(store, point)(store.overwrite("t", newDf)),
        s"injection point $point never fired on the overwrite path")
      val action = store.recover("t")
      val got = rows(store, "t")
      assert(got == oldRows || got == newRows,
        s"torn state after $point + recover($action): $got")
      // the table-missing window MUST roll forward (the staging dir was
      // complete); the pre-swap windows keep the old generation
      if (point == "swap:old-archived")
        assert(action == "rolled-forward" && got == newRows, s"$action/$got")
      else
        assert(got == oldRows, s"$action/$got")
      // no staging/trash debris survives recovery
      assert(strayCount(store) == 0)
      // and the store still works
      store.overwrite("t", Seq(9L -> "z").toDF("k", "v"))
      assert(rows(store, "t") == Set(9L -> "z"))
    }
  }

  test("FIRST write killed after staging: no table, store still usable") {
    val store = freshStore()
    assert(crashAt(store, "overwrite:staged")(store.overwrite("t", oldDf)))
    assert(store.recover("t") == "no-table")
    assert(!store.exists("t"))
    store.overwrite("t", oldDf)
    assert(rows(store, "t") == oldRows)
  }

  // ---- blind append ---------------------------------------------------

  for (point <- Seq("append:staged", "append:assembled",
      "swap:marked", "swap:old-archived")) {
    test(s"append killed at $point: recover leaves exactly old or old+appended") {
      val store = freshStore()
      store.overwrite("t", oldDf)
      assert(crashAt(store, point)(store.append("t", newDf)),
        s"injection point $point never fired on the append path")
      val action = store.recover("t")
      val got = rows(store, "t")
      assert(got == oldRows || got == (oldRows ++ newRows),
        s"torn state after $point + recover($action): $got")
      if (point == "swap:old-archived")
        assert(got == (oldRows ++ newRows), s"$action/$got")
      else assert(got == oldRows, s"$action/$got")
      assert(strayCount(store) == 0)
      store.append("t", Seq(9L -> "z").toDF("k", "v"))
      assert(rows(store, "t").contains(9L -> "z"))
    }
  }

  // ---- partition-aligned overwrite ------------------------------------

  private val oldPart = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2))
  private val newP1 = Seq((1L, "a2", 1), (4L, "d", 1))
  private def partRows(store: TableStore): Set[(Long, String, Int)] =
    store.read("t").select("k", "v", "p").as[(Long, String, Int)].collect().toSet

  for (point <- Seq("opart:staged", "opart:snapshotted", "opart:part-trashed",
      "opart:part-moved", "opart:pre-cleanup")) {
    test(s"partition overwrite killed at $point: recover leaves old or new, never a mix") {
      val store = freshStore()
      store.overwrite("t", oldPart.toDF("k", "v", "p"), partitionBy = Seq("p"))
      assert(crashAt(store, point)(
        store.overwritePartitions("t", newP1.toDF("k", "v", "p"), "p", Seq(1))),
        s"injection point $point never fired on the partition-overwrite path")
      val action = store.recover("t")
      val got = partRows(store)
      val oldSet = oldPart.toSet
      val newSet = oldPart.filter(_._3 != 1).toSet ++ newP1.toSet
      assert(got == oldSet || got == newSet,
        s"torn state after $point + recover($action): $got")
      assert(strayCount(store) == 0)
      // the same mutation applied after recovery lands the new state
      store.overwritePartitions("t", newP1.toDF("k", "v", "p"), "p", Seq(1))
      assert(partRows(store) == newSet)
    }
  }

  test("a NEW partition value killed mid-loop still rolls back cleanly") {
    // adding p=9 trashes nothing — without the in-flight intent marker
    // this crash left old+extra-partition with no recovery signal
    val store = freshStore()
    store.overwrite("t", oldPart.toDF("k", "v", "p"), partitionBy = Seq("p"))
    assert(crashAt(store, "opart:part-moved")(
      store.overwritePartitions("t", Seq((9L, "x", 9)).toDF("k", "v", "p"),
        "p", Seq(9))))
    val action = store.recover("t")
    assert(action == "rolled-back", action)
    assert(partRows(store) == oldPart.toSet)
    assert(strayCount(store) == 0)
  }

  test("recover itself dying mid-rollback resumes instead of corrupting") {
    // crash state: mid-partition-overwrite (torn mix + trash evidence)
    val store = freshStore()
    store.overwrite("t", oldPart.toDF("k", "v", "p"), partitionBy = Seq("p"))
    assert(crashAt(store, "opart:part-trashed")(
      store.overwritePartitions("t", newP1.toDF("k", "v", "p"), "p", Seq(1))))
    // simulate recover() #1 dying right after its first step (deleting
    // the torn current): the next recover must RESUME the rollback via
    // the missing-dir branch — not roll the trash evidence forward
    // (the trash dirs carry no usable staging) and not give up
    deleteDir(Paths.get(store.root, "t"))
    val action = store.recover("t")
    assert(action == "rolled-back", action)
    assert(partRows(store) == oldPart.toSet)
    assert(strayCount(store) == 0)
  }

  test("a trash dir carrying a next-version marker is never rolled forward") {
    // regression guard for the review finding: an interrupted rollback
    // used to leave an aside dir whose marker matched history+1, and a
    // re-run would move the TORN mix back in as 'rolled-forward'
    val store = freshStore()
    store.overwrite("t", oldDf)
    store.overwrite("t", newDf) // history v0 = oldRows, current v1 = newRows
    val cur = Paths.get(store.root, "t")
    val torn = Paths.get(store.root, s".trash-t-${System.nanoTime()}")
    Files.move(cur, torn) // crash state: table missing, marked trash dir
    val action = store.recover("t")
    assert(action == "rolled-back", action) // restores v0, ignores the trash
    assert(rows(store, "t") == oldRows)
    assert(strayCount(store) == 0)
  }

  private def deleteDir(p: java.nio.file.Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => Files.delete(f))
    finally s.close()
  }

  test("recover on a healthy table is a no-op; every protocol point is covered") {
    val store = freshStore()
    store.overwrite("t", oldDf)
    assert(store.recover("t") == "clean")
    assert(rows(store, "t") == oldRows)
    // spec drift guard: every enumerated injection point has a scenario
    val covered = Set("overwrite:staged", "swap:marked", "swap:old-archived",
      "append:staged", "append:assembled", "opart:staged", "opart:snapshotted",
      "opart:part-trashed", "opart:part-moved", "opart:pre-cleanup")
    assert(TableStore.injectionPoints.toSet == covered,
      "TableStore.injectionPoints changed — add crash scenarios for the new points")
  }

  private def strayCount(store: TableStore): Int =
    Option(new java.io.File(store.root).listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.startsWith(".tmp-") || f.getName.startsWith(".trash-"))
}
