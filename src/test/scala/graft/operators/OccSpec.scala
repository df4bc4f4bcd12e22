package graft.operators

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-writer semantics of [[OptimisticWriter]]: blind appends always
  * commit, full overwrites CAS on the snapshot version, partition-
  * scoped replaces commit iff the intervening commits touched disjoint
  * partitions, and the retry loop converges. Includes REAL concurrent
  * threads (latch-sequenced for the deterministic interleavings, free-
  * running for the stress case) and a crash interplay check.
  */
class OccSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("graft-occ-").toString)

  private def kv(pairs: (Long, String)*) = pairs.toDF("k", "v")

  private def rows(store: TableStore, table: String): Set[(Long, String)] =
    store.read(table).select("k", "v").as[(Long, String)].collect().toSet

  test("blind appends from concurrent threads all commit, none lost") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(0L -> "base"))
    val n = 4
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { i =>
      new Thread(() => {
        start.await()
        try {
          val txn = occ.begin("t")
          occ.commitAppend(txn, kv(i.toLong -> s"w$i"))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"appenders failed: ${errs.asString}")
    assert(rows(store, "t") ===
      (Set(0L -> "base") ++ (1 to n).map(i => i.toLong -> s"w$i")))
    assert(store.currentVersion("t") === n)
  }

  private implicit class QueueOps(q: java.util.concurrent.ConcurrentLinkedQueue[Throwable]) {
    def asString: String = {
      val it = q.iterator(); val b = new StringBuilder
      while (it.hasNext) b.append(it.next().toString).append("; ")
      b.toString
    }
  }

  test("overwrite CAS: the writer that lost the race aborts, retry wins") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(1L -> "a"))
    val slow = occ.begin("t")
    // a fast writer lands first
    occ.commitAppend(occ.begin("t"), kv(2L -> "fast"))
    // the slow writer's full overwrite must now abort…
    val e = intercept[ConcurrentWriteException] {
      occ.commitOverwrite(slow, kv(9L -> "slow"))
    }
    assert(e.readVersion === 0 && e.committedVersion === 1)
    assert(rows(store, "t") === Set(1L -> "a", 2L -> "fast"), "loser left no trace")
    // …and the optimistic loop converges on a fresh snapshot
    occ.withRetry() { () =>
      val txn = occ.begin("t")
      occ.commitOverwrite(txn,
        occ.readSnapshot(txn).withColumn("v", concat(col("v"), lit("!"))))
    }
    assert(rows(store, "t") === Set(1L -> "a!", 2L -> "fast!"))
  }

  test("snapshot read stays pinned while the table advances") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(1L -> "a"))
    val txn = occ.begin("t")
    occ.commitAppend(occ.begin("t"), kv(2L -> "later"))
    assert(occ.readSnapshot(txn).select("k", "v").as[(Long, String)]
      .collect().toSet === Set(1L -> "a"))
  }

  test("disjoint partition replaces commit concurrently, both visible") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((1L, "p1", "old"), (2L, "p2", "old"), (3L, "p3", "old"))
      .toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    // both writers snapshot the SAME version, then commit in sequence —
    // the latch proves neither stages under the lock
    val t1 = occ.begin("t")
    val t2 = occ.begin("t")
    occ.commitReplacePartitions(t2,
      Seq((2L, "p2", "w2")).toDF("k", "p", "v"), "p", Seq("p2"))
    // t1's partitions are untouched by t2's commit → rebases and commits
    occ.commitReplacePartitions(t1,
      Seq((1L, "p1", "w1")).toDF("k", "p", "v"), "p", Seq("p1"))
    assert(store.read("t").select("k", "v").as[(Long, String)].collect().toSet ===
      Set(1L -> "w1", 2L -> "w2", 3L -> "old"))
  }

  test("overlapping partition replaces: second writer aborts with the culprit") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((1L, "p1", "old"), (2L, "p2", "old")).toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val t1 = occ.begin("t")
    occ.commitReplacePartitions(occ.begin("t"),
      Seq((2L, "p2", "w2")).toDF("k", "p", "v"), "p", Seq("p2"))
    val e = intercept[ConcurrentWriteException] {
      occ.commitReplacePartitions(t1,
        Seq((2L, "p2", "loser")).toDF("k", "p", "v"), "p", Seq("p2"))
    }
    assert(e.getMessage.contains("p=p2"))
    assert(store.read("t").filter(col("p") === "p2").select("v").as[String]
      .collect().toSeq === Seq("w2"), "loser left no trace")
  }

  test("an intervening LEGACY commit (no record) conservatively aborts a replace") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((1L, "p1", "old"), (2L, "p2", "old")).toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val txn = occ.begin("t")
    // legacy writer touches a DISJOINT partition — but writes no commit
    // record, so the OCC writer cannot prove disjointness
    store.overwritePartitions("t",
      Seq((2L, "p2", "legacy")).toDF("k", "p", "v"), "p", Seq("p2"))
    val e = intercept[ConcurrentWriteException] {
      occ.commitReplacePartitions(txn,
        Seq((1L, "p1", "w1")).toDF("k", "p", "v"), "p", Seq("p1"))
    }
    assert(e.getMessage.contains("no commit record"))
  }

  test("append aborts on a concurrent schema change, commits after re-stage") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(1L -> "a"))
    val txn = occ.begin("t")
    // concurrent writer evolves the schema under the pending append
    occ.commitOverwrite(occ.begin("t"),
      kv(1L -> "a").withColumn("extra", lit(7)))
    val e = intercept[ConcurrentWriteException] {
      occ.commitAppend(txn, kv(2L -> "b"))
    }
    assert(e.getMessage.contains("schema"))
    // restaged against the live schema, the append goes through
    occ.commitAppend(occ.begin("t"), kv(2L -> "b").withColumn("extra", lit(8)))
    assert(store.read("t").count() === 2)
  }

  test("free-running mixed writers: every committed version is consistent") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((0L, "p1", "old"), (0L, "p2", "old"), (0L, "p3", "old"))
      .toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 3).map { i =>
      new Thread(() => {
        try {
          occ.withRetry(maxAttempts = 10) { () =>
            val txn = occ.begin("t")
            occ.commitReplacePartitions(txn,
              Seq((i.toLong, s"p$i", s"w$i")).toDF("k", "p", "v"), "p", Seq(s"p$i"))
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"writers failed: ${errs.asString}")
    assert(store.read("t").select("k", "v").as[(Long, String)].collect().toSet ===
      Set(1L -> "w1", 2L -> "w2", 3L -> "w3"))
  }

  test("crash between swap and commit record degrades to the conservative read") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((1L, "p1", "old"), (2L, "p2", "old")).toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val pending = occ.begin("t")
    // make a DISJOINT OCC commit whose record write "crashes": simulate
    // by committing normally then deleting the record — byte-identical
    // to dying between applyStagedPartitions and logCommit
    occ.commitReplacePartitions(occ.begin("t"),
      Seq((2L, "p2", "w2")).toDF("k", "p", "v"), "p", Seq("p2"))
    val rec = java.nio.file.Paths.get(store.root, "_txlog", "t",
      f"v${store.currentVersion("t")}%05d")
    java.nio.file.Files.delete(rec)
    val e = intercept[ConcurrentWriteException] {
      occ.commitReplacePartitions(pending,
        Seq((1L, "p1", "w1")).toDF("k", "p", "v"), "p", Seq("p1"))
    }
    assert(e.getMessage.contains("no commit record"),
      "a recordless version must read as a full-table touch, not as disjoint")
  }

  test("a losing transaction's staged files never survive as strays") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(1L -> "a"))
    val txn = occ.begin("t")
    occ.commitAppend(occ.begin("t"), kv(2L -> "b"))
    intercept[ConcurrentWriteException] { occ.commitOverwrite(txn, kv(9L -> "x")) }
    val strays = java.nio.file.Paths.get(store.root).toFile.listFiles()
      .filter(_.getName.startsWith(".tmp-"))
    assert(strays.isEmpty, s"conflicted commit leaked: ${strays.mkString(", ")}")
  }

  test("latch-proven: staging runs outside the lock (writers overlap in time)") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(0L -> "base"))
    // a thread that grabs the table lock and holds it while the main
    // thread STAGES (but does not commit) — if staging needed the lock,
    // this would deadlock the 10s latch instead of completing
    val locked = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() => {
      store.withTableLock("t") { locked.countDown(); release.await() }
    })
    holder.start()
    assert(locked.await(10, TimeUnit.SECONDS))
    val txn = occ.begin("t")
    val staged = store.stage("t", kv(1L -> "w"), numFiles = 0)
    assert(Files.exists(staged), "staging completed while the lock was held elsewhere")
    store.deleteRecursively(staged)
    release.countDown()
    holder.join(10000)
    // and the full optimistic append commits once the lock frees
    occ.commitAppend(txn, kv(1L -> "w"))
    assert(rows(store, "t") === Set(0L -> "base", 1L -> "w"))
  }

  test("optimistic SCD1 merge, partitioned: partition-scoped and value-correct") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = Seq((1L, "p1", "old"), (2L, "p1", "old"), (3L, "p2", "old"),
      (4L, "p3", "old")).toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val untouched = java.nio.file.Paths.get(store.path("t"), "p=p3")
    val before = java.nio.file.Files.getLastModifiedTime(untouched)
    // source touches only p1 (update k=1, insert k=9)
    val source = Seq((1L, "p1", "new"), (9L, "p1", "ins")).toDF("k", "p", "v")
    occ.mergeScd1("t", source, keys = Seq("k", "p"), updateCols = Seq("v"))
    assert(store.read("t").select("k", "v").as[(Long, String)].collect().toSet ===
      Set(1L -> "new", 2L -> "old", 3L -> "old", 4L -> "old", 9L -> "ins"))
    // p3 was never rewritten: its files are byte-untouched
    assert(java.nio.file.Files.getLastModifiedTime(untouched) === before,
      "an untouched partition was rewritten — the merge was not partition-scoped")
  }

  test("optimistic SCD1 merge, unpartitioned: CAS overwrite with retry") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    store.overwrite("t", kv(1L -> "old", 2L -> "old"))
    occ.mergeScd1("t", kv(1L -> "new", 3L -> "ins"), keys = Seq("k"),
      updateCols = Seq("v"))
    assert(rows(store, "t") === Set(1L -> "new", 2L -> "old", 3L -> "ins"))
  }

  test("concurrent disjoint-partition merges all commit, combined result exact") {
    val store = freshStore()
    val occ = new OptimisticWriter(store)
    val base = (1 to 3).flatMap(i => Seq((i.toLong, s"p$i", "old")))
      .toDF("k", "p", "v")
    store.overwrite("t", base, partitionBy = Seq("p"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 3).map { i =>
      new Thread(() => {
        try occ.mergeScd1("t",
          Seq((i.toLong, s"p$i", s"upd$i"), (i + 10L, s"p$i", s"ins$i"))
            .toDF("k", "p", "v"),
          keys = Seq("k", "p"), updateCols = Seq("v"), maxAttempts = 10)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"merges failed: ${errs.asString}")
    assert(store.read("t").select("k", "v").as[(Long, String)].collect().toSet ===
      (1 to 3).flatMap(i => Seq(i.toLong -> s"upd$i", (i + 10L) -> s"ins$i")).toSet)
  }
}
