package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned overwrite writes year= dirs and year filters prune at file level") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-part-").toString)
    val df = Seq((1, 2023, "a"), (2, 2023, "b"), (3, 2024, "c"), (4, 2025, "d"))
      .toDF("id", "year", "v")
    store.overwrite("t", df, partitionBy = Seq("year"))

    val dirs = new java.io.File(s"${store.root}/t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("year=2023", "year=2024", "year=2025"))

    val sliced = store.read("t").filter($"year" === 2024)
    sliced.collect()
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(year"),
      s"year filter not applied as partition filter:\n$plan")
    assert(sliced.count() == 1)
    // full read still complete, year round-trips as int
    assert(store.read("t").count() == 4)
    assert(store.read("t").schema("year").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("partition-aligned merge rewrites only touched partitions") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-pal-").toString)
    store.overwrite("t",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))

    def partFiles(year: Int): Map[String, Long] = {
      val d = new java.io.File(s"${store.root}/t/year=$year")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val files2023 = partFiles(2023)

    // merge a 2024-only source: key 2 already present (no update), key 3 new
    Merge.insertOnlyPartitionAligned(store, "t",
      Seq((2, 2024, "CHANGED"), (3, 2024, "c")).toDF("id", "year", "v"),
      keys = Seq("id"), partCol = "year")

    // untouched partition: identical files, same mtimes — never rewritten
    assert(partFiles(2023) == files2023)
    val rows = store.read("t").orderBy("id")
      .select("id", "v", "year").as[(Int, String, Int)].collect().toSeq
    assert(rows == Seq((1, "a", 2023), (2, "b", 2024), (3, "c", 2024)))
  }

  test("replaceWhere: scoped reload, untouched partitions keep files, violations refused") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-rw-").toString)
    store.overwrite("t",
      Seq((1, 2023, "a"), (2, 2023, "b"), (3, 2024, "c")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    def partFiles(year: Int): Map[String, Long] = {
      val d = new java.io.File(s"${store.root}/t/year=$year")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val files2024 = partFiles(2024)

    // reload 2023 wholesale: 2 rows out, 1 row in
    val (removed, inserted) = store.replaceWhere("t",
      $"year" === 2023, Seq((9, 2023, "RELOADED")).toDF("id", "year", "v"))
    assert((removed, inserted) === (2L, 1L))
    assert(store.read("t").orderBy("id")
      .select("id", "year", "v").as[(Int, Int, String)].collect().toSeq ===
      Seq((3, 2024, "c"), (9, 2023, "RELOADED")))
    // 2024 partition never rewritten
    assert(partFiles(2024) === files2024)
    // versioned: pre-replace generation still readable
    assert(store.read("t", asOf = store.history("t")
      .filter(!$"is_current").agg(max($"version")).as[Int].head()).count() === 3)

    // a replacement row OUTSIDE the predicate scope fails the whole write
    val err = intercept[IllegalArgumentException] {
      store.replaceWhere("t", $"year" === 2023,
        Seq((7, 2024, "ESCAPE")).toDF("id", "year", "v"))
    }
    assert(err.getMessage.contains("violate the predicate"))
    assert(store.read("t").count() === 2) // unchanged

    // replacement that empties a partition (no new rows for it) still lands
    store.replaceWhere("t", $"year" === 2023,
      spark.emptyDataset[(Int, Int, String)].toDF("id", "year", "v"))
    assert(store.read("t").select("year").as[Int].collect().toSeq === Seq(2024))
  }

  test("schemaDiff reports added, removed, and retyped columns between generations") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-sd-").toString)
    store.overwrite("t", Seq((1, "a", 1.5)).toDF("id", "v", "x"))
    store.overwrite("t", Seq((1L, "a", true)).toDF("id", "v", "flag")
      .select($"id", $"v", $"flag")) // id widened int->bigint, x removed, flag added
    val diff = store.schemaDiff("t", 0, 1)
      .as[(String, String, String, String)].collect().toSet
    assert(diff === Set(
      ("flag", "added", null, "boolean"),
      ("x", "removed", "double", null),
      ("id", "retyped", "int", "bigint")))
    // identical generations: empty diff
    assert(store.schemaDiff("t", 1, 1).count() === 0)
  }

  test("partition-aligned merge handles values Spark URL-encodes in paths") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-esc-").toString)
    store.overwrite("t",
      Seq((1, "a:b", "x"), (2, "plain", "y")).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    Merge.insertOnlyPartitionAligned(store, "t",
      Seq((3, "a:b", "z")).toDF("id", "part", "v"),
      keys = Seq("id"), partCol = "part")
    val rows = store.read("t").orderBy("id")
      .select("id", "v", "part").as[(Int, String, String)].collect().toSeq
    assert(rows == Seq((1, "x", "a:b"), (2, "y", "plain"), (3, "z", "a:b")))
    // null partition values rejected loudly, not silently dropped
    val e = intercept[IllegalArgumentException] {
      store.overwritePartitions("t",
        Seq((4, "plain", "w")).toDF("id", "part", "v"), "part", Seq(null))
    }
    assert(e.getMessage.contains("null"))
  }

  test("compact preserves partition layout") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cpt-").toString)
    store.overwrite("t",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    store.compact("t", 1)
    val dirs = new java.io.File(s"${store.root}/t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("year=2023", "year=2024"))
    assert(store.read("t").count() == 2)
    // a later partition-aligned merge still works
    Merge.insertOnlyPartitionAligned(store, "t",
      Seq((3, 2024, "c")).toDF("id", "year", "v"), Seq("id"), "year")
    assert(store.read("t").count() == 3)
  }

  test("vacuum removes only crash leftovers, never tables") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-vac-").toString)
    store.overwrite("keep", Seq((1, "a")).toDF("id", "v"))
    // simulate a writer that died mid-swap
    Files.createDirectories(java.nio.file.Paths.get(store.root, ".tmp-keep-123"))
    Files.createDirectories(java.nio.file.Paths.get(store.root, ".trash-keep-456"))
    assert(store.vacuum() == 2)
    assert(store.exists("keep"))
    assert(store.read("keep").count() == 1)
    assert(store.vacuum() == 0)
  }

  test("partitioned merge keeps layout across incremental writes") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-part2-").toString)
    store.overwrite("t", Seq((1, 2023, "a")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    Merge.mergeInto(store, "t", Seq((1, 2023, "CHANGED"), (2, 2024, "b")).toDF("id", "year", "v"),
      keys = Seq("id"), partitionBy = Seq("year"))
    val dirs = new java.io.File(s"${store.root}/t").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("year=2023", "year=2024"))
    val rows = store.read("t").orderBy("id")
      .select("id", "v", "year").as[(Int, String, Int)].collect().toSeq
    assert(rows == Seq((1, "a", 2023), (2, "b", 2024))) // insert-only: 1 untouched
  }

  test("3-level catalog.schema.table names map to nested directories") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-ns-").toString)
    val df = Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v")
    store.overwrite("ironman.gold.dim_test", df, partitionBy = Seq("year"))
    assert(store.exists("ironman.gold.dim_test"))
    assert(Files.isDirectory(java.nio.file.Paths.get(
      store.root, "ironman", "gold", "dim_test", "year=2023")))
    assert(store.read("ironman.gold.dim_test").count() == 2)
    // overwrite swap + partition-aligned merge work through the namespace
    store.overwrite("ironman.gold.dim_test",
      Seq((3, 2023, "c")).toDF("id", "year", "v"), partitionBy = Seq("year"))
    assert(store.read("ironman.gold.dim_test").count() == 1)
    Merge.mergeInto(store, "ironman.gold.dim_test",
      Seq((4, 2025, "d")).toDF("id", "year", "v"),
      keys = Seq("id"), partitionBy = Seq("year"))
    assert(store.read("ironman.gold.dim_test").count() == 2)
    // flat tables and nested schemas coexist at the same root
    store.overwrite("flat_t", df)
    assert(store.exists("flat_t") && store.exists("ironman.gold.dim_test"))
  }

  test("persisted views survive a brand-new session attaching to the warehouse") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-vw-").toString)
    store.overwrite("base", Seq((1, "x"), (2, "y"), (3, "y")).toDF("id", "tag"))
    spark.read.parquet(store.path("base")).createOrReplaceTempView("base")
    store.saveView("vw_tags", "SELECT tag, COUNT(*) AS n FROM base GROUP BY tag", 0)
    // second view layered on the first: restore order must hold
    store.saveView("vw_tag_total", "SELECT SUM(n) AS total FROM vw_tags", 1)
    store.restoreViewsInto(spark)
    assert(spark.table("vw_tag_total").head().getLong(0) == 3)

    // a NEW session (fresh temp-view catalog) sees nothing ...
    val fresh = spark.newSession()
    intercept[Exception](fresh.table("vw_tags").collect())
    // ... until it re-attaches: base tables + persisted definitions
    fresh.read.parquet(store.path("base")).createOrReplaceTempView("base")
    store.restoreViewsInto(fresh)
    assert(fresh.table("vw_tags").count() == 2)
    assert(fresh.table("vw_tag_total").head().getLong(0) == 3)

    // re-saving under a new index replaces the old definition
    store.saveView("vw_tags", "SELECT tag FROM base", 5)
    assert(store.savedViews.count(_._1 == "vw_tags") == 1)
  }

  test("time travel: every overwrite is a readable generation, vacuum prunes loudly") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-tt-").toString)
    store.overwrite("t", Seq((1, "a")).toDF("id", "v"))
    store.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((3, "c")).toDF("id", "v"))
    assert(store.currentVersion("t") == 2)
    assert(store.versions("t") == Seq(0, 1, 2))
    assert(store.read("t", 0).select("v").as[String].head() == "a")
    assert(store.read("t", 1).select("v").as[String].head() == "b")
    assert(store.read("t", 2).select("v").as[String].head() == "c") // current
    assert(store.vacuumVersions("t", 1) == 1) // drops v0, keeps v1 + current
    val e = intercept[IllegalArgumentException](store.read("t", 0))
    assert(e.getMessage.contains("available"))
    assert(store.read("t", 1).select("v").as[String].head() == "b")
    assert(store.read("t").select("v").as[String].head() == "c")
  }

  test("retention bounds history; partition-aligned merge snapshots via hardlinks") {
    val bounded = new TableStore(spark,
      Files.createTempDirectory("graft-tt2-").toString, retainVersions = 2)
    (0 to 5).foreach(i => bounded.overwrite("t", Seq((i, s"v$i")).toDF("id", "v")))
    assert(bounded.versions("t") == Seq(3, 4, 5))

    val store = new TableStore(spark, Files.createTempDirectory("graft-tt3-").toString)
    store.overwrite("p",
      Seq((1, 2023, "a"), (2, 2024, "b")).toDF("id", "year", "v"),
      partitionBy = Seq("year"))
    val files2023 = new java.io.File(s"${store.root}/p/year=2023")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    Merge.insertOnlyPartitionAligned(store, "p",
      Seq((3, 2024, "c")).toDF("id", "year", "v"), keys = Seq("id"), partCol = "year")
    // in-place path produced a generation without rewriting untouched files
    assert(store.currentVersion("p") == 1)
    assert(store.read("p", 0).count() == 2) // pre-merge snapshot
    assert(store.read("p", 1).count() == 3)
    assert(new java.io.File(s"${store.root}/p/year=2023")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap == files2023)
  }

  test("history lists generations; restore makes an old version current non-destructively") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-hist-").toString)
    store.overwrite("t", Seq((1, "a")).toDF("id", "v"))
    store.overwrite("t", Seq((2, "b"), (3, "c")).toDF("id", "v"))

    val h = store.history("t").orderBy(col("version")).collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(0, 1))
    assert(h.map(_.getBoolean(1)).toSeq == Seq(false, true))
    assert(h.forall(r => r.getInt(2) > 0 && r.getLong(3) > 0)) // files + bytes

    // restore v0: becomes generation 2; generation 1 stays readable
    store.restoreVersion("t", 0)
    assert(store.currentVersion("t") == 2)
    assert(store.read("t").select("v").as[String].collect().toSeq == Seq("a"))
    assert(store.read("t", 1).count() == 2)

    // size-targeted compaction: tiny target forces multiple files
    store.overwrite("big", spark.range(100000).toDF("id"))
    val oneFileBytes = store.history("big").filter(col("is_current"))
      .head().getLong(3)
    store.compactToSize("big", math.max(1L, oneFileBytes / 4))
    val files = new java.io.File(store.path("big"))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 2 && files <= 8, s"expected ~4 files, got $files")
    assert(store.read("big").count() == 100000)
  }

  test("changes(v0,v1) emits the exact delete/insert diff between generations") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cdc-").toString)
    store.overwrite("t", Seq((1, "a"), (2, "b"), (3, "c"), (3, "c")).toDF("id", "v"))
    // v1: 1 updated, 2 deleted, 4 inserted, one duplicate (3,"c") dropped
    store.overwrite("t", Seq((1, "A"), (3, "c"), (4, "d")).toDF("id", "v"))
    val out = store.changes("t", 0, 1)
      .select("id", "v", "_change_type").as[(Int, String, String)]
      .collect().sorted.toSeq
    assert(out == Seq(
      (1, "A", "insert"), (1, "a", "delete"), // update = delete+insert pair
      (2, "b", "delete"),
      (3, "c", "delete"),                     // multiset: one of two copies
      (4, "d", "insert")))
    // identical generations diff to nothing
    store.overwrite("t", store.read("t", 1))
    assert(store.changes("t", 1, 2).isEmpty)
  }

  test("changes() append fast path: reads ONLY the appended files, equal to the derived diff") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cdc-fast-").toString)
    store.overwrite("t", (1 to 1000).map(i => (i, s"v$i")).toDF("id", "v"))
    store.append("t", Seq((2001, "x"), (2002, "y")).toDF("id", "v"))
    val ch = store.changes("t", 0, 1)
    // value equality with what the exceptAll diff would produce
    assert(ch.select("id", "v", "_change_type").as[(Int, String, String)]
      .collect().sorted.toSeq == Seq((2001, "x", "insert"), (2002, "y", "insert")))
    // and the SCAN is delta-sized: only append-prefixed files are read
    // (the O(new data) CDC path appendStaged's naming scheme guarantees)
    val files = ch.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("append-")),
      s"fast path read non-appended files: ${files.mkString(", ")}")
    // a second append diffs across BOTH transitions from v0
    store.append("t", Seq((2003, "z")).toDF("id", "v"))
    assert(store.changes("t", 0, 2).count() == 3)
    assert(store.changes("t", 1, 2).as[(Int, String, String)].collect()
      .toSeq.map(_._1) == Seq(2003))
    // an overwrite breaks file-set subsetting -> derived diff with deletes
    store.overwrite("t", Seq((1, "only")).toDF("id", "v"))
    val slow = store.changes("t", 2, 3)
    assert(slow.filter(col("_change_type") === "delete").count() == 1003L)
  }

  test("changes() fast path on a partitioned table: a new-partition load is its own delta") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-cdc-part-").toString)
    store.overwrite("t",
      Seq((1, "p0", "a"), (2, "p1", "b")).toDF("k", "part", "v"),
      partitionBy = Seq("part"))
    // the nightly load shape: a brand-new partition value — append-pure
    // at the file level, so the CDC is the new partition's files only
    store.overwritePartitions("t",
      Seq((3, "p2", "c"), (4, "p2", "d")).toDF("k", "part", "v"),
      "part", Seq("p2"))
    val ch = store.changes("t", 0, 1)
    assert(ch.select("k", "v", "part", "_change_type").as[(Int, String, String, String)]
      .collect().sorted.toSeq ==
      Seq((3, "c", "p2", "insert"), (4, "d", "p2", "insert")))
    // scan is delta-sized AND partition columns are resolved via basePath
    val files = ch.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("part=p2")),
      s"fast path read beyond the new partition: ${files.mkString(", ")}")
    // REPLACING an existing partition renames its files (fresh UUIDs) →
    // subset check fails → derived diff with the delete+insert pair
    store.overwritePartitions("t",
      Seq((1, "p0", "A2")).toDF("k", "part", "v"), "part", Seq("p0"))
    val slow = store.changes("t", 1, 2)
    assert(slow.filter(col("_change_type") === "delete").count() == 1L)
    assert(slow.filter(col("_change_type") === "insert").count() == 1L)
  }

  test("second concurrent writer fails loudly instead of corrupting a swap") {
    val root = Files.createTempDirectory("graft-lock-").toString
    // fail-fast configuration: no queueing, immediate deadline
    val a = new TableStore(spark, root, lockWaitMs = 0)
    val b = new TableStore(spark, root, lockWaitMs = 0)
    a.overwrite("t", Seq((1, "a")).toDF("id", "v"))

    // writer A holds the lease mid-write (simulated: its lock file exists)
    Files.createFile(java.nio.file.Paths.get(root, ".lock-t"))
    val e = intercept[IllegalStateException] {
      b.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the losing writer changed nothing
    assert(a.read("t").select("v").as[String].head() == "a")

    // admin clears the stale lease; writes proceed again
    assert(a.vacuum() >= 1)
    b.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    assert(a.read("t").select("v").as[String].head() == "b")

    // a completed write always releases its lease
    assert(!Files.exists(java.nio.file.Paths.get(root, ".lock-t")))
  }

  test("a queued writer serializes behind a releasing lease") {
    val root = Files.createTempDirectory("graft-lockq-").toString
    val b = new TableStore(spark, root) // default: 3 s bounded wait
    val lock = java.nio.file.Paths.get(root, ".lock-t")
    Files.createDirectories(java.nio.file.Paths.get(root))
    Files.createFile(lock)
    // the holder releases 400 ms in; the queued writer must then proceed
    val releaser = new Thread(() => {
      Thread.sleep(400); Files.deleteIfExists(lock)
    })
    releaser.start()
    b.overwrite("t", Seq((2, "b")).toDF("id", "v")) // must not throw
    releaser.join()
    assert(b.read("t").select("v").as[String].head() == "b")
    assert(!Files.exists(lock))
  }

  test("a stale lease (dead writer) is broken, not queued behind") {
    val root = Files.createTempDirectory("graft-locks-").toString
    val b = new TableStore(spark, root, lockWaitMs = 0, lockStaleMs = 1000)
    val lock = java.nio.file.Paths.get(root, ".lock-t")
    Files.createDirectories(java.nio.file.Paths.get(root))
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 5000))
    // lockWaitMs=0 would fail immediately were the lease not stale-broken
    b.overwrite("t", Seq((3, "c")).toDF("id", "v"))
    assert(b.read("t").select("v").as[String].head() == "c")
    assert(!Files.exists(lock))
  }

  test("updateWhere: old-value assignment semantics, aligned partitions, versioned") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-upd-").toString)
    val df = Seq((1, 2023, 10.0, 0.0), (2, 2023, 20.0, 0.0),
      (3, 2024, 30.0, 0.0), (4, 2025, 40.0, 0.0))
      .toDF("id", "year", "bal", "old_bal")
    store.overwrite("t", df, partitionBy = Seq("year"))
    val untouchedFile = new java.io.File(s"${store.root}/t/year=2025")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val mtime = untouchedFile.lastModified()

    // both assignments must see the OLD bal (atomic select, not sequential)
    val n = store.updateWhere("t", $"year" === 2023 && $"id" === 2,
      Map("bal" -> ($"bal" + 5), "old_bal" -> $"bal"))
    assert(n == 1)
    val rows = store.read("t").orderBy("id")
      .select("id", "bal", "old_bal").as[(Int, Double, Double)].collect().toSeq
    assert(rows == Seq((1, 10.0, 0.0), (2, 25.0, 20.0), (3, 30.0, 0.0), (4, 40.0, 0.0)))
    // partition-aligned: 2025's file untouched on disk
    assert(untouchedFile.lastModified() == mtime, "untouched partition was rewritten")
    // null condition keeps rows (SQL semantics); unknown column fails loudly
    assert(store.updateWhere("t", lit(null).cast("boolean"), Map("bal" -> lit(0.0))) == 0)
    intercept[IllegalArgumentException] {
      store.updateWhere("t", $"id" === 1, Map("nope" -> lit(1)))
    }
    // assigning the partition column is refused
    intercept[IllegalArgumentException] {
      store.updateWhere("t", $"id" === 1, Map("year" -> lit(2030)))
    }
    // the pre-update state is still time-travel readable
    val v0bal = store.read("t", 0).filter($"id" === 2)
      .select("bal").as[Double].head()
    assert(v0bal == 20.0)
  }

  test("cloneTable: independent content, fresh history, survives source mutation") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-clone-").toString)
    store.overwrite("src", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    store.overwrite("src", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    store.cloneTable("src", "dst")
    assert(store.read("dst").count() == 3)
    assert(store.currentVersion("dst") == 0, "clone must start its own history")
    // mutating (and vacuuming) the source never touches the clone
    store.deleteWhere("src", $"k" === 3)
    store.vacuumVersions("src", 1)
    assert(store.read("dst").count() == 3)
    assert(store.read("src").count() == 2)
    // clone is a first-class table: its own generations from here on
    store.overwrite("dst", store.read("dst").filter($"k" === 1))
    assert(store.read("dst", 0).count() == 3)
    assert(store.read("dst").count() == 1)
    // refusals: missing source, existing target
    intercept[IllegalArgumentException](store.cloneTable("nope", "x"))
    intercept[IllegalArgumentException](store.cloneTable("src", "dst"))
  }

  test("overwriteValidated: clean batch writes, dirty batch rejected whole, zero extra scans") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-check-").toString)
    val constraints = Seq(
      Expectations.expect("k_positive", $"k" > 0),
      Expectations.expect("v_known", $"v".isin("a", "b")))
    store.overwriteValidated("t",
      Seq((1, "a"), (2, "b")).toDF("k", "v"), constraints)
    assert(store.read("t").count() == 2)
    // two violations: nothing written, table untouched, message names both
    val e = intercept[IllegalStateException] {
      store.overwriteValidated("t",
        Seq((0, "a"), (3, "zzz"), (4, "b")).toDF("k", "v"), constraints)
    }
    assert(e.getMessage.contains("k_positive (1 rows)"), e.getMessage)
    assert(e.getMessage.contains("v_known (1 rows)"), e.getMessage)
    assert(store.read("t").count() == 2)
    // null condition counts as a violation (SQL CHECK semantics)
    intercept[IllegalStateException] {
      store.overwriteValidated("t",
        Seq((1, null.asInstanceOf[String])).toDF("k", "v"), constraints)
    }
  }

  test("saveView name cleanup is exact: saving 'b' must not delete view 'a__b'") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-vwn-").toString)
    store.saveView("a__b", "SELECT 1 AS one", 0)
    store.saveView("b", "SELECT 2 AS two", 1)
    store.saveView("b", "SELECT 3 AS three", 2) // replace only 'b'
    assert(store.savedViews.map(_._1).sorted == Seq("a__b", "b"))
    assert(store.savedViews.toMap.apply("a__b") == "SELECT 1 AS one")
    assert(store.savedViews.toMap.apply("b") == "SELECT 3 AS three")
  }

  test("deleteWhere/updateWhere hit rows in the NULL partition too") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-nullpart-").toString)
    val df = Seq((1, Option(2023), "a"), (2, Option(2023), "x"),
      (3, Option.empty[Int], "x"), (4, Option(2024), "b"))
      .toDF("id", "year", "v")
    store.overwrite("t", df, partitionBy = Seq("year"))
    // matches live in year=2023 AND the null partition: both must go
    val n = store.deleteWhere("t", $"v" === "x")
    assert(n === 2)
    assert(store.read("t").select("id").as[Int].collect().sorted.toSeq === Seq(1, 4))
    // same for updates
    store.overwrite("t", df, partitionBy = Seq("year"))
    val u = store.updateWhere("t", $"v" === "x", Map("v" -> lit("y")))
    assert(u === 2)
    assert(store.read("t").filter($"v" === "y").count() === 2)
  }

  test("partition-aligned rewrites shed stale string stats (no wrong-file pruning)") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-stalestat-").toString)
    val df = Seq((1, 2023, "alpha"), (2, 2023, "beta"), (3, 2024, "delta"))
      .toDF("id", "year", "name")
    store.overwrite("t", df, partitionBy = Seq("year"))
    store.analyzeStringColumn("t", "name")
    // aligned rewrite of year=2023 replaces its files -> stats are stale
    store.deleteWhere("t", $"name" === "beta")
    // pruned read must not key off vanished files or miss the new ones
    val names = store.readPrunedString("t", "name", "a", "e")
      .select("name").as[String].collect().sorted.toSeq
    assert(names === Seq("alpha", "delta"))
  }

  test("append adds rows O(new data), versions the prior generation, CDF sees inserts") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-app-").toString)
    store.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // creates
    val gen0Files = Files.list(java.nio.file.Paths.get(store.path("t")))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet")).toSet
    store.append("t", Seq((3L, "c")).toDF("id", "v"))
    // existing files untouched (same names still present), new rows visible
    val nowFiles = Files.list(java.nio.file.Paths.get(store.path("t")))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet")).toSet
    assert(gen0Files.subsetOf(nowFiles))
    assert(store.read("t").as[(Long, String)].collect().sortBy(_._1).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel: generation 0 still reads the pre-append rows
    assert(store.read("t", 0).count() === 2)
    // CDF: the append is pure inserts
    val ch = store.changes("t", 0, 1)
      .select($"_change_type", $"id").as[(String, Long)].collect().toSeq
    assert(ch === Seq(("insert", 3L)))
  }

  test("append refuses partitioned tables and mismatched schemas") {
    val store = new TableStore(spark, Files.createTempDirectory("graft-appg-").toString)
    store.overwrite("p", Seq((2023, 1L)).toDF("year", "id"), partitionBy = Seq("year"))
    val e1 = intercept[IllegalArgumentException] {
      store.append("p", Seq((2024, 2L)).toDF("year", "id"))
    }
    assert(e1.getMessage.contains("unpartitioned"))
    store.overwrite("t", Seq((1L, "a")).toDF("id", "v"))
    val e2 = intercept[IllegalArgumentException] {
      store.append("t", Seq((2L, "b", 1.0)).toDF("id", "v", "extra"))
    }
    assert(e2.getMessage.contains("schema mismatch"))
    // same names, retyped column: mixed-type parquet files would brick
    // the generation at scan time — refuse up front
    val e3 = intercept[IllegalArgumentException] {
      store.append("t", Seq((2L, 3.5)).toDF("id", "v"))
    }
    assert(e3.getMessage.contains("schema mismatch"))
    // the refused appends left no torn state behind
    assert(store.read("t").as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    val leftovers = Files.list(java.nio.file.Paths.get(store.root))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith(".tmp")).toSeq
    assert(leftovers.isEmpty, s"staged leftovers: $leftovers")
  }
}
