package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end storage lifecycle: the Delta-parity features must COMPOSE,
  * not just pass in isolation — initial load, incremental merge, schema
  * evolution, clustered compaction, time travel, CDC, restore, and
  * vacuum over one table, verifying each generation stays readable and
  * correct as the next feature mutates the table.
  */
class LakehouseLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("write → merge → evolve → cluster → time-travel → cdc → restore → vacuum") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-life-").toString, retainVersions = 10)

    // v0: initial partitioned load
    store.overwrite("sales",
      Seq((1, 2023, 10.0), (2, 2023, 20.0), (3, 2024, 30.0))
        .toDF("k", "year", "amount"),
      partitionBy = Seq("year"))

    // v1: partition-aligned incremental merge (2024 only)
    Merge.insertOnlyPartitionAligned(store, "sales",
      Seq((4, 2024, 40.0)).toDF("k", "year", "amount"),
      keys = Seq("k"), partCol = "year")

    // v2: schema evolution — source grew a channel column
    Merge.mergeInto(store, "sales",
      Seq((5, 2024, 50.0, "web")).toDF("k", "year", "amount", "channel"),
      keys = Seq("k"), partitionBy = Seq("year"), evolveSchema = true)

    // v3: clustered compaction preserves the year= layout
    store.compactClustered("sales", Seq("k", "amount"), numFiles = 2,
      rankBased = true)
    val dirs = new java.io.File(store.path("sales")).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("year=2023", "year=2024"),
      "clustered compaction flattened the partition layout")
    // ... and a partition-aligned merge still works AFTER clustering
    Merge.insertOnlyPartitionAligned(store, "sales",
      Seq((6, 2023, 60.0)).toDF("k", "year", "amount"),
      keys = Seq("k"), partCol = "year")

    // every generation readable; content of each pinned
    assert(store.versions("sales") == Seq(0, 1, 2, 3, 4))
    assert(store.read("sales", 0).count() == 3)
    assert(store.read("sales", 1).count() == 4)
    assert(store.read("sales", 2).count() == 5)
    assert(store.read("sales", 2).columns.contains("channel"))
    assert(store.read("sales").count() == 6)

    // CDC across the evolve step: exactly the one inserted row
    // (schemas differ across v1/v2 — diff on the common columns)
    val delta = store.changes("sales", 1, 2)
    val ins = delta.filter($"_change_type" === "insert")
      .select("k").as[Int].collect().toSeq
    assert(ins == Seq(5))

    // v5: UPDATE DML composes with the evolved + clustered table —
    // partition-aligned (only year=2024 rewritten) and versioned
    store.updateWhere("sales", $"k" === 5, Map("channel" -> lit("store")))
    assert(store.read("sales").filter($"k" === 5)
      .select("channel").as[String].head() == "store")
    assert(store.read("sales", 4).filter($"k" === 5)
      .select("channel").as[String].head() == "web") // pre-update readable
    assert(store.partitionColumns("sales") == Seq("year"),
      "updateWhere flattened the partition layout")

    // v6: DELETE DML drops a 2023 row, 2024 partition untouched
    assert(store.deleteWhere("sales", $"k" === 6) == 1L)
    assert(store.read("sales").count() == 5)

    // restore v1: non-destructive — v7 becomes current with v1's content
    store.restoreVersion("sales", 1)
    assert(store.currentVersion("sales") == 7)
    assert(store.read("sales").count() == 4)
    assert(!store.read("sales").columns.contains("channel"))
    assert(store.read("sales", 6).count() == 5) // pre-restore still readable

    // history reflects all eight generations; vacuum trims to the last two
    assert(store.history("sales").count() == 8)
    assert(store.vacuumVersions("sales", 2) == 5)
    assert(store.versions("sales") == Seq(5, 6, 7))
    val e = intercept[IllegalArgumentException](store.read("sales", 0))
    assert(e.getMessage.contains("available"))
  }

  test("scd2 dimension maintained THROUGH the store: history survives merges and travel") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-life2-").toString, retainVersions = 10)
    val d0 = Seq((1, "a", "2023-01-01", null.asInstanceOf[String], true),
      (2, "b", "2023-01-01", null.asInstanceOf[String], true))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    store.overwrite("dim", d0)

    // load 1: k=1 changes, k=3 new
    store.overwrite("dim", Merge.scd2(store.read("dim"),
      Seq((1, "a2"), (2, "b"), (3, "c")).toDF("k", "v"),
      Seq("k"), Seq("v"), "2024-01-01"))
    // load 2: k=3 changes
    store.overwrite("dim", Merge.scd2(store.read("dim"),
      Seq((1, "a2"), (2, "b"), (3, "c2")).toDF("k", "v"),
      Seq("k"), Seq("v"), "2025-01-01"))

    val cur = store.read("dim").filter($"is_current")
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(cur == Set((1, "a2"), (2, "b"), (3, "c2")))
    // full history: k=1 has 2 versions, k=3 has 2, k=2 has 1
    val counts = store.read("dim").groupBy("k").count()
      .as[(Int, Long)].collect().toMap
    assert(counts == Map(1 -> 2L, 2 -> 1L, 3 -> 2L))
    // the dimension AS OF load 1 is still queryable through time travel
    val v1cur = store.read("dim", 1).filter($"is_current")
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(v1cur == Set((1, "a2"), (2, "b"), (3, "c")))
  }
}
