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

    // restore v1: non-destructive — v5 becomes current with v1's content
    store.restoreVersion("sales", 1)
    assert(store.currentVersion("sales") == 5)
    assert(store.read("sales").count() == 4)
    assert(!store.read("sales").columns.contains("channel"))
    assert(store.read("sales", 4).count() == 6) // pre-restore still readable

    // history reflects all six generations; vacuum trims to the last two
    assert(store.history("sales").count() == 6)
    assert(store.vacuumVersions("sales", 2) == 3)
    assert(store.versions("sales") == Seq(3, 4, 5))
    val e = intercept[IllegalArgumentException](store.read("sales", 0))
    assert(e.getMessage.contains("available"))
  }
}
