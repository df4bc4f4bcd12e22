package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the bloom-sidecar point-lookup skipping: no false negatives on
  * sampled keys, real file-count reduction on range-clustered layouts,
  * string-key support through the xxhash64 convention, fallback-to-
  * correct when stats are absent or shed, and empty-result short
  * circuit for absent keys.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def freshStore(): TableStore = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-bloomskip-").toString)

  test("equality reads match the plain filter for every sampled key, and prune files") {
    val store = freshStore()
    val orders = Tables.load(spark, sf, "orders")
      .repartitionByRange(16, col("o_custkey"))
    store.overwrite("o", orders)
    store.analyzeBloomColumn("o", "o_custkey", expectedPerFile = 10000L)
    val keys = store.read("o").select($"o_custkey").distinct()
      .orderBy($"o_custkey").limit(20).as[Long].collect()
    val totalFiles = new java.io.File(store.path("o")).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    keys.foreach { k =>
      val pruned = store.readPrunedEquals("o", "o_custkey", k).count()
      val full = store.read("o").filter($"o_custkey" === k).count()
      assert(pruned == full && full > 0, s"key $k: $pruned vs $full")
    }
    // range-clustered layout: a point lookup schedules FAR fewer files
    val scheduled = keys.map(k => store.prunedEqualsFileCount("o", "o_custkey", k))
    assert(scheduled.max < totalFiles,
      s"no pruning at all: ${scheduled.toSeq} of $totalFiles")
    assert(scheduled.sum.toDouble / keys.length <= totalFiles / 4.0,
      s"pruning too weak on clustered data: mean ${scheduled.sum / keys.length} of $totalFiles")
  }

  test("string keys prune through the xxhash64 convention") {
    val store = freshStore()
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source", $"text")
      .repartitionByRange(8, $"doc_id")
    store.overwrite("d", docs)
    store.analyzeBloomColumn("d", "text", expectedPerFile = 10000L)
    // a unique document text lives in one file: lookup must return it
    // and schedule ~1 file
    val probe = store.read("d").filter($"doc_id" === 7L)
      .select($"text").as[String].head()
    val hits = store.readPrunedEquals("d", "text", probe)
    assert(hits.count() == store.read("d").filter($"text" === probe).count())
    assert(store.prunedEqualsFileCount("d", "text", probe) <= 2)
  }

  test("absent key short-circuits to zero rows; absent stats fall back to plain read") {
    val store = freshStore()
    val orders = Tables.load(spark, sf, "orders")
      .repartitionByRange(8, col("o_custkey"))
    store.overwrite("o", orders)
    // no ANALYZE yet: plain read, still correct
    assert(store.readPrunedEquals("o", "o_custkey", 1L).count() ==
      store.read("o").filter($"o_custkey" === 1L).count())
    intercept[RuntimeException] { store.prunedEqualsFileCount("o", "o_custkey", 1L) }
    store.analyzeBloomColumn("o", "o_custkey", expectedPerFile = 10000L)
    // a key far outside the domain: bloom rules out every file
    assert(store.readPrunedEquals("o", "o_custkey", -987654321L).count() == 0)
  }

  test("live sidecar on a Hive-partitioned table: pruned read keeps the partition column") {
    val store = freshStore()
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    store.overwrite("o", orders, partitionBy = Seq("o_orderpriority"))
    store.analyzeBloomColumn("o", "o_custkey", expectedPerFile = 10000L)
    // the sidecar must store partition-subdir-relative paths: a bare
    // basename resolves against the table root and the read throws
    val keys = store.read("o").select($"o_custkey").distinct()
      .orderBy($"o_custkey").limit(10).as[Long].collect()
    keys.foreach { k =>
      val pruned = store.readPrunedEquals("o", "o_custkey", k)
      // partition column survives the file-list read (basePath)
      assert(pruned.columns.contains("o_orderpriority"))
      val expected = store.read("o").filter($"o_custkey" === k)
        .select($"o_orderkey", $"o_orderpriority").orderBy($"o_orderkey")
        .collect().toSeq
      val got = pruned.select($"o_orderkey", $"o_orderpriority")
        .orderBy($"o_orderkey").collect().toSeq
      assert(got == expected, s"key $k")
    }
    // string zone-map sidecar takes the same path
    store.analyzeStringColumn("o", "o_orderpriority")
    val viaStats = store.readPrunedString("o", "o_orderpriority",
      "1-URGENT", "1-URGENT")
    assert(viaStats.count() ==
      store.read("o").filter($"o_orderpriority" === "1-URGENT").count())
  }

  test("ANALYZE on an empty table yields an empty keep set, not a parse error") {
    val store = freshStore()
    val empty = Tables.load(spark, sf, "orders").filter(lit(false))
      .select($"o_orderkey", $"o_custkey")
    store.overwrite("e", empty)
    store.analyzeBloomColumn("e", "o_custkey", expectedPerFile = 100L)
    // empty generation: pruning everything is the right answer, and the
    // blank sidecar line must not MatchError
    assert(store.readPrunedEquals("e", "o_custkey", 1L).count() == 0)
    assert(store.prunedEqualsFileCount("e", "o_custkey", 1L) == 0)
  }

  test("partition-aligned rewrites shed bloom sidecars (no stale-file pruning)") {
    val store = freshStore()
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    store.overwrite("o", orders, partitionBy = Seq("o_orderpriority"))
    store.analyzeBloomColumn("o", "o_custkey", expectedPerFile = 10000L)
    assert(store.prunedEqualsFileCount("o", "o_custkey", 1L) >= 0)
    // rewrite one partition in place: the sidecar keys off file names
    // that no longer exist and MUST be shed
    val urgent = store.read("o").filter($"o_orderpriority" === "1-URGENT")
    store.overwritePartitions("o", urgent, "o_orderpriority", Seq("1-URGENT"))
    intercept[RuntimeException] { store.prunedEqualsFileCount("o", "o_custkey", 1L) }
    // and the read falls back to plain-but-correct
    assert(store.readPrunedEquals("o", "o_custkey", 1L).count() ==
      store.read("o").filter($"o_custkey" === 1L).count())
  }
}
