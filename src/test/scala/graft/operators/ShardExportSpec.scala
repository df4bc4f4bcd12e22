package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  test("shard assignment is deterministic and size-bounded") {
    val target = 10000L
    val a1 = ShardExport.assignShards(docs, "doc_id", "n_chars", target)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = ShardExport.assignShards(docs, "doc_id", "n_chars", target)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 == a2, "same corpus must shard identically run-over-run")

    val m = ShardExport.manifest(
      ShardExport.assignShards(docs, "doc_id", "n_chars", target), "n_chars")
      .collect()
    val maxDoc = docs.agg(max(col("n_chars"))).head.getLong(0)
    val shards = m.map(_.getLong(0))
    assert(shards.toSeq == (shards.min to shards.max).toSeq,
      "shard ids must be contiguous")
    // every shard except the last starts a doc past the target boundary,
    // so it holds > target - maxDoc and overflows by < maxDoc
    m.dropRight(1).foreach { r =>
      val total = r.getLong(2)
      assert(total > target - maxDoc && total < target + maxDoc,
        s"shard ${r.getLong(0)} total $total outside (${target - maxDoc}, ${target + maxDoc})")
    }
  }

  test("assignment equals the single-reducer window form bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val target = 10000L
    val fast = ShardExport.assignShards(docs, "doc_id", "n_chars", target)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = docs
      .withColumn("__k", md5(col("doc_id").cast("string")))
      .withColumn("__pfx", sum(col("n_chars")).over(
        Window.orderBy(col("__k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("shard",
        floor((col("__pfx") - col("n_chars")) / lit(target)).cast("long"))
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive,
      "two-phase prefix assignment must equal the global-window definition")

    // and the doc-granularity windows in the distributed plan are all
    // partition-local (the TotalOrder shape — no table-sized global sort)
    val df = ShardExport.assignShards(docs, "doc_id", "n_chars", target)
    df.collect()
    val windows = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.forall(w => !w.contains("windowspecdefinition(") ||
      w.contains("__pid")),
      s"found a doc-granularity window not partitioned by __pid:\n${windows.mkString("\n")}")
  }

  test("writeShards lays out one directory per shard with matching manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val assigned = ShardExport.assignShards(docs, "doc_id", "n_chars", 20000L)
    val manifest = ShardExport.writeShards(assigned, "n_chars", out).collect()
    val written = spark.read.parquet(out)
    assert(written.count() == docs.count())
    // partition-directory columns read back with inferred (int) type
    val perShard = written.groupBy(col("shard").cast("long").as("shard"))
      .count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    manifest.foreach { r =>
      assert(perShard(r.getLong(0)) == r.getLong(1),
        s"shard ${r.getLong(0)} row count mismatch")
    }
    // shard docs are recoverable in deterministic order from the payload
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == manifest.length)
  }

  test("in-file row order inside each shard is the md5 order, byte-stable across runs") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 400L).map(i => (i, 50L + i % 37)).toDF("doc_id", "cost")
    def writeOnce(layout: org.apache.spark.sql.DataFrame): (String, Seq[Seq[Long]]) = {
      val out = java.nio.file.Files.createTempDirectory("graft-shard-ord-").toString
      ShardExport.writeShards(
        ShardExport.assignShards(layout, "doc_id", "cost", targetCost = 1000L),
        "cost", out)
      // one file per shard (repartition on the shard column) — a
      // single-file scan preserves in-file row order
      val dirs = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      val orders = dirs.toSeq.map { d =>
        spark.read.parquet(d.toString).select("doc_id")
          .collect().map(_.getLong(0)).toSeq
      }
      (out, orders)
    }
    val (_, o1) = writeOnce(docs)
    val (_, o2) = writeOnce(docs.repartition(7)) // different input layout
    assert(o1 === o2, "in-file order changed across runs/layouts")
    // and it IS the md5 order within each shard
    val md5Order = docs.withColumn("k", md5(col("doc_id").cast("string")))
      .orderBy("k").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(o1.flatten.toSet === md5Order.toSet)
    o1.foreach { shardSeq =>
      val positions = shardSeq.map(md5Order.indexOf)
      assert(positions === positions.sorted, "shard rows not in md5 order")
    }
  }

  test("null costs count as zero instead of poisoning the shard id") {
    val docs = Seq((1L, Some(500L)), (2L, None), (3L, Some(500L)), (4L, Some(10L)))
      .toDF("doc_id", "cost")
    val assigned = ShardExport.assignShards(docs, "doc_id", "cost", 600L)
    assert(assigned.filter(col("shard").isNull).count() === 0)
    assert(assigned.count() === 4)
  }
}
