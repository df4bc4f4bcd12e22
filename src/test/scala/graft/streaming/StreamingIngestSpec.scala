package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IncrementalAgg, Merge, TableStore}

/** Streaming ingestion into the medallion store: foreachBatch applies
  * the same insert-only MERGE the batch pipeline uses, so late/replayed
  * micro-batches are idempotent — the streaming bronze layer.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch + insert-only merge: streaming upsert is exactly-once-ish") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft-sink-").toString)
    val mem = MemoryStream[(Long, String)]

    val q = mem.toDF().toDF("row_key", "payload")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Merge.mergeInto(store, "stream_bronze", batch, Seq("row_key"))
      }
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(store.read("stream_bronze").count() == 2)
      // replay of key 2 (changed payload) + new key 3: insert-only keeps 2's original
      mem.addData((2L, "CHANGED"), (3L, "c"))
      q.processAllAvailable()
      val rows = store.read("stream_bronze").orderBy("row_key")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("streaming gold maintenance: per-batch CDC delta keeps the aggregate exact") {
    // the full composition: each micro-batch merges into a VERSIONED base
    // (one generation per batch), and the gold aggregate is refreshed
    // from that generation's CDC delta — never a full re-aggregation
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-gold-").toString, retainVersions = 10)
    val mem = MemoryStream[(Long, String, Double)]

    val q = mem.toDF().toDF("k", "g", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!store.exists("base")) {
          store.overwrite("base", batch)
          store.overwrite("gold",
            IncrementalAgg.fullAggregate(store.read("base"), Seq("g"), "v"))
        } else {
          val from = store.currentVersion("base")
          Merge.mergeInto(store, "base", batch, Seq("k"))
          IncrementalAgg.refresh(store, "gold", "base",
            from, store.currentVersion("base"), Seq("g"), "v")
        }
      }
      .start()
    try {
      mem.addData((1L, "x", 10.0), (2L, "y", 20.0))
      q.processAllAvailable()
      mem.addData((3L, "x", 5.0), (2L, "y", 999.0)) // replay of key 2 ignored
      q.processAllAvailable()
      mem.addData((4L, "z", 7.0))
      q.processAllAvailable()

      val gold = store.read("gold").orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(2).doubleValue())).toSeq
      assert(gold == Seq(("x", 2L, 15.0), ("y", 1L, 20.0), ("z", 1L, 7.0)))
      // invariant: incremental gold == full re-agg of the final base
      val full = IncrementalAgg.fullAggregate(store.read("base"), Seq("g"), "v")
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue())).toSeq
      assert(gold == full)
    } finally q.stop()
  }

  test("streaming SCD1 upsert: updates apply in order, stale replays are skipped by the ledger") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("graft-scd1s-").toString)
    val mem = MemoryStream[(Long, String)]

    val q = EventStreams.streamingScd1Upsert(
      mem.toDF().toDF("row_key", "payload"), store, "stream_silver",
      Seq("row_key"), Seq("payload"), appId = "ingest-a")
    try {
      mem.addData((1L, "v1"), (2L, "v1"))
      q.processAllAvailable()
      mem.addData((2L, "v2"), (3L, "v1")) // update 2, insert 3
      q.processAllAvailable()
      val rows = store.read("stream_silver").orderBy("row_key")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "v1"), (2L, "v2"), (3L, "v1")))
      assert(store.lastCommittedBatch("stream_silver", "ingest-a") == 1L)

      // a stale replay of batch 0 (as checkpoint recovery would deliver it)
      // must NOT clobber key 2 back to v1
      val batch0 = Seq((1L, "v1"), (2L, "v1")).toDF("row_key", "payload")
      val ran = store.commitIfNew("stream_silver", "ingest-a", 0L) {
        Merge.mergeInto(store, "stream_silver", batch0, Seq("row_key"), Seq("payload"))
      }
      assert(!ran)
      assert(store.read("stream_silver").orderBy("row_key")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "v1"), (2L, "v2"), (3L, "v1")))

      // a DIFFERENT appId has its own ledger: same batch id runs there
      assert(store.lastCommittedBatch("stream_silver", "other-app") == -1L)
    } finally q.stop()
  }

  test("AvailableNow file ingest: each run drains only files new since the checkpoint") {
    val src = Files.createTempDirectory("graft-avnow-src-").toString
    val chk = Files.createTempDirectory("graft-avnow-chk-").toString
    val schema = Seq((0L, "")).toDF("k", "v").schema

    // a deliberately NON-idempotent sink: raw row append. Exactly-once
    // must come from the checkpoint, not from sink dedup.
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def run(): Unit = EventStreams.ingestFilesAvailableNow(
        spark, src, schema, chk) { batch =>
      seen ++= batch.collect().map(r => (r.getLong(0), r.getString(1)))
    }

    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    run()
    assert(seen.sorted == Seq((1L, "a"), (2L, "b")))

    // second batch of files lands; same checkpoint → only the delta
    Seq((3L, "c")).toDF("k", "v").coalesce(1).write.mode("append").parquet(src)
    run()
    assert(seen.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // nothing new: the run terminates without re-emitting anything
    run()
    assert(seen.size == 3)
  }
}
