package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Merge, TableStore}

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
}
