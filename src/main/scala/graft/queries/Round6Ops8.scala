package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 batch 8: near-dup detection ON INGEST, gated through the
  * REAL streaming path — not the batch shadow. The documents slice is
  * replayed as a 3-micro-batch file-source stream into
  * [[graft.streaming.StreamingDedup.nearDupPairs]] (transformWithState,
  * RocksDB-backed bucket state), and at the recall-saturating tuning
  * (16 bands × 2 rows over 32 hashes, estimate margin 0.35 — the
  * dedup_minhash_verified settings) the streamed pair set equals the
  * exhaustive jaccard join, which DuckDB computes directly. Same slice,
  * same oracle as `dedup_minhash_verified`: the two gates together pin
  * streaming ≡ batch ≡ ground truth.
  */
object Round6Ops8 {

  val dedup_streaming_ingest = OpQuery(
    "dedup_streaming_ingest",
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
      |), toks AS (
      |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
      |  FROM docs
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS set_size FROM toks GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id1, id2,
      |       CAST(ROUND(n_inter * 1.0 / (s1.set_size + s2.set_size - n_inter), 6) AS DOUBLE) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON id1 = s1.doc_id
      |JOIN sizes s2 ON id2 = s2.doc_id
      |WHERE n_inter * 1.0 / (s1.set_size + s2.set_size - n_inter) >= 0.9
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
    // land the slice as 3 files; maxFilesPerTrigger=1 makes each file a
    // micro-batch, so pairs must survive cross-batch bucket state
    val landing = graft.queries.GateScratch.dir("graft-sdi-").toString
    docs.repartition(3).write.mode("overwrite").parquet(landing)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
      val pairs = graft.streaming.StreamingDedup.nearDupPairs(
        stream, numHashes = 32, bands = 16, threshold = 0.9, estMargin = 0.35)
      val name = s"sdi${System.nanoTime()}"
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name)
        .withColumn("jaccard", round(col("jaccard"), 6).cast("double"))
        .orderBy(col("id1"), col("id2"))
    } finally before.fold(spark.conf.unset(providerKey))(
      spark.conf.set(providerKey, _))
  }

  val all: Seq[OpQuery] = Seq(dedup_streaming_ingest)
}
