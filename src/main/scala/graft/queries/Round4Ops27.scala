package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.VectorExprs

/** Round-4 batch 27: maximum-inner-product search via the norm
  * augmentation trick, storage-codec round trips, freshness SLA
  * reporting, and rolling-fence outlier detection.
  */
object Round4Ops27 {

  /** MIPS → cosine reduction (the norm trick): augment every corpus
    * vector with √(M²−‖x‖²) (M = max corpus norm) and queries with 0;
    * cosine ranking in the augmented space IS inner-product ranking in
    * the original. The gate ranks by the augmented cosine while the
    * oracle ranks by the raw dot product — a hash match proves the
    * reduction, not just the arithmetic. Corpus-side work is map-only
    * against broadcast queries + the broadcast scalar M; ranking uses
    * per-query partitions.
    */
  val sim_mips_topk = OpQuery(
    "sim_mips_topk",
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
      |scored AS (
      |  SELECT q.qid, e.vec_id,
      |         list_dot_product(
      |           list_transform(q.qe, x -> CAST(x AS DOUBLE)),
      |           list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS dot
      |  FROM embeddings e, q),
      |ranked AS (
      |  SELECT qid, vec_id, dot,
      |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rk
      |  FROM scored)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS INT) AS rk,
      |       CAST(vec_id AS BIGINT) AS vec_id,
      |       CAST(ROUND(dot, 5) AS DOUBLE) AS dot
      |FROM ranked WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin) { (spark, dir) =>
    VectorExprs.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      VectorExprs.vecNorm(col("embedding")).as("nrm"))
    val mDf = withNorm.agg(max(col("nrm")).as("m"))
    // augmented corpus: [x, sqrt(M^2 - ||x||^2)]
    val aug = withNorm.crossJoin(broadcast(mDf))
      .select(col("vec_id"), col("embedding"),
        concat(
          transform(col("embedding"), x => x.cast("double")),
          array(sqrt(col("m") * col("m") - col("nrm") * col("nrm"))))
          .as("aug"))
    val queries = aug.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        concat(transform(col("embedding"), x => x.cast("double")),
          array(lit(0.0))).as("qaug"))
    val scored = aug.join(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        VectorExprs.vecCosine(col("aug"), col("qaug")).as("cos_aug"),
        VectorExprs.vecDot(col("embedding"), col("qe")).as("dot"))
    // rank by the AUGMENTED cosine (the trick); emit the raw dot —
    // the oracle's dot-ranked answer only matches if the reduction holds
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_aug").desc, col("vec_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid").cast("long").as("qid"), col("rk").cast("int").as("rk"),
        col("vec_id").cast("long").as("vec_id"),
        round(col("dot"), 5).cast("double").as("dot"))
      .orderBy("qid", "rk")
  }

  /** Storage-codec round trip: the same table written as zstd, snappy,
    * and gzip parquet must read back byte-identical (count + order-free
    * content checksum per codec). At 100 TB the codec choice is a
    * first-order cost decision; this pins that it is content-neutral.
    */
  val s27_parquet_codecs = OpQuery(
    "s27_parquet_codecs",
    """SELECT c.codec,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS content_sum
      |FROM documents, (SELECT unnest(['gzip', 'snappy', 'zstd']) AS codec) c
      |GROUP BY c.codec
      |ORDER BY c.codec""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val base = graft.queries.GateScratch.dir("graft-codec-").toString
    Seq("gzip", "snappy", "zstd").foreach { c =>
      docs.write.mode("overwrite").option("compression", c).parquet(s"$base/$c")
    }
    val read = Seq("gzip", "snappy", "zstd").map { c =>
      spark.read.parquet(s"$base/$c").select(lit(c).as("codec"), col("text"))
    }.reduce(_ unionByName _)
    read.groupBy("codec")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .cast("long").as("content_sum"))
      .orderBy("codec")
  }

  /** Freshness SLA report: per-source staleness against the corpus
    * high-water mark in whole minutes (floor-divided epoch seconds, so
    * the lag is exact on both engines) — the observability query every
    * ingest pipeline alerts on.
    */
  val dq_freshness = OpQuery(
    "dq_freshness",
    """WITH hw AS (SELECT MAX(ts) AS corpus_max FROM events),
      |per AS (
      |  SELECT event_type, MAX(ts) AS last_seen, COUNT(*) AS n
      |  FROM events GROUP BY event_type)
      |SELECT event_type,
      |       strftime(last_seen, '%Y-%m-%d %H:%M:%S') AS last_seen,
      |       CAST((epoch(corpus_max)::BIGINT - epoch(last_seen)::BIGINT) // 60 AS BIGINT) AS minutes_stale,
      |       CAST(n AS BIGINT) AS n
      |FROM per, hw
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_fresh_events")
    spark.sql(
      """WITH hw AS (SELECT MAX(ts) AS corpus_max FROM graft_fresh_events),
        |per AS (
        |  SELECT event_type, MAX(ts) AS last_seen, COUNT(*) AS n
        |  FROM graft_fresh_events GROUP BY event_type)
        |SELECT event_type,
        |       date_format(last_seen, 'yyyy-MM-dd HH:mm:ss') AS last_seen,
        |       CAST((unix_timestamp(corpus_max) - unix_timestamp(last_seen)) DIV 60 AS BIGINT) AS minutes_stale,
        |       CAST(n AS BIGINT) AS n
        |FROM per, hw
        |ORDER BY event_type""".stripMargin)
  }

  /** Rolling-fence outlier detection (Hampel-style with IQR fences):
    * centered 7-day rolling median and quartiles per event type, flag
    * days outside median ± 3·IQR. Window quantiles over integer counts
    * interpolate identically on both engines; one event-type-keyed
    * window carries all three quantiles.
    */
  val ts_hampel = OpQuery(
    "ts_hampel",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
      |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
      |fenced AS (
      |  SELECT event_type, d, c,
      |         quantile_cont(c, 0.5) OVER w AS med,
      |         quantile_cont(c, 0.75) OVER w - quantile_cont(c, 0.25) OVER w AS iqr
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY d
      |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, CAST(c AS BIGINT) AS c,
      |       CAST(ROUND(med, 2) AS DOUBLE) AS rolling_median,
      |       CAST(ROUND(iqr, 2) AS DOUBLE) AS rolling_iqr
      |FROM fenced
      |WHERE abs(c - med) > 3 * iqr AND iqr > 0
      |ORDER BY event_type, day""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_hampel_events")
    spark.sql(
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
        |  FROM graft_hampel_events GROUP BY event_type, CAST(ts AS DATE)),
        |fenced AS (
        |  SELECT event_type, d, c,
        |         percentile(c, 0.5) OVER w AS med,
        |         percentile(c, 0.75) OVER w - percentile(c, 0.25) OVER w AS iqr
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        |SELECT event_type, date_format(d, 'yyyy-MM-dd') AS day, CAST(c AS BIGINT) AS c,
        |       CAST(ROUND(med, 2) AS DOUBLE) AS rolling_median,
        |       CAST(ROUND(iqr, 2) AS DOUBLE) AS rolling_iqr
        |FROM fenced
        |WHERE abs(c - med) > 3 * iqr AND iqr > 0
        |ORDER BY event_type, day""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(
    sim_mips_topk, s27_parquet_codecs, dq_freshness, ts_hampel)
}
