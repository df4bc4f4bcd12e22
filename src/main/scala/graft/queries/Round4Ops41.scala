package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 41: dynamic partition pruning and tokenizer vocabulary
  * coverage.
  */
object Round4Ops41 {

  /** Dynamic partition pruning: the fact table is partitioned on the
    * join key; the dimension's filter is only known at RUNTIME, so the
    * optimizer injects a subquery that prunes fact PARTITIONS before
    * the scan — the feature that makes star joins over partitioned
    * 100 TB facts read 1/N of the data. Plan-guarded in PlanSpec
    * (`dynamicpruning` present); here the oracle pins result equality.
    */
  val j22_dynamic_partition_pruning = OpQuery(
    "j22_dynamic_partition_pruning",
    """WITH dim AS (
      |  SELECT DISTINCT event_type, length(event_type) AS type_len
      |  FROM events WHERE event_type IN ('purchase', 'signup'))
      |SELECT e.event_type, CAST(d.type_len AS INT) AS type_len,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY e.event_type, d.type_len
      |ORDER BY e.event_type""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
    val base = graft.queries.GateScratch.dir("graft-dpp-").toString
    events.select("event_id", "user_id", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    val fact = spark.read.parquet(base)
    val dim = events.filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_type"), length(col("event_type")).as("type_len"))
      .distinct()
    fact.join(dim, "event_type")
      .groupBy(col("event_type"), col("type_len").cast("int").as("type_len"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("event_type")
  }

  /** Vocabulary coverage curve: what share of all token occurrences the
    * top-k vocabulary covers (k = 10/100/1000) — the curve that sizes a
    * tokenizer's vocab. Rank + prefix sum over the term-frequency
    * table (dimension-sized after the one corpus aggregate).
    */
  val text_vocab_coverage = OpQuery(
    "text_vocab_coverage",
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term FROM documents),
      |freqs AS (SELECT term, COUNT(*) AS f FROM toks WHERE term <> '' GROUP BY term),
      |ranked AS (
      |  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS rk,
      |         SUM(f) OVER (ORDER BY f DESC, term
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM freqs),
      |tot AS (SELECT SUM(f) AS t FROM freqs)
      |SELECT CAST(k.k AS INT) AS vocab_size,
      |       CAST(ROUND(CAST(max(r.cum) AS DOUBLE) / max(tot.t), 6) AS DOUBLE) AS coverage
      |FROM (SELECT unnest([10, 100, 1000]) AS k) k
      |JOIN ranked r ON r.rk <= k.k
      |CROSS JOIN tot
      |GROUP BY k.k
      |ORDER BY vocab_size""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_vc_docs")
    spark.sql(
      """WITH toks AS (
        |  SELECT explode(split(lower(trim(text)), '\\s+')) AS term FROM graft_vc_docs),
        |freqs AS (SELECT term, COUNT(*) AS f FROM toks WHERE term <> '' GROUP BY term),
        |ranked AS (
        |  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS rk,
        |         SUM(f) OVER (ORDER BY f DESC, term
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM freqs),
        |tot AS (SELECT SUM(f) AS t FROM freqs)
        |SELECT CAST(k.k AS INT) AS vocab_size,
        |       CAST(ROUND(CAST(max(r.cum) AS DOUBLE) / max(tot.t), 6) AS DOUBLE) AS coverage
        |FROM (SELECT explode(array(10, 100, 1000)) AS k) k
        |JOIN ranked r ON r.rk <= k.k
        |CROSS JOIN tot
        |GROUP BY k.k
        |ORDER BY vocab_size""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(j22_dynamic_partition_pruning, text_vocab_coverage)
}
