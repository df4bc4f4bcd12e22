package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 66: classifier evaluation — confusion matrix with
  * precision/recall/F1, rank-based AUC, and calibration bins. The
  * "model" is pinned deterministically from the data itself (score =
  * first embedding component, label = label % 2) so the metrics are
  * exactly reproducible on any engine.
  */
object Round4Ops66 {

  private val scoredView =
    """SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
      |       CAST(label % 2 AS INT) AS y
      |FROM embeddings""".stripMargin

  /** Confusion matrix + derived metrics at threshold 0: a single
    * aggregation pass (four conditional counts), no shuffle beyond the
    * one global reduce — the evaluation loop you run after every
    * training epoch.
    */
  val eval_confusion = OpQuery(
    "eval_confusion",
    s"""WITH scored AS ($scoredView),
       |m AS (
       |  SELECT SUM(CASE WHEN score > 0 AND y = 1 THEN 1 ELSE 0 END) AS tp,
       |         SUM(CASE WHEN score > 0 AND y = 0 THEN 1 ELSE 0 END) AS fp,
       |         SUM(CASE WHEN score <= 0 AND y = 1 THEN 1 ELSE 0 END) AS fn,
       |         SUM(CASE WHEN score <= 0 AND y = 0 THEN 1 ELSE 0 END) AS tn
       |  FROM scored)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |       CAST(ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS DOUBLE) AS precision,
       |       CAST(ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS DOUBLE) AS recall,
       |       CAST(ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS DOUBLE) AS f1
       |FROM m""".stripMargin) { (spark, dir) =>
    val scored = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("score"),
        (col("label") % 2).cast("int").as("y"))
    scored.agg(
        sum(when(col("score") > 0 && col("y") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("score") > 0 && col("y") === 0, 1).otherwise(0)).as("fp"),
        sum(when(col("score") <= 0 && col("y") === 1, 1).otherwise(0)).as("fn"),
        sum(when(col("score") <= 0 && col("y") === 0, 1).otherwise(0)).as("tn"))
      .select(col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .cast("double").as("precision"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
          .cast("double").as("recall"),
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 6)
          .cast("double").as("f1"))
  }

  /** ROC AUC via the Mann–Whitney rank formula: AUC = (Σ rank⁺ −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻), ranks by (score, vec_id) so the value is
    * pinned even under score ties. One global sort (the rank window) +
    * one reduce — integer arithmetic until the final division, no O(n²)
    * pair join.
    */
  val eval_auc = OpQuery(
    "eval_auc",
    s"""WITH scored AS ($scoredView),
       |ranked AS (
       |  SELECT y, ROW_NUMBER() OVER (ORDER BY score, vec_id) AS r FROM scored),
       |m AS (
       |  SELECT SUM(CASE WHEN y = 1 THEN r ELSE 0 END) AS rpos,
       |         SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
       |         SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
       |  FROM ranked)
       |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       |       CAST(ROUND((CAST(rpos AS DOUBLE) - CAST(np AS DOUBLE) * (np + 1) / 2)
       |                  / (CAST(np AS DOUBLE) * nn), 6) AS DOUBLE) AS auc
       |FROM m""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("graft_auc_emb")
    val scored = spark.sql(
      """SELECT vec_id, CAST(element_at(embedding, 1) AS DOUBLE) AS score,
        |       CAST(label % 2 AS INT) AS y
        |FROM graft_auc_emb""".stripMargin)
    // global rank via TotalOrder's two-phase range ranks — bit-equal to
    // ROW_NUMBER() OVER (ORDER BY score, vec_id) without funnelling the
    // scored table through one reducer (winscan r9: this was a RAW
    // table-sized global window)
    graft.operators.TotalOrder
      .rowNumber(scored, Seq(col("score"), col("vec_id")), "r")
      .createOrReplaceTempView("graft_auc_ranked")
    spark.sql(
      """WITH m AS (
        |  SELECT SUM(CASE WHEN y = 1 THEN r ELSE 0 END) AS rpos,
        |         SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
        |         SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
        |  FROM graft_auc_ranked)
        |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |       CAST(ROUND((CAST(rpos AS DOUBLE) - CAST(np AS DOUBLE) * (np + 1) / 2)
        |                  / (CAST(np AS DOUBLE) * nn), 6) AS DOUBLE) AS auc
        |FROM m""".stripMargin)
  }

  /** Calibration bins: scores bucketed into 10 equal-width bins over
    * [-1, 1); per bin the count, positive rate, and mean score — mean
    * via DECIMAL(18,6) so the sum is order-independent. Reading the
    * table once and shuffling 10 groups is the whole cost.
    */
  val eval_calibration = OpQuery(
    "eval_calibration",
    s"""WITH scored AS ($scoredView),
       |binned AS (
       |  SELECT CAST(LEAST(GREATEST(FLOOR((score + 1.0) / 0.2), 0), 9) AS INT) AS bin,
       |         CAST(CAST(score AS DECIMAL(18,6)) AS DECIMAL(28,6)) AS s6, y
       |  FROM scored)
       |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       |       CAST(SUM(y) AS BIGINT) AS positives,
       |       CAST(ROUND(CAST(SUM(s6) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS mean_score,
       |       CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS pos_rate
       |FROM binned
       |GROUP BY bin
       |ORDER BY bin""".stripMargin) { (spark, dir) =>
    val scored = Tables.load(spark, dir, "embeddings")
      .select(element_at(col("embedding"), 1).cast("double").as("score"),
        (col("label") % 2).cast("int").as("y"))
    scored
      .select(
        least(greatest(floor((col("score") + 1.0) / 0.2), lit(0)), lit(9))
          .cast("int").as("bin"),
        col("score").cast("decimal(18,6)").cast("decimal(28,6)").as("s6"),
        col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("positives"),
        round(sum(col("s6")).cast("double") / count(lit(1)), 6)
          .cast("double").as("mean_score"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6)
          .cast("double").as("pos_rate"))
      .orderBy("bin")
  }

  val all: Seq[OpQuery] = Seq(eval_confusion, eval_auc, eval_calibration)
}
