package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.VectorExprs
import graft.operators.Sampling

/** Round-4 batch 14: eval-hygiene — cross-split contamination audit. */
object Round4Ops14 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Cross-split contamination: near-duplicate embedding pairs that
    * STRADDLE the train/val boundary — the leakage every eval pipeline
    * must audit before trusting a validation score (a val item with a
    * train near-twin is memorization, not generalization). Composes the
    * content-stable split with the cosine near-dup join; the oracle
    * replays both (md5 bucket arithmetic + list_cosine_similarity).
    *
    * This gate runs the exhaustive train×val ground truth on a
    * deterministic subset; at corpus scale substitute
    * [[graft.operators.Similarity.cellBucketedNearDups]] (or the LSH
    * path) filtered to straddling pairs — same composition, bucketed
    * candidates.
    */
  val split_contamination = OpQuery(
    "split_contamination",
    """WITH half AS (
      |  SELECT vec_id, embedding,
      |         CASE WHEN CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
      |              THEN 'train' ELSE 'val' END AS split
      |  FROM embeddings WHERE vec_id % 2 = 0
      |)
      |SELECT a.vec_id AS train_id, b.vec_id AS val_id,
      |       CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS DOUBLE) AS cos
      |FROM half a JOIN half b
      |  ON a.split = 'train' AND b.split = 'val'
      | AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
      |ORDER BY train_id, val_id""".stripMargin) { (spark, dir) =>
    VectorExprs.register(spark)
    val half = Sampling.deterministicSplit(
      t(spark, dir, "embeddings").filter(col("vec_id") % 2 === 0),
      "vec_id", Seq("train" -> 80, "val" -> 20))
    val a = half.filter(col("split") === "train")
      .select(col("vec_id").as("train_id"), col("embedding").as("v1"))
    val b = half.filter(col("split") === "val")
      .select(col("vec_id").as("val_id"), col("embedding").as("v2"))
    a.crossJoin(b)
      .withColumn("__cos", VectorExprs.vecCosine(col("v1"), col("v2")))
      .filter(col("__cos") >= 0.45)
      .select(col("train_id"), col("val_id"),
        round(col("__cos"), 6).as("cos"))
      .orderBy(col("train_id"), col("val_id"))
  }

  val all: Seq[OpQuery] = Seq(split_contamination)
}
