package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-5 batch 1: hash-green gates for the VERIFIED stage of the two
  * sketch-based near-dup pipelines.
  *
  * `dedup_minhash_lsh` / `sim_lsh_neardup` stay rows-only (their
  * signatures aren't DuckDB-expressible), but both pipelines end with an
  * EXACT verification over the candidate pairs, so at a recall-saturating
  * tuning the verified output equals the quadratic ground truth — which
  * IS DuckDB-expressible. These gates pin the candidate-generation +
  * verify path end-to-end against the same oracles as the brute-force
  * baselines (`dedup_ngram_jaccard`, `sim_neardup_embedding`), turning
  * "found ⊆ exact" (spec-pinned) into "found = exact" (oracle-pinned) at
  * the chosen tunings. Candidate generation still buckets — never O(n²).
  */
object Round5Ops1 {

  /** MinHash-LSH at a recall-saturating tuning: 16 bands × 2 rows over
    * 32 hashes puts the S-curve midpoint at (1/16)^(1/2) = 0.25, so a
    * true jaccard-0.9 pair misses all bands with probability
    * (1 − 0.9²)^16 ≈ 3e-12 — and the estimate prefilter's margin is
    * widened to 0.35 (6.6σ below t, ~1e-11 per pair; the default 0.15 =
    * 2.8σ measurably drops ~2e-3 of the 43k sf0.1 true pairs). Verified
    * output = exact token-set jaccard ≥ 0.9 over the same 20% slice as
    * `dedup_ngram_jaccard`, same oracle.
    */
  val dedup_minhash_verified = OpQuery(
    "dedup_minhash_verified",
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
    Dedup.minHashNearDups(
        Tables.load(spark, dir, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", numHashes = 32, bands = 16, threshold = 0.9,
        estMargin = 0.35)
      .withColumn("jaccard", round(col("jaccard"), 6).cast("double"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Random-hyperplane LSH at a recall-saturating tuning: 64 tables × 4
    * bits. At the 0.45 cosine threshold (θ ≈ 63°, per-bit collision
    * ≈ 0.648) a true pair misses every table with probability
    * (1 − 0.648⁴)^64 ≈ 4e-6 — and the hyperplanes are seeded, so the
    * outcome is deterministic. Verified output = exact cosine ≥ 0.45
    * over the same 50% slice as `sim_neardup_embedding`, same oracle.
    * Fewer bits per table floods more candidates; the pipeline scores
    * before distinct'ing, so the flood stays map-side.
    */
  val sim_lsh_verified = OpQuery(
    "sim_lsh_verified",
    """WITH half AS (SELECT * FROM embeddings WHERE vec_id % 2 = 0)
      |SELECT a.vec_id AS id1, b.vec_id AS id2,
      |       CAST(ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS DOUBLE) AS score
      |FROM half a JOIN half b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    Similarity.lshNearDups(
        Tables.load(spark, dir, "embeddings").filter(col("vec_id") % 2 === 0),
        threshold = 0.45, numTables = 64, bitsPerTable = 4)
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("id1"), col("id2"))
  }

  val all: Seq[OpQuery] = Seq(dedup_minhash_verified, sim_lsh_verified)
}
