package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 74: anagram signature blocking, one k-means
  * iteration with exact centroid math, and greedy bigram LM decoding
  * via recursive CTE.
  */
object Round4Ops74 {

  /** Anagram grouping: the corpus vocabulary (plus every word reversed — deterministic anagram mates) keyed by sorted-character signature
    * — the permutation-invariant blocking key (scrambled dupes, columnar
    * token canon). Pure per-row array work (split → sort → join), then
    * one shuffle on the signature.
    */
  val text_anagram_groups = OpQuery(
    "text_anagram_groups",
    """WITH vocab AS (
      |  SELECT DISTINCT u.w AS w
      |  FROM (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                           s -> length(s) >= 3) AS ws FROM documents) d,
      |       (SELECT unnest(ws) AS w) u),
      |words AS (
      |  SELECT w FROM vocab
      |  UNION
      |  SELECT reverse(w) FROM vocab),
      |keyed AS (
      |  SELECT w, array_to_string(list_sort(string_split_regex(w, '')), '') AS sig
      |  FROM words)
      |SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_words,
      |       array_to_string(list_sort(list(w)), ',') AS members
      |FROM keyed
      |GROUP BY sig
      |HAVING COUNT(*) > 1
      |ORDER BY sig""".stripMargin) { (spark, dir) =>
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(filter(split(lower(col("text")), "[^a-z]+"),
        s => length(s) >= 3)).as("w"))
      .distinct()
    vocab.unionByName(vocab.select(reverse(col("w")).as("w"))).distinct()
      .select(col("w"),
        array_join(array_sort(split(col("w"), "")), "").as("sig"))
      .groupBy("sig")
      .agg(count(lit(1)).cast("long").as("n_words"),
        array_join(array_sort(collect_list(col("w"))), ",").as("members"))
      .filter(col("n_words") > 1)
      .orderBy("sig")
  }

  /** One k-means iteration over the embedding corpus: assign every
    * vector to its nearest of 8 seed centroids (vec_id < 8), recompute
    * the centroids, and report the per-cluster shift. Distances fold
    * left-to-right inside higher-order functions (bit-identical across
    * engines); centroid means and the shift sum go through quantized
    * DECIMAL so the cross-row reduction is order-independent — the
    * pattern that makes iterative ML refinement hash-reproducible on a
    * cluster.
    */
  val kmeans_step = OpQuery(
    "kmeans_step",
    """WITH seeds AS (
      |  SELECT vec_id AS seed, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      |  FROM embeddings WHERE vec_id < 8),
      |pts AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |dists AS (
      |  SELECT p.vec_id, s.seed,
      |         list_sum(list_transform(range(1, 65),
      |           i -> (e[i] - c[i]) * (e[i] - c[i]))) AS d2
      |  FROM pts p, seeds s),
      |assigned AS (
      |  SELECT vec_id, seed, e FROM (
      |    SELECT d.vec_id, d.seed, p.e,
      |           ROW_NUMBER() OVER (PARTITION BY d.vec_id
      |             ORDER BY d.d2, d.seed) AS rk
      |    FROM dists d JOIN pts p ON d.vec_id = p.vec_id) t
      |  WHERE rk = 1),
      |comps AS (
      |  SELECT seed, i.i AS dim,
      |         CAST(ROUND(e[i.i], 12) AS DECIMAL(28,12)) AS v
      |  FROM assigned, (SELECT unnest(range(1, 65)) AS i) i),
      |centroids AS (
      |  SELECT seed, dim, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS nc,
      |         COUNT(*) AS n
      |  FROM comps GROUP BY seed, dim),
      |shifts AS (
      |  SELECT c.seed, MAX(c.n) AS n,
      |         SUM(CAST(ROUND((c.nc - s.c[c.dim]) * (c.nc - s.c[c.dim]), 12)
      |             AS DECIMAL(28,12))) AS ss
      |  FROM centroids c JOIN seeds s ON c.seed = s.seed
      |  GROUP BY c.seed)
      |SELECT seed, CAST(n AS BIGINT) AS n_points,
      |       CAST(ROUND(sqrt(CAST(ss AS DOUBLE)), 6) AS DOUBLE) AS shift
      |FROM shifts
      |ORDER BY seed""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("graft_km8_emb")
    spark.sql(
      """WITH seeds AS (
        |  SELECT vec_id AS seed, transform(embedding, x -> CAST(x AS DOUBLE)) AS c
        |  FROM graft_km8_emb WHERE vec_id < 8),
        |pts AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM graft_km8_emb),
        |dists AS (
        |  SELECT p.vec_id, s.seed,
        |         aggregate(transform(sequence(1, 64),
        |           i -> (e[i - 1] - c[i - 1]) * (e[i - 1] - c[i - 1])),
        |           CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS d2
        |  FROM pts p CROSS JOIN seeds s),
        |assigned AS (
        |  SELECT vec_id, seed, e FROM (
        |    SELECT d.vec_id, d.seed, p.e,
        |           ROW_NUMBER() OVER (PARTITION BY d.vec_id
        |             ORDER BY d.d2, d.seed) AS rk
        |    FROM dists d JOIN pts p ON d.vec_id = p.vec_id) t
        |  WHERE rk = 1),
        |comps AS (
        |  SELECT seed, i.i AS dim,
        |         CAST(ROUND(e[i.i - 1], 12) AS DECIMAL(28,12)) AS v
        |  FROM assigned, (SELECT explode(sequence(1, 64)) AS i) i),
        |centroids AS (
        |  SELECT seed, dim, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS nc,
        |         COUNT(*) AS n
        |  FROM comps GROUP BY seed, dim),
        |shifts AS (
        |  SELECT c.seed, MAX(c.n) AS n,
        |         SUM(CAST(ROUND((c.nc - s.c[c.dim - 1]) * (c.nc - s.c[c.dim - 1]), 12)
        |             AS DECIMAL(28,12))) AS ss
        |  FROM centroids c JOIN seeds s ON c.seed = s.seed
        |  GROUP BY c.seed)
        |SELECT seed, CAST(n AS BIGINT) AS n_points,
        |       CAST(ROUND(sqrt(CAST(ss AS DOUBLE)), 6) AS DOUBLE) AS shift
        |FROM shifts
        |ORDER BY seed""".stripMargin)
  }

  /** Greedy bigram decoding: from the corpus's most frequent token,
    * repeatedly follow the argmax next-token edge for 10 steps — the
    * deterministic skeleton of LM sampling. The argmax-follower table
    * is built once (localCheckpoint on the Spark side, so the recursive
    * term re-executes against materialized rows, not a fresh corpus
    * scan per step — the UnionLoop lesson from recursive_cte).
    */
  val lm_greedy_decode = OpQuery(
    "lm_greedy_decode",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
      |  FROM (SELECT doc_id,
      |          list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                      s -> length(s) >= 3) AS ws
      |        FROM documents) d),
      |bigrams AS (
      |  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  GROUP BY a.w, b.w),
      |nxt AS (
      |  SELECT w1, w2 FROM (
      |    SELECT w1, w2, ROW_NUMBER() OVER (PARTITION BY w1
      |      ORDER BY c DESC, w2) AS rk FROM bigrams) t
      |  WHERE rk = 1),
      |start AS (
      |  SELECT w FROM (
      |    SELECT w, COUNT(*) AS c FROM toks GROUP BY w
      |    ORDER BY c DESC, w LIMIT 1) s),
      |walk(step, w) AS (
      |  SELECT 1, w FROM start
      |  UNION ALL
      |  SELECT walk.step + 1, nxt.w2
      |  FROM walk JOIN nxt ON walk.w = nxt.w1
      |  WHERE walk.step < 10)
      |SELECT CAST(step AS INT) AS step, w
      |FROM walk
      |ORDER BY step""".stripMargin) { (spark, dir) =>
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(lower(col("text")), "[^a-z]+"),
          s => length(s) >= 3)).as(Seq("i0", "w")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), col("w"))
    val bigrams = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.i") === col("a.i") + 1)
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("c"))
    val rk = Window.partitionBy(col("w1")).orderBy(col("c").desc, col("w2"))
    // materialize the tiny argmax-edge and start tables once — the
    // recursion below re-executes its subplan per step, and must not
    // re-scan the corpus 10 times
    val nxt = bigrams.withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1).select("w1", "w2").localCheckpoint()
    val start = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1).select("w").localCheckpoint()
    nxt.createOrReplaceTempView("graft_lm_nxt")
    start.createOrReplaceTempView("graft_lm_start")
    spark.sql(
      """WITH RECURSIVE walk(step, w) AS (
        |  SELECT 1, w FROM graft_lm_start
        |  UNION ALL
        |  SELECT walk.step + 1, nxt.w2
        |  FROM walk JOIN graft_lm_nxt nxt ON walk.w = nxt.w1
        |  WHERE walk.step < 10)
        |SELECT CAST(step AS INT) AS step, w
        |FROM walk
        |ORDER BY step""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(text_anagram_groups, kmeans_step, lm_greedy_decode)
}
