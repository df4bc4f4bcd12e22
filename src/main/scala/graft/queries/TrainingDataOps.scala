package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Curation

/** Gate queries for the curation-family training-data operators:
  * benchmark decontamination, sliding-window chunking, Gopher-style
  * repetition statistics, and SemDeDup-style semantic dedup. All four
  * are hash-gated against DuckDB (the semantic-dedup oracle resolves
  * components with a recursive CTE over `list_cosine_similarity`
  * pairs, mirroring the dedup_clusters oracle pattern).
  */
object TrainingDataOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Decontamination: training docs sharing any word 8-gram with the
    * benchmark slice (doc_id % 17 = 3 stands in for an eval suite).
    * Full audit output — zero-hit docs included — so the gate hashes the
    * whole corpus-side decision, not just the flagged tail.
    */
  val decontam_overlap = OpQuery(
    "decontam_overlap",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents WHERE coalesce(trim(text), '') <> ''
      |), ng AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-8+1),
      |           i -> array_to_string(list_slice(t, i, i+8-1), ' '))) AS g
      |  FROM toks WHERE len(t) >= 8
      |), bench AS (
      |  SELECT DISTINCT g FROM ng WHERE doc_id % 17 = 3
      |), hits AS (
      |  SELECT ng.doc_id, CAST(COUNT(DISTINCT ng.g) AS BIGINT) AS n_hits
      |  FROM ng JOIN bench USING (g)
      |  WHERE ng.doc_id % 17 <> 3
      |  GROUP BY 1
      |)
      |SELECT d.doc_id,
      |       COALESCE(h.n_hits, 0) AS n_hits,
      |       COALESCE(h.n_hits, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM toks WHERE doc_id % 17 <> 3) d
      |LEFT JOIN hits h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    val docs = t(spark, dir, "documents")
    Curation.decontaminate(
        training = docs.filter(col("doc_id") % 17 =!= 3),
        benchmark = docs.filter(col("doc_id") % 17 === 3),
        idCol = "doc_id", textCol = "text", n = 8)
      .orderBy(col("doc_id"))
  }

  /** Sliding token-window chunking: 32-token chunks, 8-token overlap. */
  val text_chunk = OpQuery(
    "text_chunk",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |  FROM documents WHERE coalesce(trim(text), '') <> ''
      |), nc AS (
      |  SELECT doc_id, t, len(t) AS L,
      |    CASE WHEN len(t) <= 32 THEN 1
      |         ELSE CAST(FLOOR((len(t) - 32 + 23) / 24.0) AS INT) + 1 END AS n_chunks
      |  FROM toks
      |)
      |SELECT doc_id,
      |       CAST(u.i AS INT) AS chunk_idx,
      |       CAST(LEAST(32, L - u.i * 24) AS INT) AS n_chunk_tokens,
      |       array_to_string(list_slice(t, u.i * 24 + 1, u.i * 24 + 32), ' ') AS chunk_text
      |FROM nc, unnest(generate_series(0, n_chunks - 1)) AS u(i)
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
    Curation.chunk(t(spark, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Gopher-style repetition stats + composite filter flag (flag
    * computed from the rounded fractions on both sides).
    */
  val text_repetition = OpQuery(
    "text_repetition",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents WHERE coalesce(trim(text), '') <> ''
      |), stats AS (
      |  SELECT doc_id,
      |    CAST(len(t) AS INT) AS n_tokens,
      |    CAST(ROUND(list_max(list_transform(list_distinct(t),
      |           x -> len(list_filter(t, e -> e = x)))) * 1.0 / len(t), 6)
      |         AS DOUBLE) AS top_tok_frac,
      |    CAST(CASE WHEN len(t) > 1
      |      THEN ROUND(1.0 - len(list_distinct(list_transform(generate_series(1, len(t)-1),
      |             i -> t[i] || ' ' || t[i+1]))) * 1.0 / (len(t) - 1), 6)
      |      ELSE 0.0 END AS DOUBLE) AS dup_bigram_frac,
      |    CAST(ROUND(len(list_distinct(t)) * 1.0 / len(t), 6) AS DOUBLE) AS distinct_frac
      |  FROM toks
      |)
      |SELECT doc_id, n_tokens, top_tok_frac, dup_bigram_frac, distinct_frac,
      |       (top_tok_frac > 0.14 OR dup_bigram_frac > 0.065) AS repetitive
      |FROM stats
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Curation.repetitionStats(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** SemDeDup: collapse cosine-near-identical embeddings (>= 0.45 on
    * the same half-corpus slice the near-dup gate uses) to one survivor
    * per connected component. The oracle rebuilds the component graph
    * with a recursive CTE and elects the same min-id survivors.
    */
  /** Corpus-trained bigram LM quality scoring (KenLM-style filter,
    * relational form): add-one-smoothed mean bigram log-likelihood per
    * document, model trained on the same corpus. The oracle replays
    * tokenization, bigram extraction, both count tables, the vocabulary
    * size, and the smoothed ln — documents under 2 tokens score NULL.
    */
  val text_lm_score = OpQuery(
    "text_lm_score",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents
      |), bg AS (
      |  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
      |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2
      |), cwp AS (
      |  SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2
      |), cw AS (
      |  SELECT w1, SUM(c) AS cw FROM cwp GROUP BY 1
      |), vocab AS (
      |  SELECT COUNT(DISTINCT w) AS v
      |  FROM (SELECT unnest(t) AS w FROM toks) WHERE w <> ''
      |)
      |SELECT d.doc_id,
      |       CAST(COUNT(b.w1) AS BIGINT) AS n_bigrams,
      |       CAST(ROUND(AVG(LN((c + 1.0) / (cw + v))), 6) AS DOUBLE) AS lm_score
      |FROM documents d
      |LEFT JOIN bg b ON d.doc_id = b.doc_id
      |LEFT JOIN cwp ON b.w1 = cwp.w1 AND b.w2 = cwp.w2
      |LEFT JOIN cw ON b.w1 = cw.w1
      |CROSS JOIN vocab
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    graft.operators.LanguageModel.scoreDocs(
        t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val semantic_dedup = OpQuery(
    "semantic_dedup",
    """WITH RECURSIVE half AS (
      |  SELECT vec_id, label FROM embeddings WHERE vec_id % 2 = 0
      |), vecs AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
      |), pairs AS (
      |  SELECT a.vec_id AS id1, b.vec_id AS id2
      |  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
      |), edges AS (
      |  SELECT id1 AS src, id2 AS dst FROM pairs
      |  UNION
      |  SELECT id2, id1 FROM pairs
      |), reach(node, lbl) AS (
      |  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node
      |), losers AS (
      |  SELECT node FROM (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
      |  WHERE node <> component
      |)
      |SELECT h.vec_id, h.label
      |FROM half h LEFT JOIN losers l ON h.vec_id = l.node
      |WHERE l.node IS NULL
      |ORDER BY h.vec_id""".stripMargin) { (spark, dir) =>
    Curation.semanticDedupExact(
        t(spark, dir, "embeddings").filter(col("vec_id") % 2 === 0),
        threshold = 0.45)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
  }

  def all: Seq[OpQuery] =
    Seq(decontam_overlap, text_chunk, text_repetition, text_lm_score,
      semantic_dedup)
}
