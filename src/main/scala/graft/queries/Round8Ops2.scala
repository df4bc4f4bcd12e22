package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Pq}

/** Round-8 batch 2: oracle-able verification TWINS for `no_oracle`
  * gates (VERDICT r7 item 5). Each twin runs the SAME engine machinery
  * as its rows-only sibling but emits an output DuckDB can replay —
  * the [[Round6Ops: dedup_minhash_verified]] pattern. The remaining
  * rows-only gates are mapped to their twins (or impossibility notes)
  * in COVERAGE.md §no-oracle.
  */
object Round8Ops2 {

  private def t(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String) = Tables.load(spark, dir, name)

  /** Twin for `bpe_tokenize`: the BPE invariant DuckDB CAN check —
    * concatenating the learned-merge tokens reconstructs the input's
    * non-whitespace characters exactly (the tokenizer splits on
    * whitespace and merges only ever join adjacent units within a
    * word). The gate trains the same 20 merges, encodes every
    * document, and emits the roundtrip verdict + reconstructed length;
    * a tokenizer that drops, duplicates, or mangles a single character
    * hash-fails every row.
    */
  val bpe_roundtrip = OpQuery(
    "bpe_roundtrip",
    """SELECT doc_id,
      |       TRUE AS roundtrip_ok,
      |       CAST(LENGTH(REGEXP_REPLACE(LOWER(text), '\s+', '', 'g')) AS INT)
      |         AS n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = t(spark, dir, "documents")
    val merges = Bpe.train(
      docs.filter(col("doc_id") % 7 === 0), "text", numMerges = 20)
    graft.expressions.BpeEncode.register(spark)
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .select(
        col("doc_id"),
        regexp_replace(col("t"), "\\s+", "").as("squashed"),
        array_join(Bpe.encode(col("t"), merges), "").as("joined"))
      .select(
        col("doc_id"),
        (col("joined") === col("squashed")).as("roundtrip_ok"),
        length(col("squashed")).cast("int").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Twin for `d4_surrogate_key` (Murmur3 — no DuckDB equivalent): the
    * PROPERTIES of a surrogate key are oracle-able even when the hash
    * values aren't. One row: key count == row count, distinct keys ==
    * distinct names (collision-free on this corpus — deterministic, so
    * stable across runs; a collision would be a data change, caught),
    * zero negatives (abs() contract), zero nulls on non-null input,
    * and determinism (two independent evaluations agree), verified
    * in-plan and emitted as a count that must equal the row count.
    */
  val d4_surrogate_props = OpQuery(
    "d4_surrogate_props",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_keys,
      |       CAST(0 AS BIGINT) AS n_negative,
      |       CAST(0 AS BIGINT) AS n_null,
      |       CAST(COUNT(*) AS BIGINT) AS n_stable
      |FROM customer""".stripMargin) { (spark, dir) =>
    import graft.functions.IronmanExprs
    val sk = IronmanExprs.surrogateKey(col("c_name"))
    t(spark, dir, "customer")
      .select(
        sk.as("sk"),
        IronmanExprs.surrogateKey(col("c_name")).as("sk2"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("sk")).as("n_distinct_keys"),
        sum(when(col("sk") < 0, 1).otherwise(0)).cast("long").as("n_negative"),
        sum(when(col("sk").isNull, 1).otherwise(0)).cast("long").as("n_null"),
        sum(when(col("sk") === col("sk2"), 1).otherwise(0)).cast("long")
          .as("n_stable"))
  }

  /** Twin for `sim_pq_topk` / `sim_pq_rerank`: when the ADC shortlist
    * provably CONTAINS the exact top-k (verified in-gate by computing
    * the brute-force answer and requiring set equality — a loud require,
    * not a silent assumption), the exact re-rank must RECOVER the exact
    * L2 top-k — which DuckDB replays independently with the same
    * c·c − 2·c·q + q·q arithmetic. This pins the full PQ serving chain
    * (train → encode → ADC shortlist → exact refine) against an
    * engine-independent answer; the rows-only siblings keep pinning the
    * approximate regime (small shortlists) via PqSpec recall floors.
    */
  val sim_pq_rerank_verified = OpQuery(
    "sim_pq_rerank_verified",
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |         list_inner_product(c.v, c.v)
      |           - 2 * list_inner_product(c.v, q.v)
      |           + list_inner_product(q.v, q.v) AS dist
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 8
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY dist ASC, corpus_id ASC) AS INT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, corpus_id
      |FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val embs = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = Pq.train(embs, m = 16, k = 64, iters = 2,
      idCol = "vec_id", vecCol = "v")
    val encoded = Pq.encode(embs, cb, idCol = "vec_id", vecCol = "v")
    val queries = embs.filter(col("vec_id") < 8)
    // shortlist scales with the corpus: ADC on raw (un-normalized)
    // vectors is a coarse ranking, and a fixed 100 covered the exact
    // top-10 at sf0.01 but not sf0.1 — the in-gate require below caught
    // exactly that, which is its job
    val n = embs.count()
    val shortlist = math.max(100, (n / 5).toInt)
    // the ADC scan (the gate's dominant cost) runs ONCE: the checkpointed
    // shortlist feeds both the rerank and the coverage exclusion below
    val cand = Pq.adcTopK(encoded, queries, cb, shortlist,
        idCol = "vec_id", vecCol = "v")
      .select(col("query_id"), col("corpus_id"))
      .localCheckpoint(true) // tiny: queries × shortlist ids
    val reranked = Pq.rerankShortlist(cand, embs, queries,
      topK = 10, idCol = "vec_id", vecCol = "v")
    // coverage proof: the reranked top-10 IS the exact top-10 iff every
    // kept distance is strictly below every distance OUTSIDE the
    // shortlist (one exact-scoring pass over corpus∖shortlist — far
    // cheaper than a second full rerank, same guarantee; an exact tie
    // on the boundary fails the strict check loudly, never silently).
    // A miss means the shortlist is too small for this corpus: fail
    // loudly and retune, never emit silently-approximate rows.
    graft.expressions.VectorExprs.register(spark)
    import graft.expressions.VectorExprs.vecDot
    val shortRows = cand
    val q = queries.select(col("vec_id").cast("long").as("query_id"),
      col("v").as("__qv"))
    val minExcluded = embs
      .select(col("vec_id").as("corpus_id"), col("v").as("__cv"))
      .crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .join(shortRows, Seq("query_id", "corpus_id"), "left_anti")
      .withColumn("dist",
        vecDot(col("__cv"), col("__cv"))
          - lit(2.0) * vecDot(col("__cv"), col("__qv"))
          + vecDot(col("__qv"), col("__qv")))
      .groupBy("query_id").agg(min(col("dist")).as("min_excl"))
    val covered = reranked.groupBy("query_id")
      .agg(max(col("dist")).as("max_kept"))
      .join(minExcluded, Seq("query_id"), "left")
      .filter(col("min_excl").isNotNull && col("max_kept") >= col("min_excl"))
      .count()
    require(covered == 0,
      s"ADC shortlist ($shortlist) missed part of the exact top-10 — retune the twin")
    reranked.select(col("query_id"), col("rank"), col("corpus_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Binary (1-bit sign) embedding quantization + Hamming top-k — the
    * 32×-compression ANN scan every current vector store ships. Unlike
    * the float-scored ANN gates this one is EXACT integer arithmetic
    * end to end (sign bits → packed 64-bit words → XOR + popcount →
    * ties to corpus_id), so DuckDB replays the complete ranking and the
    * gate is hash-green with no approximation caveat. Quality vs float
    * cosine is pinned separately in SimilaritySpec.
    */
  val emb_binary_topk = OpQuery(
    "emb_binary_topk",
    """WITH sig AS (
      |  SELECT vec_id,
      |         list_transform(
      |           generate_series(0, (len(embedding) - 1) // 32),
      |           w -> list_sum(list_transform(
      |                  generate_series(0, 31),
      |                  i -> CASE WHEN 32 * w + i < len(embedding)
      |                             AND embedding[32 * w + i + 1] > 0
      |                        THEN (CAST(1 AS BIGINT) << i)
      |                        ELSE CAST(0 AS BIGINT) END))) AS s
      |  FROM embeddings
      |), pairs AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |         list_sum(list_transform(
      |           generate_series(1, len(q.s)),
      |           j -> bit_count(xor(q.s[j], c.s[j])))) AS hamming
      |  FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 8
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY hamming ASC, corpus_id ASC) AS INT) AS rank,
      |         CAST(hamming AS BIGINT) AS hamming
      |  FROM pairs)
      |SELECT query_id, corpus_id, rank, hamming
      |FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    import graft.operators.Similarity
    val emb = t(spark, dir, "embeddings")
    Similarity.signBitTopK(emb, emb.filter(col("vec_id") < 8), k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[OpQuery] = Seq(bpe_roundtrip, d4_surrogate_props,
    sim_pq_rerank_verified, emb_binary_topk)
}
