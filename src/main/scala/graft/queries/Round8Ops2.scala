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
    val reranked = Pq.adcTopKReranked(encoded, embs, queries, cb,
      topK = 10, shortlist = 100, idCol = "vec_id", vecCol = "v")
    // coverage proof: the shortlist really contained the exact top-10 —
    // brute-force rerank over the FULL corpus must give the same sets.
    // (A miss here means the shortlist is too small for this corpus:
    // fail loudly and retune, never emit silently-approximate rows.)
    val exact = Pq.adcTopKReranked(encoded, embs, queries, cb,
      topK = 10, shortlist = embs.count().toInt, idCol = "vec_id", vecCol = "v")
    val got = reranked.select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect().toSeq
    val want = exact.select("query_id", "rank", "corpus_id")
      .orderBy("query_id", "rank").collect().toSeq
    require(got == want,
      "ADC shortlist (100) missed part of the exact top-10 — retune the twin")
    reranked.select(col("query_id"), col("rank"), col("corpus_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[OpQuery] = Seq(bpe_roundtrip, d4_surrogate_props,
    sim_pq_rerank_verified)
}
