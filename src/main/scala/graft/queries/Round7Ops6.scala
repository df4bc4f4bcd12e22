package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Retrieval

/** Round-7 batch 6: signed feature hashing
  * ([[Retrieval.hashedFeatures]]) — the vocabulary-free featurizer
  * bridging the documents table to the vector stack. md5-derived
  * buckets and signs are replayed exactly by DuckDB (hex-slice casts),
  * and the checksum is position-weighted over the DENSE output vector,
  * so a bucket-order or layout slip hash-fails, not just a count slip.
  */
object Round7Ops6 {

  val text_hash_embed = OpQuery(
    "text_hash_embed",
    """WITH toks AS (
      |  SELECT doc_id, t.tok AS tok
      |  FROM (SELECT doc_id,
      |               regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |        FROM documents),
      |       unnest(ts) AS t(tok)
      |  WHERE t.tok <> ''
      |), hb AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 32 AS b,
      |         CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
      |              THEN 1 ELSE -1 END AS s
      |  FROM toks
      |), cells AS (
      |  SELECT doc_id, b, SUM(s) AS v
      |  FROM hb GROUP BY doc_id, b HAVING SUM(s) <> 0
      |), agg AS (
      |  SELECT doc_id, COUNT(*) AS nnz, SUM(ABS(v)) AS l1,
      |         SUM((b + 1) * v) AS checksum
      |  FROM cells GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST(COALESCE(a.nnz, 0) AS INT) AS nnz,
      |       CAST(COALESCE(a.l1, 0) AS BIGINT) AS l1,
      |       CAST(COALESCE(a.checksum, 0) AS BIGINT) AS checksum
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    Retrieval.hashedFeatures(
        Tables.load(spark, dir, "documents"), "doc_id", "text", dim = 32)
      .withColumn("checksum",
        expr("aggregate(transform(sequence(0, 31), " +
          "i -> (i + 1) * element_at(vector, i + 1)), 0L, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("nnz"), col("l1"), col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end text clustering on the vocabulary-free path: documents →
    * signed hashed vectors → argmin-L2 assignment to 8 seed centroids
    * (the first 8 docs' vectors, the id-ordered init convention) →
    * per-cluster stats. Every stage is integer arithmetic — md5 buckets,
    * signed counts, L2² over BIGINT vectors — so DuckDB replays the
    * WHOLE pipeline including tie-breaks. This is the smoke test that
    * the text featurizer, the PQ argmin kernel, and the cluster
    * aggregation compose, not just work alone.
    */
  val text_hash_cluster = OpQuery(
    "text_hash_cluster",
    """WITH toks AS (
      |  SELECT doc_id, t.tok AS tok
      |  FROM (SELECT doc_id,
      |               regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |        FROM documents),
      |       unnest(ts) AS t(tok)
      |  WHERE t.tok <> ''
      |), cells AS (
      |  SELECT doc_id,
      |         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 32 AS b,
      |         SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM toks GROUP BY doc_id, b
      |  HAVING SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
      |                  THEN 1 ELSE -1 END) <> 0
      |), dense AS (
      |  SELECT d.doc_id, list(COALESCE(c.v, 0) ORDER BY g.i) AS vec,
      |         SUM(ABS(COALESCE(c.v, 0))) AS l1
      |  FROM documents d
      |  CROSS JOIN unnest(generate_series(0, 31)) AS g(i)
      |  LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = g.i
      |  GROUP BY d.doc_id
      |), cents AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS INT) AS cell, vec
      |  FROM (SELECT doc_id, vec FROM dense ORDER BY doc_id LIMIT 8)
      |), assigned AS (
      |  SELECT doc_id, l1, cell FROM (
      |    SELECT x.doc_id, x.l1, c.cell,
      |           ROW_NUMBER() OVER (PARTITION BY x.doc_id ORDER BY
      |             list_sum(list_transform(generate_series(1, 32), i ->
      |               (x.vec[i] - c.vec[i]) * (x.vec[i] - c.vec[i]))) ASC,
      |             c.cell ASC) AS rn
      |    FROM dense x, cents c)
      |  WHERE rn = 1
      |)
      |SELECT CAST(cell AS INT) AS cell_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(l1) AS BIGINT) AS sum_l1,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_doc
      |FROM assigned GROUP BY cell
      |ORDER BY cell_id""".stripMargin) { (spark, dir) =>
    import graft.operators.Pq
    Pq.register(spark)
    val feats = Retrieval.hashedFeatures(
      Tables.load(spark, dir, "documents"), "doc_id", "text", dim = 32)
    val seeds = feats.orderBy(col("doc_id")).limit(8)
      .select(col("vector")).collect()
    val flat = seeds.flatMap(_.getSeq[Long](0).map(_.toDouble))
    feats
      .withColumn("cell_id",
        element_at(call_function("pq_encode",
          col("vector"), lit(flat), lit(1)), 1))
      .groupBy(col("cell_id"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("l1")).cast("long").as("sum_l1"),
        min(col("doc_id")).cast("long").as("min_doc"))
      .orderBy(col("cell_id"))
  }

  /** Unicode NFC normalization ([[graft.expressions.UnicodeNormalize]],
    * the JDK Normalizer behind a codegen expression) — each document is
    * suffixed with DECOMPOSED sequences (e+combining acute, A+combining
    * ring, u+combining diaeresis) and both engines must compose them to
    * the identical canonical bytes: lengths shrink by exactly the three
    * combining marks and the md5 of the normalized text hash-matches
    * DuckDB's utf8proc-based `nfc_normalize`. Two independent Unicode
    * implementations agreeing byte-for-byte IS the correctness claim.
    */
  val text_nfc_normalize = OpQuery(
    "text_nfc_normalize",
    """WITH r AS (
      |  SELECT doc_id,
      |         text || ' e' || chr(769) || ' A' || chr(778)
      |              || ' gru' || chr(776) || 'n' AS raw
      |  FROM documents
      |)
      |SELECT doc_id,
      |       CAST(length(raw) AS INT) AS len_raw,
      |       CAST(length(nfc_normalize(raw)) AS INT) AS len_nfc,
      |       md5(nfc_normalize(raw)) AS nfc_md5
      |FROM r ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    graft.GraftFunctions.registerAll(spark)
    import graft.functions.TextFunctions
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        // DECOMPOSED suffix: e+U+0301, A+U+030A, u+U+0308 — NFC must
        // compose all three (the oracle builds the same bytes via chr())
        concat(col("text"),
          lit(" e\u0301 A\u030a gru\u0308n")).as("raw"))
      .select(col("doc_id"),
        length(col("raw")).as("len_raw"),
        length(TextFunctions.normalizeUnicode(col("raw"))).as("len_nfc"),
        md5(TextFunctions.normalizeUnicode(col("raw"))).as("nfc_md5"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-sidecar point lookup ([[graft.operators.TableStore
    * .analyzeBloomColumn]] / `readPrunedEquals`): the equality-predicate
    * counterpart to the min/max zone maps — `column = v` schedules only
    * the files whose per-file bloom might contain v. The gate runs the
    * FULL lifecycle (range-clustered write, ANALYZE, pruned read) and
    * must return exactly the plain filter's rows — pruning is invisible
    * in results (no false negatives by the bloom contract); the actual
    * file-count reduction and stats-shedding discipline are pinned in
    * BloomSkipSpec.
    */
  val s54_bloom_point_lookup = OpQuery(
    "s54_bloom_point_lookup",
    """SELECT o_orderkey, o_custkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      |FROM orders WHERE o_custkey = 371
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    import graft.operators.TableStore
    val root = graft.queries.GateScratch.dir("graft-bloomskip-").toString
    val store = new TableStore(spark, root)
    store.overwrite("orders_bl",
      Tables.load(spark, dir, "orders")
        .repartitionByRange(16, col("o_custkey")))
    store.analyzeBloomColumn("orders_bl", "o_custkey", expectedPerFile = 100000L)
    store.readPrunedEquals("orders_bl", "o_custkey", 371L)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("price"))
      .orderBy(col("o_orderkey"))
  }

  val all: Seq[OpQuery] =
    Seq(text_hash_embed, text_hash_cluster, text_nfc_normalize,
      s54_bloom_point_lookup)
}
