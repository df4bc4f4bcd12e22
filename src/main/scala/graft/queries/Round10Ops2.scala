package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{QualityModel, RandomProjection, Sampling}

/** Round-10 batch 2: the trainable curation layer — model-based quality
  * scoring (distributed full-batch GD, hash-replayed end-to-end),
  * leakage-safe group splits, and JL random projection. These close the
  * "training-data pipeline" gaps a fixed-formula engine leaves: quality
  * filters get TRAINED (not hand-tuned), eval splits must respect
  * dup/domain structure (not row hashes), and wide embeddings get
  * cheaply compressed before any shuffle-heavy downstream op.
  */
object Round10Ops2 {

  private[queries] val Epochs = 3
  private val LrLog2 = -17
  // 2^-17 written as the exact decimal both engines parse to the same
  // double (a power of two is exactly representable, so the literal IS
  // the value — no parse rounding on either side)
  private val LrSql = "0.00000762939453125"

  /** Feature CTE shared by the GD gates: four cheap, integer-valued,
    * engine-parity text statistics (bias, whitespace token count, char
    * count, 'e' count) and the label (long docs). Integer-valued
    * features make every gradient product one IEEE multiply on exact
    * operands — the quantized-walk replay regime.
    */
  private val featsSql =
    """feats AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(1 AS DOUBLE) AS f1,
      |    CAST(length(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS f2,
      |    CAST(n_chars AS DOUBLE) AS f3,
      |    CAST(length(text) - length(replace(text, 'e', '')) AS DOUBLE) AS f4,
      |    CASE WHEN n_chars > 300 THEN CAST(1 AS DOUBLE)
      |         ELSE CAST(0 AS DOUBLE) END AS y
      |  FROM documents
      |  WHERE text IS NOT NULL AND n_chars IS NOT NULL)""".stripMargin

  /** The E-epoch GD walk as CTEs `w0..w$Epochs` (w0 = zeros): per epoch
    * one gradient CTE summing 9dp-rounded per-row contributions in
    * DECIMAL (order-independent — the same arithmetic
    * [[graft.operators.QualityModel.trainGD]] runs distributed), then
    * one weight-update CTE of four scalar IEEE ops. The prediction sums
    * its four terms left-to-right, matching the operator's
    * left-to-right fold exactly.
    */
  private[queries] def gdWalkSql: String = {
    val dims = 1 to 4
    val steps = (1 to Epochs).flatMap { e =>
      val pred = dims.map(j => s"f.f$j * w.w$j").mkString(" + ")
      val grads = dims.map(j =>
        s"SUM(CAST(ROUND((($pred) - f.y) * f.f$j, 9) AS DECIMAL(38,9))) AS s$j")
        .mkString(",\n    ")
      val updates = dims.map(j =>
        s"w.w$j - $LrSql * (CAST(g.s$j AS DOUBLE) / g.n) AS w$j")
        .mkString(",\n    ")
      Seq(
        s"""g$e AS MATERIALIZED (
           |  SELECT $grads,
           |    COUNT(*) AS n
           |  FROM feats f CROSS JOIN w${e - 1} w)""".stripMargin,
        s"""w$e AS MATERIALIZED (
           |  SELECT $updates
           |  FROM g$e g CROSS JOIN w${e - 1} w)""".stripMargin)
    }
    val w0 = "w0 AS (SELECT " +
      dims.map(j => s"CAST(0 AS DOUBLE) AS w$j").mkString(", ") + ")"
    (Seq("WITH " + featsSql, w0) ++ steps).mkString(",\n")
  }

  private[queries] def featuresCol = array(
    lit(1.0),
    size(split(trim(col("text")), "\\s+")).cast("double"),
    col("n_chars").cast("double"),
    (length(col("text")) - length(expr("replace(text, 'e', '')")))
      .cast("double"))

  /** NULL text / n_chars filtered BEFORE featurizing, mirroring the
    * feats CTE's WHERE: a NULL text would otherwise diverge the two
    * halves (Spark's trainGD coalesces NULL feature ELEMENTS to 0 and
    * keeps the row; the SQL prediction goes NULL and voids the row's
    * gradient while COUNT(*) still includes it in n).
    */
  private[queries] def cleanDocs(
      spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull && col("n_chars").isNotNull)

  private[queries] def trainedWeights(
      spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = cleanDocs(spark, dir)
      .select(col("doc_id"), featuresCol.as("features"),
        when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"))
    QualityModel.trainGD(docs, "features", "y", dim = 4,
      epochs = Epochs, lrLog2 = LrLog2, link = QualityModel.Identity,
      quantizeDp = 9)
  }

  /** Distributed linear-model training, hash-replayed END-TO-END: all 3
    * epochs of full-batch GD (one distributed gradient pass per epoch,
    * weights broadcast as literals) replayed by DuckDB from the same
    * parquet — per-row contributions rounded to 9dp and summed in
    * DECIMAL make the gradient order-independent, lr = 2^-17 makes the
    * update scaling exact, and the left-to-right prediction fold
    * matches SQL's `+` associativity. Output: every epoch's weight
    * vector.
    */
  val qf_linear_gd: OpQuery = {
    val finals = (1 to Epochs).flatMap(e => (1 to 4).map(j =>
      s"SELECT CAST($e AS INT) AS epoch, CAST($j AS INT) AS dim, " +
        s"CAST(ROUND(w$j, 9) AS DOUBLE) AS weight FROM w$e"))
      .mkString("\nUNION ALL\n")
    OpQuery("qf_linear_gd",
      gdWalkSql + "\n" + finals + "\nORDER BY epoch, dim") { (spark, dir) =>
      import spark.implicits._
      trainedWeights(spark, dir).zipWithIndex.flatMap { case (w, e) =>
        w.zipWithIndex.map { case (x, j) => (e + 1, j + 1, x) }
      }.toDF("epoch", "dim", "weight")
        .select(col("epoch").cast("int"), col("dim").cast("int"),
          round(col("weight"), 9).as("weight"))
        .orderBy("epoch", "dim")
    }
  }

  /** The scoring half: the trained weights travel as literals into a
    * map-side expression (one scan, no join, no shuffle — the 100 TB
    * quality-filter shape) and the top-20 quality docs come off a
    * TakeOrdered. The oracle re-derives the identical weights through
    * the same CTE walk, so the gate pins train→score end-to-end.
    */
  val qf_linear_score: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("qf_linear_score",
      gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, ($pred) AS s
           |           FROM feats f CROSS JOIN w$Epochs w)
           |SELECT doc_id, CAST(ROUND(s, 9) AS DOUBLE) AS score
           |FROM scored ORDER BY s DESC, doc_id LIMIT 20""".stripMargin) {
      (spark, dir) =>
        val w = trainedWeights(spark, dir).last
        cleanDocs(spark, dir)
          .select(col("doc_id"),
            QualityModel.scoreExpr(featuresCol, w).as("s"))
          .orderBy(col("s").desc, col("doc_id"))
          .limit(20)
          .select(col("doc_id"), round(col("s"), 9).as("score"))
    }
  }

  /** Leakage-safe eval split: documents split 80/10/10 at the SOURCE
    * level (same-domain siblings of a training doc must not reach the
    * eval set — the contamination a row-hashed split misses). The gate
    * outputs per-split doc/group counts plus the straddle count, which
    * the construction forces to zero and the oracle recomputes
    * independently. Both halves key groups through the operator's OWN
    * g:/s: scheme (`COALESCE('g:'||source, 's:'||doc_id)`) so a
    * NULL-source row is a SINGLETON on both sides (ADVICE r10: the old
    * inner join on bare `source` dropped NULL-source rows in the
    * oracle while the operator assigned them — the gate only agreed
    * because current data has no NULL sources; a data refresh would
    * have broken the gate instead of testing the documented null
    * semantics).
    */
  val split_leakage_safe: OpQuery = OpQuery("split_leakage_safe",
    """WITH keyed AS MATERIALIZED (
      |  SELECT doc_id,
      |    COALESCE('g:' || source, 's:' || CAST(doc_id AS VARCHAR)) AS grp
      |  FROM documents
      |), assigned AS MATERIALIZED (
      |  SELECT k.doc_id, k.grp,
      |    CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM keyed k JOIN (
      |    SELECT grp,
      |      CAST(('0x' || substr(md5(CAST(MIN(doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hb
      |    FROM keyed GROUP BY grp) r ON k.grp = r.grp
      |), strad AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS straddled_groups FROM (
      |    SELECT grp FROM assigned GROUP BY grp
      |    HAVING COUNT(DISTINCT split) > 1)
      |)
      |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
      |  (SELECT straddled_groups FROM strad) AS straddled_groups
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin) {
    (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val split = Sampling.leakageSafeSplit(docs, "doc_id", "source",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        // the operator's group identity, restated for the audit aggs:
        // NULL source = per-row singleton, never one fused NULL group
        .withColumn("__grp", coalesce(
          concat(lit("g:"), col("source").cast("string")),
          concat(lit("s:"), col("doc_id").cast("string"))))
      val strad = split.groupBy(col("__grp"))
        .agg(countDistinct(col("split")).as("k"))
        .agg(coalesce(sum(when(col("k") > 1, 1L).otherwise(0L)), lit(0L))
          .as("straddled_groups"))
      split.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("__grp")).as("n_groups"))
        .crossJoin(broadcast(strad))
        .orderBy(col("split"))
  }

  /** JL ±1 random projection of the (10×-quantized) embeddings to k=8:
    * the sign matrix derives per-entry from md5 hex parity, so DuckDB
    * regenerates the identical matrix and replays the projection
    * exactly — integer inputs keep every inner sum exact. Spark runs it
    * as a PURE MAP-SIDE expression (broadcast literals in codegen, one
    * scan, zero shuffle); the oracle states the same algebra as an
    * explode-join. Execution-shape twin of `emb_random_projection`
    * (Round4Ops21), which shuffles n·d·k exploded rows through a keyed
    * aggregate — this gate is the shuffle-free form of the same
    * operator (see [[graft.operators.RandomProjection]]).
    */
  val emb_rand_proj: OpQuery = {
    val dim = 64
    val k = 8
    OpQuery("emb_rand_proj",
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding::DOUBLE[], x -> ROUND(x * 10, 0)) AS qv
         |  FROM embeddings
         |), ex AS (
         |  SELECT vec_id, generate_subscripts(qv, 1) - 1 AS j, unnest(qv) AS x
         |  FROM q
         |), signs AS MATERIALIZED (
         |  SELECT j, k,
         |    CASE WHEN substr(md5('rp:' || CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 1)
         |      IN ('0','2','4','6','8','a','c','e')
         |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
         |  FROM (SELECT unnest(range(0, $dim)) AS j),
         |       (SELECT unnest(range(0, $k)) AS k)
         |), proj AS (
         |  SELECT e.vec_id, s.k AS proj_dim, SUM(e.x * s.s) AS v
         |  FROM ex e JOIN signs s ON e.j = s.j
         |  GROUP BY e.vec_id, s.k
         |)
         |SELECT vec_id, CAST(proj_dim AS INT) AS proj_dim,
         |  CAST(TRUNC(v) AS BIGINT) AS pv
         |FROM proj ORDER BY vec_id, proj_dim""".stripMargin) { (spark, dir) =>
      val m = RandomProjection.signMatrix(dim, k, "rp")
      // quantize in its OWN projection: projectExpr references its input
      // k+2 times, and interpreted lambdas share no subexpressions — an
      // inline transform would re-quantize the vector once per output
      // dim (CollapseProject keeps a non-cheap multi-referenced alias
      // in its own Project, so this split survives optimization)
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => round(x * 10, 0)).as("qv"))
        .select(col("vec_id"),
          posexplode(RandomProjection.projectExpr(col("qv"), m))
            .as(Seq("proj_dim", "v")))
        .select(col("vec_id"), col("proj_dim").cast("int").as("proj_dim"),
          col("v").cast("long").as("pv"))
        .orderBy("vec_id", "proj_dim")
    }
  }

  /** The trained-curation pipeline END-TO-END: train the quality model
    * (3 GD epochs), filter the corpus map-side at score ≥ 0.5, exact-dedup
    * the survivors on normalized text, then split LEAKAGE-SAFE at the
    * source level — the full modern curation chain (heuristic
    * `curation_e2e`'s trained sibling), every stage hash-replayed in one
    * oracle: DuckDB re-derives the weights through the CTE walk, applies
    * the same threshold, elects the same min-id survivors, and hashes
    * the same representatives.
    */
  val curation_e2e_trained: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("curation_e2e_trained",
      gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, ($pred) AS s
           |           FROM feats f CROSS JOIN w$Epochs w),
           |kept AS MATERIALIZED (
           |  SELECT d.doc_id, d.source, d.lang,
           |         md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
           |  FROM documents d JOIN scored sc ON d.doc_id = sc.doc_id
           |  WHERE sc.s >= 0.5),
           |survivors AS (
           |  SELECT k.doc_id, k.source, k.lang FROM kept k
           |  JOIN (SELECT fp, MIN(doc_id) AS keeper FROM kept GROUP BY fp) g
           |    ON k.doc_id = g.keeper),
           |sgrp AS (SELECT doc_id, lang,
           |    COALESCE('g:' || source, 's:' || CAST(doc_id AS VARCHAR)) AS grp
           |  FROM survivors),
           |reps AS (SELECT grp,
           |    CAST(('0x' || substr(md5(CAST(MIN(doc_id) AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hb
           |  FROM sgrp GROUP BY grp),
           |assigned AS (SELECT s.doc_id, s.lang,
           |    CASE WHEN r.hb < 80 THEN 'train' WHEN r.hb < 90 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM sgrp s JOIN reps r ON s.grp = r.grp)
           |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
           |FROM assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin) {
      (spark, dir) =>
        val w = trainedWeights(spark, dir).last
        val kept = cleanDocs(spark, dir)
          .filter(QualityModel.scoreExpr(featuresCol, w) >= 0.5)
        val survivors = graft.operators.Dedup.exact(kept, "doc_id", "text")
          .select(col("doc_id"), col("source"), col("lang"))
        Sampling.leakageSafeSplit(survivors, "doc_id", "source",
            Seq("train" -> 80, "val" -> 10, "test" -> 10))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("split"), col("lang"))
    }
  }

  /** Hard-negative mining for contrastive training data: per query
    * vector, the top-3 most-cosine-similar vectors of a DIFFERENT
    * label. The gate runs the definitional exact form
    * ([[graft.operators.Similarity.hardNegatives]] with no shortlist);
    * the 1-bit-Hamming-shortlisted 100 TB path's recall and
    * full-shortlist equality are SimilaritySpec territory. Queries are
    * every 8th vector so the pair count scales with the corpus, not a
    * fixed slice.
    */
  val mine_hard_negatives: OpQuery = OpQuery("mine_hard_negatives",
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS qlabel, embedding::DOUBLE[] AS qvec
      |  FROM embeddings WHERE vec_id % 8 = 0
      |), scored AS (
      |  SELECT q.query_id, e.vec_id AS corpus_id,
      |         list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
      |  FROM embeddings e, q
      |  WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel
      |), ranked AS (
      |  SELECT query_id, corpus_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |              ORDER BY score DESC, corpus_id ASC) AS INT) AS rank,
      |         score
      |  FROM scored
      |)
      |SELECT query_id, corpus_id, rank, CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = Tables.load(spark, dir, "embeddings")
    graft.operators.Similarity.hardNegatives(
        emb, emb.filter(col("vec_id") % 8 === 0), k = 3)
      .withColumn("score", round(col("score"), 6).cast("double"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[OpQuery] =
    Seq(qf_linear_gd, qf_linear_score, split_leakage_safe, emb_rand_proj,
      curation_e2e_trained, mine_hard_negatives)
}
