package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Sampling, Similarity}

/** Round-11 batch 2: three curation-stack completers — EXACT-count
  * stratified splits (hash splits wobble ±√n per cell and can empty a
  * rare stratum's eval cell), matryoshka prefix-dimension retrieval
  * quality (the truncate-the-embedding trade modern embedding models
  * are trained for), and the trained quality model's reliability
  * diagram (is the score calibrated against the label, bin by bin).
  */
object Round11Ops2 {

  /** Exact stratified 80/10/10 by language: within each lang, rows rank
    * by md5(doc_id) and split at cumulative ⌊n·Σp/100⌋ thresholds —
    * every stratum's cell counts are exact integer fractions, replayed
    * by DuckDB through the identical window + threshold arithmetic
    * (n·80/100 is one exact long multiply and one correctly-rounded
    * IEEE divide on both engines; md5 hex strings sort identically).
    */
  val split_stratified_exact: OpQuery = OpQuery("split_stratified_exact",
    """WITH ranked AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents),
      |assigned AS (
      |  SELECT lang,
      |    CASE WHEN rn <= FLOOR(n * 80 / 100) THEN 'train'
      |         WHEN rn <= FLOOR(n * 90 / 100) THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM ranked)
      |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM assigned GROUP BY lang, split ORDER BY lang, split""".stripMargin) {
    (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      Sampling.stratifiedExactSplit(docs, "doc_id", "lang",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")
  }

  /** Matryoshka evaluation: how much of the FULL-dimension top-5 does
    * a 16-of-64 prefix-dimension ranking retain, per query — the
    * measurement behind the truncate-don't-retrain embedding trade
    * (prefix dims cost 4× less scan/shuffle bandwidth at serve time).
    * Both rankings and the overlap are replayed exactly by DuckDB
    * (list slicing + the same (score desc, id asc) tie order the
    * engine's top-k heap uses).
    */
  val emb_matryoshka_prefix: OpQuery = OpQuery("emb_matryoshka_prefix",
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id % 16 = 0),
      |fullr AS (
      |  SELECT q.query_id, e.vec_id AS corpus_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.query_id
      |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
      |               e.vec_id ASC) AS rank
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      |prefr AS (
      |  SELECT q.query_id, e.vec_id AS corpus_id,
      |    ROW_NUMBER() OVER (PARTITION BY q.query_id
      |      ORDER BY list_cosine_similarity((e.embedding::DOUBLE[])[1:16],
      |                                      q.qv[1:16]) DESC,
      |               e.vec_id ASC) AS rank
      |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
      |SELECT q.query_id, CAST(COALESCE(o.c, 0) AS INT) AS n_overlap
      |FROM q LEFT JOIN (
      |  SELECT f.query_id, COUNT(*) AS c
      |  FROM fullr f JOIN prefr p
      |    ON f.query_id = p.query_id AND f.corpus_id = p.corpus_id
      |  WHERE f.rank <= 5 AND p.rank <= 5
      |  GROUP BY f.query_id) o ON q.query_id = o.query_id
      |ORDER BY q.query_id""".stripMargin) { (spark, dir) =>
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 16 === 0)
    val prefix = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val full = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("corpus_id"))
    val pref = Similarity.bruteForceTopK(prefix,
        prefix.filter(col("vec_id") % 16 === 0), k = 5)
      .select(col("query_id"), col("corpus_id"))
    val overlap = full.join(pref, Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("c"))
    queries.select(col("vec_id").as("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("c"), lit(0L)).cast("int").as("n_overlap"))
      .orderBy("query_id")
  }

  /** Reliability diagram of the trained quality model: scores from the
    * 3-epoch hash-replayed GD walk, binned into 10 equal-width bins
    * over the observed score range, each bin reporting its size, its
    * positive-label rate, and its mean score — the calibration
    * evidence a threshold-based quality FILTER rests on (a monotone
    * pos_rate across bins is what makes "keep score ≥ t" meaningful).
    * Every arithmetic step replays: the bin edge math is two IEEE ops
    * on identical operands, pos_rate is an exact integer sum over one
    * divide, mean_score sums 9dp DECIMALs (order-independent).
    */
  val qf_score_reliability: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("qf_score_reliability",
      Round10Ops2.gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, f.y, ($pred) AS s
           |           FROM feats f CROSS JOIN w${Round10Ops2.Epochs} w),
           |ext AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM scored),
           |binned AS (
           |  SELECT CAST(LEAST(COALESCE(
           |           FLOOR((s - lo) / (NULLIF(hi - lo, 0) / 10)), 0), 9) AS INT) AS bin,
           |         y, s
           |  FROM scored, ext)
           |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(ROUND(CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS pos_rate,
           |  CAST(ROUND(CAST(SUM(CAST(ROUND(s, 9) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS mean_score
           |FROM binned GROUP BY bin ORDER BY bin""".stripMargin) {
      (spark, dir) =>
        import graft.operators.QualityModel
        val w = Round10Ops2.trainedWeights(spark, dir).last
        val scored = Round10Ops2.cleanDocs(spark, dir)
          .select(col("doc_id"),
            when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"),
            QualityModel.scoreExpr(Round10Ops2.featuresCol, w).as("s"))
        val ext = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        scored.crossJoin(broadcast(ext))
          .select(
            // bin width guarded by NULLIF (ADVICE r11): a degenerate
            // corpus where every score is equal would otherwise divide
            // 0/0 → NaN, and Spark/DuckDB disagree on CAST(NaN AS INT);
            // the guard maps everything to bin 0 identically on both
            least(coalesce(
                floor((col("s") - col("lo")) /
                  (nullif(col("hi") - col("lo"), lit(0.0)) / 10)),
                lit(0L)),
              lit(9L)).cast("int").as("bin"),
            col("y"), col("s"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("y").cast("bigint")).cast("double") / count(lit(1)), 6)
              .as("pos_rate"),
            round(sum(round(col("s"), 9).cast("decimal(18,9)")).cast("double") /
              count(lit(1)), 6).as("mean_score"))
          .orderBy("bin")
    }
  }

  /** Threshold sweep for the trained quality filter: confusion counts
    * (tp/fp/fn/tn) and the derived precision/recall at each of the 10
    * reliability-bin edges — the evidence behind CHOOSING the filter
    * threshold (the last open knob in the train → score → calibrate →
    * filter chain; `curation_e2e_trained` hardcodes 0.5). All counts
    * are exact integers over replayed scores and the same replayed bin
    * edges, so the whole sweep hashes; precision/recall are one IEEE
    * divide each, rounded.
    */
  val qf_threshold_sweep: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("qf_threshold_sweep",
      Round10Ops2.gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, f.y, ($pred) AS s
           |           FROM feats f CROSS JOIN w${Round10Ops2.Epochs} w),
           |ext AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM scored),
           |ths AS (SELECT t, lo + (hi - lo) / 10 * t AS thr
           |        FROM ext, (SELECT unnest(range(0, 10)) AS t)),
           |cells AS (
           |  SELECT th.t, th.thr,
           |    SUM(CASE WHEN sc.s >= th.thr AND sc.y = 1 THEN 1 ELSE 0 END) AS tp,
           |    SUM(CASE WHEN sc.s >= th.thr AND sc.y = 0 THEN 1 ELSE 0 END) AS fp,
           |    SUM(CASE WHEN sc.s <  th.thr AND sc.y = 1 THEN 1 ELSE 0 END) AS fn,
           |    SUM(CASE WHEN sc.s <  th.thr AND sc.y = 0 THEN 1 ELSE 0 END) AS tn
           |  FROM scored sc CROSS JOIN ths th GROUP BY th.t, th.thr)
           |SELECT CAST(t AS INT) AS t,
           |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           |  CAST(ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS DOUBLE) AS prec,
           |  CAST(ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS DOUBLE) AS recall
           |FROM cells ORDER BY t""".stripMargin) { (spark, dir) =>
      import graft.operators.QualityModel
      val w = Round10Ops2.trainedWeights(spark, dir).last
      val scored = Round10Ops2.cleanDocs(spark, dir)
        .select(
          when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"),
          QualityModel.scoreExpr(Round10Ops2.featuresCol, w).as("s"))
      val ext = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
      val ths = spark.range(0, 10).select(col("id").as("t"))
        .crossJoin(broadcast(ext))
        .select(col("t"),
          (col("lo") + (col("hi") - col("lo")) / 10 * col("t")).as("thr"))
      // 10 thresholds broadcast against one corpus scan: the sweep is
      // a single pass with a 10-way conditional-sum fan-out, not 10
      // scans (and never a threshold-per-row shuffle)
      scored.crossJoin(broadcast(ths))
        .groupBy(col("t"), col("thr"))
        .agg(
          sum(when(col("s") >= col("thr") && col("y") === 1.0, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("s") >= col("thr") && col("y") === 0.0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("s") < col("thr") && col("y") === 1.0, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("s") < col("thr") && col("y") === 0.0, 1L)
            .otherwise(0L)).as("tn"))
        .select(col("t").cast("int").as("t"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("tp").cast("double") /
            nullif(col("tp") + col("fp"), lit(0L)), 6).as("prec"),
          round(col("tp").cast("double") /
            nullif(col("tp") + col("fn"), lit(0L)), 6).as("recall"))
        .orderBy("t")
    }
  }

  val all: Seq[OpQuery] =
    Seq(split_stratified_exact, emb_matryoshka_prefix, qf_score_reliability,
      qf_threshold_sweep)
}
