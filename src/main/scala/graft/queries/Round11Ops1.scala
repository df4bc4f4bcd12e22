package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{QualityModel, Sampling}

/** Round-11 batch 1: Hamming-tolerant video near-dup (pigeonhole
  * sub-banding over frame dHashes — VERDICT r10 item 2) and the gated
  * LOGISTIC quality filter (VERDICT r10 item 3).
  */
object Round11Ops1 {

  private def mix(a: Long, b: Long): Int = Round9Ops1.mix(a, b)

  /** Noisy video near-dup: a REAL lossy re-encode does not keep rasters
    * bit-exact — it flips 1–2 dHash bits per frame, and the r10 exact
    * band key (`mm_video_fingerprint`) then misses every band. This
    * gate runs [[graft.operators.Multimodal.videoBandFingerprints]]
    * with `subBands = 4` (each 64-bit frame hash split into four
    * 16-bit pigeonhole lanes, one folded key per lane) over a fixture
    * with PLANTED BIT PERTURBATIONS:
    *
    * quartets g = doc_id/4 of really-encoded 9×8 AVIs (12 frames) —
    *   - p0: the original clip;
    *   - p1: the noisy re-encode — per frame, EXACTLY one dHash bit
    *     flipped (pixel (8, y) of an even row y inverts comparison
    *     (7, y), the one bit that pixel feeds), at a different frame
    *     rate so the bytes differ everywhere;
    *   - p2: the over-perturbed decoy — per frame, one bit flipped in
    *     EVERY lane (odd rows 1/3/5/7 → lanes 0/1/2/3), so no lane
    *     survives on any frame;
    *   - p3: unrelated content.
    *
    * Known by construction: each band holds 3 sampled frames, so p0–p1
    * accumulates ≤ 3 flipped bits per band across 4 lanes — the
    * pigeonhole guarantees ≥ 1 untouched lane per band and the pair
    * collides on EVERY band (2 complete bands); p1's even-row flips
    * and p2's odd-row flips are disjoint, so p2 shares no lane key
    * with either p0 or p1; p3 collides with nothing (splitmix content
    * keys, 2⁻⁶⁴-scale chance). The oracle replays pairs and
    * distinct-shared-band counts from doc_id arithmetic alone. The
    * exact-mode twin (`mm_video_fingerprint`, subBands = 1) would find
    * NOTHING here — pinned in MultimodalSpec, which is the whole
    * point of the lane split.
    */
  val mm_video_fingerprint_noisy: OpQuery = OpQuery(
    "mm_video_fingerprint_noisy",
    """WITH d AS (SELECT doc_id FROM documents)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |       CAST(2 AS BIGINT) AS shared_bands
      |FROM d a JOIN d b
      |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id + 1 = b.doc_id
      |WHERE a.doc_id % 4 = 0
      |ORDER BY id1, id2""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val corpus = Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { d =>
        val g = d / 4; val p = (d % 4).toInt
        val contentKey = if (p == 3) 2000000000L + d else g
        // base luma in [30, 209]: room for the ±8 comparison inversion
        def base(f: Int, x: Int, y: Int): Int =
          30 + ((mix(contentKey, f * 1024L + y * 9 + x) % 180) + 180) % 180
        // rows whose (8, y) pixel must invert its (7, y) comparison:
        // p1 flips ONE even row per frame; p2 flips one odd row per
        // lane (1,3,5,7) — disjoint from p1's by parity
        def flippedRows(f: Int): Set[Int] = p match {
          case 1 => Set(2 * ((((mix(g * 7 + 13, f) % 4) + 4) % 4)))
          case 2 => Set(1, 3, 5, 7)
          case _ => Set.empty
        }
        val usPerFrame = p match {
          case 1 => 33333; case 2 => 25000; case _ => 40000
        }
        val payload = MediaCodec.encodeAvi(9, 8, 12, usPerFrame,
          (f, x, y) => {
            val v =
              if (x == 8 && flippedRows(f).contains(y)) {
                // invert the (7, y) comparison: bit was set iff
                // base(8) > base(7); push the pixel 8 levels past the
                // other side (luma of a gray pixel is exact)
                val v7 = base(f, 7, y)
                if (base(f, 8, y) > v7) v7 - 8 else v7 + 8
              } else base(f, x, y)
            (v << 16) | (v << 8) | v
          })
        (d, payload)
      })
      .toDF("media_id", "payload")
      .localCheckpoint(true)
    val fp = Multimodal.videoBandFingerprints(corpus, everyNth = 2,
      bandSize = 3, subBands = 4)
    fp.as("a").join(fp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.sub_idx") === col("b.sub_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id1"), col("b.media_id").as("id2"))
      // DISTINCT bands, not raw lane hits: how many lanes survive a
      // band is data-dependent (1–3 of 4); that ≥ 1 survives per band
      // is the pigeonhole guarantee the oracle replays
      .agg(countDistinct(col("a.band_idx")).as("shared_bands"))
      .orderBy("id1", "id2")
  }

  /** Scaled features for the LOGISTIC trainer: the same four text
    * statistics as `qf_linear_gd` but divided to O(1) ranges (tokens/100,
    * chars/1000, 'e'-count/100) — sigmoid gradients vanish when w·x
    * saturates, so raw hundreds-scale features would need a vanishing
    * learning rate; the identity-link gates keep the raw integer
    * features because THEIR replay depends on exact-integer products.
    */
  private def scaledFeaturesCol = array(
    lit(1.0),
    (size(split(trim(col("text")), "\\s+")) / 100.0),
    (col("n_chars") / 1000.0),
    ((length(col("text")) - length(expr("replace(text, 'e', '')"))) / 100.0))

  private val LogisticEpochs = 8
  private val LogisticLrLog2 = 2
  private val LogisticAccuracyBar = 0.85

  /** Train the logistic filter and REQUIRE it actually learned: final
    * train accuracy ≥ 0.85 against the n_chars > 300 label (chance is
    * ~0.5; the 8-epoch/lr=4 walk measures 0.94 at sf0.01). The REQUIRE
    * is the gate's correctness content — σ uses libm exp, which is
    * correctly-rounded nowhere guaranteed, so the walk is honestly NOT
    * hash-replayable cross-engine (QualityModel class doc) and the gate
    * is rows-only with this in-gate assertion instead (the
    * `sim_pq_rerank_verified` pattern; twin note in COVERAGE.md).
    */
  private def trainLogistic(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : (Seq[Array[Double]], Double,
         org.apache.spark.sql.DataFrame) = {
    val docs = Round10Ops2.cleanDocs(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        scaledFeaturesCol.as("features"),
        when(col("n_chars") > 300, 1.0).otherwise(0.0).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val walk = QualityModel.trainGD(docs, "features", "y", dim = 4,
      epochs = LogisticEpochs, lrLog2 = LogisticLrLog2,
      link = QualityModel.Logistic, quantizeDp = 9)
    val w = walk.last
    // σ(w·x) ≥ 0.5 ⇔ w·x ≥ 0: the threshold needs no exp at all
    val acc = docs.select(
        (when(QualityModel.scoreExpr(col("features"), w) > 0, 1.0)
          .otherwise(0.0) === col("y")).cast("int").as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    require(acc >= LogisticAccuracyBar,
      f"qf_logistic_gd: trained classifier accuracy $acc%.4f below the " +
        f"$LogisticAccuracyBar gate bar — the logistic walk regressed")
    (walk, acc, docs)
  }

  /** Trained LOGISTIC quality filter on the driver's correctness
    * surface (VERDICT r10 item 3 — the spec-pinned classifier was
    * driver-invisible). Rows-only by necessity (libm exp; see
    * [[trainLogistic]]); the gate's teeth are the in-gate accuracy
    * REQUIRE plus determinism of the quantized walk (order-independent
    * DECIMAL gradient sums make reruns bit-identical within an engine —
    * pinned across partitionings in QualityModelSpec). Output: the full
    * per-epoch weight walk and the final train accuracy.
    */
  val qf_logistic_gd: OpQuery = OpQuery.noOracle("qf_logistic_gd") {
    (spark, dir) =>
      import spark.implicits._
      val (walk, acc, docs) = trainLogistic(spark, dir)
      docs.unpersist(false)
      walk.zipWithIndex.flatMap { case (w, e) =>
        w.zipWithIndex.map { case (x, j) => (e + 1, j + 1, x, acc) }
      }.toDF("epoch", "dim", "weight", "train_accuracy")
        .select(col("epoch").cast("int"), col("dim").cast("int"),
          round(col("weight"), 9).as("weight"),
          round(col("train_accuracy"), 4).as("train_accuracy"))
        .orderBy("epoch", "dim")
  }

  /** Trained-CLASSIFIER curation end-to-end: featurize → train logistic
    * → filter at σ ≥ 0.5 (= w·x ≥ 0, exp-free) → exact-dedup survivors
    * → leakage-safe source-level split — `curation_e2e_trained`'s
    * classifier sibling (that gate's identity-link model is
    * hash-replayed; this one is rows-only with the accuracy REQUIRE).
    * Every stage after training is the oracle-green machinery of the
    * r10 gates, so what this gate adds to the surface is exactly the
    * logistic filter feeding them.
    */
  val curation_e2e_logistic: OpQuery = OpQuery.noOracle("curation_e2e_logistic") {
    (spark, dir) =>
      val (walk, _, docs) = trainLogistic(spark, dir)
      val w = walk.last
      val kept = docs.filter(QualityModel.scoreExpr(col("features"), w) > 0)
        .join(Round10Ops2.cleanDocs(spark, dir).select("doc_id", "text"),
          "doc_id")
      val survivors = graft.operators.Dedup.exact(kept, "doc_id", "text")
        .select(col("doc_id"), col("source"), col("lang"))
      val out = Sampling.leakageSafeSplit(survivors, "doc_id", "source",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("lang"))
      docs.unpersist(false)
      out
  }

  /** INCREMENTAL trained-curation re-score (VERDICT r10 item 6): the
    * corpus arrives in three ingest batches (langs {de,en,es}, then
    * {fr}, then {zh}); each batch is scored map-side with the FROZEN
    * trained weights and merged through the append-CDC path
    * ([[graft.operators.QualityModel.scoreIncremental]] →
    * `Merge.insertOnlyPartitionAligned` on the lang partition), so an
    * append touches ONLY its own langs' partitions — the existing
    * corpus is never re-scored and untouched partitions stay
    * byte-identical on disk (pinned in QualityModelSpec). The oracle
    * is a FULL recompute: DuckDB re-derives the weights through the
    * 3-epoch CTE walk and scores every document in one query —
    * incremental == full is the gate's hash claim.
    */
  val curation_incremental_score: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("curation_incremental_score",
      Round10Ops2.gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, ($pred) AS s
           |           FROM feats f CROSS JOIN w${Round10Ops2.Epochs} w)
           |SELECT doc_id, CAST(ROUND(s, 9) AS DOUBLE) AS score
           |FROM scored ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val w = Round10Ops2.trainedWeights(spark, dir).last
      val docs = Round10Ops2.cleanDocs(spark, dir)
        .select(col("doc_id"), col("lang"),
          Round10Ops2.featuresCol.as("features"))
      val scratch = GateScratch.dir("graft-incscore-gate-")
      val store = new graft.operators.TableStore(spark, scratch.toString)
      // batches are DERIVED from the data (ADVICE r11: a hardcoded lang
      // list silently skips any lang a fixture refresh adds, and the
      // full-recompute oracle would then fail with an opaque hash
      // mismatch): the distinct langs, sorted, round-robin into 3
      // ingest groups — same 3-batch shape, no coverage assumption.
      // Bounded collect: langs are a dictionary column (5 values at the
      // committed fixture), never corpus-sized.
      val langs = docs.select(col("lang")).where(col("lang").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted
      val batches = langs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
        .map(_._2.map(_._1).toSeq)
      batches.foreach { group =>
        QualityModel.scoreIncremental(store, "scored_docs",
          docs.filter(col("lang").isInCollection(group)),
          featCol = "features", weights = w,
          keyCol = "doc_id", partCol = "lang")
      }
      // completeness REQUIRE: every doc the oracle scores was ingested —
      // a NULL-lang doc (which the lang-partitioned batches can't carry)
      // fails HERE with a clear message, not downstream as a hash diff
      val nIn = docs.count()
      val nStored = store.read("scored_docs").count()
      require(nStored == nIn,
        s"curation_incremental_score: ingested $nStored of $nIn docs — " +
          "some docs (NULL lang?) missed every lang-partitioned batch")
      store.read("scored_docs")
        .select(col("doc_id"), round(col("score"), 9).as("score"))
        .orderBy("doc_id")
    }
  }

  /** Dense-id dictionary encoding round-trip (VERDICT r10 item 5): the
    * helper that lets string-keyed corpora reach every integral-id
    * ANN/top-k entry point. Ids are `DENSE_RANK() OVER (ORDER BY key)`
    * exactly (assigned by the distributed [[graft.operators.TotalOrder
    * .rowNumber]] over the distinct keys — no single-reducer window, no
    * partition-dependent zipWithUniqueId), so DuckDB replays the whole
    * id↔key bijection. Output pins BOTH directions: the mapping rows
    * (id, key) and the encode-side join-back (per-id document counts);
    * an in-gate REQUIRE pins decode(encode(df)) == df row-for-row.
    */
  val ids_dense_roundtrip: OpQuery = OpQuery("ids_dense_roundtrip",
    """WITH m AS (
      |  SELECT source,
      |         CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS dense_id
      |  FROM (SELECT DISTINCT source FROM documents WHERE source IS NOT NULL))
      |SELECT m.dense_id, m.source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM documents d JOIN m ON d.source = m.source
      |GROUP BY m.dense_id, m.source
      |ORDER BY dense_id""".stripMargin) { (spark, dir) =>
    import graft.operators.DenseIds
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val (encoded, mapping) = DenseIds.withDenseIds(docs, "source")
    // round-trip REQUIRE: decoding the encoded frame restores every
    // (doc_id, source) pair exactly — the bijection has no blind spots
    val decoded = DenseIds.decode(
      encoded.select(col("doc_id"), col("dense_id")),
      mapping, "dense_id", "dense_id", "source")
    val diffs = decoded.select(col("doc_id"), col("source"))
      .exceptAll(docs).count() +
      docs.exceptAll(decoded.select(col("doc_id"), col("source"))).count()
    require(diffs == 0,
      s"ids_dense_roundtrip: decode(encode(df)) diverged on $diffs rows")
    encoded.groupBy(col("dense_id"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("dense_id")
  }

  /** An existing ANN entry point driven END-TO-END over STRING ids
    * through the dense-id helper (VERDICT r10 item 5's second half):
    * keys 'v:<n>' are dictionary-encoded, mined through the integral-id
    * [[graft.operators.Similarity.bruteForceTopK]] (which REFUSES
    * string ids), and decoded back — the oracle computes the same
    * top-3 directly over the string keys. Rank ties break on the dense
    * id, which is monotone in the string key by construction, so the
    * two tie-break orders agree.
    */
  val sim_topk_string_ids: OpQuery = OpQuery("sim_topk_string_ids",
    """WITH q AS (
      |  SELECT 'v:' || CAST(vec_id AS VARCHAR) AS qkey, embedding::DOUBLE[] AS qvec
      |  FROM embeddings WHERE vec_id % 16 = 0 AND vec_id < 1280
      |), scored AS (
      |  SELECT q.qkey, 'v:' || CAST(e.vec_id AS VARCHAR) AS ckey,
      |         list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS score
      |  FROM embeddings e, q
      |  WHERE 'v:' || CAST(e.vec_id AS VARCHAR) <> q.qkey
      |), ranked AS (
      |  SELECT qkey, ckey,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY qkey
      |              ORDER BY score DESC, ckey ASC) AS INT) AS rank,
      |         score
      |  FROM scored
      |)
      |SELECT qkey AS query_key, ckey AS corpus_key, rank,
      |       CAST(ROUND(score, 6) AS DOUBLE) AS score
      |FROM ranked WHERE rank <= 3
      |ORDER BY query_key, rank""".stripMargin) { (spark, dir) =>
    import graft.operators.{DenseIds, Similarity}
    val stringKeyed = Tables.load(spark, dir, "embeddings")
      .select(concat(lit("v:"), col("vec_id").cast("string")).as("key"),
        col("embedding"))
    val (encoded, mapping) = DenseIds.withDenseIds(stringKeyed, "key", "vec_id")
    val corpus = encoded.select(col("vec_id"), col("embedding"))
    // query selection parses the numeric tail of the STRING key — the
    // gate's inputs never touch the original vec_id column
    // query set BOUNDED (round-12 sf1 flag, e = 1.39 at 10x: a %-16
    // slice scales the query count with the corpus, so brute-force work
    // grew as n^2/16 — fixture design, not the operator); 80 queries
    // fixed, corpus still sf-scaled, work linear in n
    val queries = encoded
      .filter(substring(col("key"), 3, 18).cast("long") % 16 === 0 &&
        substring(col("key"), 3, 18).cast("long") < 1280)
      .select(col("vec_id"), col("embedding"))
    val topk = Similarity.bruteForceTopK(corpus, queries, k = 3)
    val decoded = DenseIds.decode(
      DenseIds.decode(topk, mapping, "query_id", "vec_id", "key", "query_key"),
      mapping, "corpus_id", "vec_id", "key", "corpus_key")
    decoded.select(col("query_key"), col("corpus_key"), col("rank"),
        round(col("score"), 6).cast("double").as("score"))
      .orderBy("query_key", "rank")
  }

  /** Adaptive hard-negative mining on the gate surface: the engine
    * turns the shortlist knob itself (starved queries retry alone at
    * 4× until satisfied or the exact tail fires), so found_k < k can
    * only mean the corpus lacks candidates. Rows-only (the 1-bit
    * signature rounds are not SQL-replayable — the `sim_lsh_neardup`
    * impossibility class; the exact twin is `mine_hard_negatives`);
    * the gate's teeth are two in-gate REQUIREs: every query ends with
    * exactly k negatives (the fixed-s operator measurably starves on
    * label-dense corpora, SCALE.md), and no same-label pair survives
    * any round.
    */
  val mine_hard_negatives_adaptive: OpQuery =
    OpQuery.noOracle("mine_hard_negatives_adaptive") { (spark, dir) =>
      import graft.operators.Similarity
      val emb = Tables.load(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 8 === 0)
      val out = Similarity.hardNegativesAdaptive(emb, queries, k = 3,
        initialShortlist = 3).localCheckpoint(true)
      val nq = queries.count()
      val short = out.groupBy(col("query_id"))
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 3).count()
      val covered = out.select(col("query_id")).distinct().count()
      require(short == 0 && covered == nq,
        s"adaptive mining left starvation behind: $short short queries, " +
          s"$covered/$nq covered")
      val sameLabel = out
        .join(emb.select(col("vec_id").as("query_id"), col("label").as("ql")),
          "query_id")
        .join(emb.select(col("vec_id").as("corpus_id"), col("label").as("cl")),
          "corpus_id")
        .filter(col("ql") === col("cl")).count()
      require(sameLabel == 0, s"$sameLabel same-label pairs mined")
      out.withColumn("score", round(col("score"), 6).cast("double"))
        .orderBy(col("query_id"), col("rank"))
    }

  val all: Seq[OpQuery] =
    Seq(mm_video_fingerprint_noisy, qf_logistic_gd, curation_e2e_logistic,
      curation_incremental_score, ids_dense_roundtrip, sim_topk_string_ids,
      mine_hard_negatives_adaptive)
}
