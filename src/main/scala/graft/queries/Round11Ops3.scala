package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DenseIds, QualityModel, TotalOrder}

/** Round-11 batch 3: the maintenance halves of the round's two
  * incremental stories — UPSERT re-score for EDITED documents (appends
  * were batch 1) and stable dictionary GROWTH for dense ids (one-shot
  * builds were batch 1) — plus exact top-p% corpus selection by the
  * trained score (the other way curation thresholds get chosen:
  * budget-first instead of score-first).
  */
object Round11Ops3 {

  /** Edited documents re-scored through the SCD1 upsert path: the full
    * corpus is ingested scored (frozen 3-epoch weights), then every
    * doc_id % 7 == 0 document arrives EDITED (n_chars + 10 → a
    * different f3, a different score) and
    * [[graft.operators.QualityModel.scoreUpsert]] replaces exactly
    * those rows in exactly their lang partitions. The oracle is a full
    * recompute over the EDITED corpus (same CTE weight walk, CASE'd
    * f3) — upsert == full, hash-pinned; untouched-partition
    * byte-identity is QualityModelSpec territory.
    */
  val curation_incremental_rescore: OpQuery = {
    val pred = "f.f1 * w.w1 + f.f2 * w.w2 + " +
      "(CASE WHEN f.doc_id % 7 = 0 THEN f.f3 + 10 ELSE f.f3 END) * w.w3 + " +
      "f.f4 * w.w4"
    OpQuery("curation_incremental_rescore",
      Round10Ops2.gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, ($pred) AS s
           |           FROM feats f CROSS JOIN w${Round10Ops2.Epochs} w)
           |SELECT doc_id, CAST(ROUND(s, 9) AS DOUBLE) AS score
           |FROM scored ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val w = Round10Ops2.trainedWeights(spark, dir).last
      val base = Round10Ops2.cleanDocs(spark, dir)
      val docs = base.select(col("doc_id"), col("lang"),
        Round10Ops2.featuresCol.as("features"))
      val scratch = GateScratch.dir("graft-rescore-gate-")
      val store = new graft.operators.TableStore(spark, scratch.toString)
      QualityModel.scoreIncremental(store, "scored", docs,
        featCol = "features", weights = w, keyCol = "doc_id", partCol = "lang")
      // the edit: same docs, same keys, f3 shifted — new features, new score
      val editedFeatures = array(
        lit(1.0),
        size(split(trim(col("text")), "\\s+")).cast("double"),
        (col("n_chars") + 10).cast("double"),
        (length(col("text")) - length(expr("replace(text, 'e', '')")))
          .cast("double"))
      val changed = base.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"), editedFeatures.as("features"))
      QualityModel.scoreUpsert(store, "scored", changed,
        featCol = "features", weights = w, keyCol = "doc_id", partCol = "lang")
      store.read("scored")
        .select(col("doc_id"), round(col("score"), 9).as("score"))
        .orderBy("doc_id")
    }
  }

  /** Dictionary growth without re-encoding history: batch 1 builds the
    * dense-id mapping over the non-zh (source:lang) keys; batch 2's
    * ingest brings the zh keys, which
    * [[graft.operators.DenseIds.extendDenseIds]] appends AFTER the
    * existing max id (key-ordered among themselves) while every
    * existing id stays frozen — the contract that keeps downstream
    * indexes keyed on old ids valid across ingests. The oracle replays
    * both generations' rankings; an in-gate REQUIRE pins that batch
    * 1's mapping survives unchanged inside the extended one.
    */
  val ids_dense_extend: OpQuery = OpQuery("ids_dense_extend",
    """WITH k AS (SELECT DISTINCT source || ':' || lang AS key, lang
      |           FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL),
      |b1 AS (SELECT key FROM k WHERE lang <> 'zh'),
      |b2 AS (SELECT key FROM k WHERE lang = 'zh'),
      |m1 AS (SELECT key, CAST(ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS dense_id
      |       FROM b1),
      |m2 AS (SELECT key,
      |         CAST((SELECT COUNT(*) FROM b1) +
      |              ROW_NUMBER() OVER (ORDER BY key) AS BIGINT) AS dense_id
      |       FROM b2)
      |SELECT dense_id, key FROM m1
      |UNION ALL
      |SELECT dense_id, key FROM m2
      |ORDER BY dense_id""".stripMargin) { (spark, dir) =>
    val keyed = Tables.load(spark, dir, "documents")
      .filter(col("source").isNotNull && col("lang").isNotNull)
      .select(concat(col("source"), lit(":"), col("lang")).as("key"),
        col("lang"))
    val (_, mapping1) = DenseIds.withDenseIds(
      keyed.filter(col("lang") =!= "zh"), "key")
    val extended = DenseIds.extendDenseIds(mapping1, keyed, "key")
      .localCheckpoint(true)
    // id stability REQUIRE: every batch-1 assignment survives verbatim
    val changedOld = mapping1.join(extended,
        mapping1("key") === extended("key") &&
          mapping1("dense_id") =!= extended("dense_id")).count()
    require(changedOld == 0,
      s"extendDenseIds moved $changedOld existing ids — growth must never " +
        "re-encode history")
    extended.select(col("dense_id"), col("key")).orderBy("dense_id")
  }

  /** Exact top-10% corpus selection by trained quality score — the
    * budget-first threshold (keep the best p%, whatever score that
    * means today) vs `qf_threshold_sweep`'s score-first one. Exact and
    * distributed: the global (score desc, doc_id) rank runs through
    * [[graft.operators.TotalOrder.rowNumberWithCount]] (range shuffle +
    * per-partition offsets — no single-reducer sort), cut at
    * ⌊n·10/100⌋; DuckDB replays the identical rank and cut.
    */
  val qf_top_percent: OpQuery = {
    val pred = (1 to 4).map(j => s"f.f$j * w.w$j").mkString(" + ")
    OpQuery("qf_top_percent",
      Round10Ops2.gdWalkSql +
        s""",
           |scored AS (SELECT f.doc_id, ($pred) AS s
           |           FROM feats f CROSS JOIN w${Round10Ops2.Epochs} w),
           |ranked AS (SELECT doc_id, s,
           |    ROW_NUMBER() OVER (ORDER BY s DESC, doc_id ASC) AS rn,
           |    COUNT(*) OVER () AS n
           |  FROM scored)
           |SELECT doc_id, CAST(ROUND(s, 9) AS DOUBLE) AS score
           |FROM ranked WHERE rn <= FLOOR(n * 10 / 100)
           |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val w = Round10Ops2.trainedWeights(spark, dir).last
      val scored = Round10Ops2.cleanDocs(spark, dir)
        .select(col("doc_id"),
          QualityModel.scoreExpr(Round10Ops2.featuresCol, w).as("s"))
      TotalOrder.rowNumberWithCount(scored,
          Seq(col("s").desc, col("doc_id").asc), "rn", "n")
        .filter(col("rn") <= floor(col("n") * 10 / 100))
        .select(col("doc_id"), round(col("s"), 9).as("score"))
        .orderBy("doc_id")
    }
  }

  val all: Seq[OpQuery] =
    Seq(curation_incremental_rescore, ids_dense_extend, qf_top_percent)
}
