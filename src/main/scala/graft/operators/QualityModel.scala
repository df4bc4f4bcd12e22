package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the trainable half of corpus
  * curation. The heuristic scorers in
  * [[graft.functions.TextFunctions]] (length/stopword/punct ratios)
  * are fixed formulas; every production-scale pretraining pipeline
  * eventually REPLACES them with a trained classifier over the same
  * cheap features (the "fastText quality filter" pattern: label a few
  * exemplar sets, fit a linear model, score the whole corpus). This
  * operator is that trainer, built Spark-first:
  *
  *   - training is FULL-BATCH gradient descent where each epoch is ONE
  *     distributed pass: per-row prediction `w·x` map-side (broadcast
  *     weights as a literal — no shuffle), then per-dimension gradient
  *     contributions `(pred − y)·x_j` summed by a dim-keyed aggregate
  *     (map-side partial combine; d records per partition reach the
  *     shuffle). Driver traffic is O(d) per epoch. At 100 TB the cost
  *     is `epochs` corpus scans over a persisted feature projection —
  *     the same register as the block power iteration.
  *   - scoring is a pure map-side expression ([[scoreExpr]]): the
  *     trained weights travel as a literal into whole-stage codegen,
  *     so quality-filtering a corpus is one scan with a filter, no
  *     join, no shuffle, no UDF.
  *
  * ENGINE-REPLAYABLE arithmetic (the established quantized-walk
  * pattern, see [[Similarity.topPrincipalComponentsGram]]'s
  * `quantizeDp` doc): with `quantizeDp > 0` each per-row gradient
  * contribution is one IEEE multiply rounded to `quantizeDp` decimals
  * and summed in DECIMAL — order-independent — and every driver-side
  * scalar step (g/n, w − lr·g) is a single correctly-rounded IEEE op
  * on bit-identical operands, with `lr` a power of two so the scaling
  * is exact. The per-row prediction folds terms LEFT-TO-RIGHT
  * (0 + x₁w₁ + x₂w₂ + …), matching SQL's left-associative `+`, so a
  * SQL engine replays the whole multi-epoch walk bit-for-bit (the
  * `qf_linear_gd` gate hash-oracles 3 epochs end-to-end in DuckDB).
  *
  * The `logistic` link trains a classifier (σ(w·x) via `Math.exp`);
  * exp is correctly-rounded NOWHERE guaranteed and differs across
  * libm implementations, so the logistic walk is NOT hash-replayable
  * across engines — its accuracy and determinism-across-partitionings
  * are pinned in QualityModelSpec instead (same stance as the other
  * transcendental paths).
  */
object QualityModel {

  sealed trait Link
  case object Identity extends Link
  case object Logistic extends Link

  /** The map-side linear score `w·x`, folded left-to-right from
    * `lit(0.0)` — the exact arithmetic shape the trainer used, so
    * scoring replays training's predictions bit-for-bit.
    *
    * A NULL or ragged vector scores NULL (zip_with pads the shorter
    * side with NULL and the sum propagates it), so the row sorts out
    * of every top-k / fails every threshold filter instead of scoring
    * on a silently-truncated dot product — the same visible-failure
    * stance as [[Similarity.signBitSignature]]'s NULL signature.
    */
  def scoreExpr(featCol: Column, weights: Array[Double]): Column =
    aggregate(
      zip_with(featCol, typedLit(weights.toSeq), (x, c) => x * c),
      lit(0.0), (acc, t) => acc + t)

  /** INCREMENTAL re-score (VERDICT r10 item 6): maintain a scored
    * corpus table under append-only ingest without ever re-scoring the
    * existing corpus. [[scoreExpr]] is a pure per-row map — a row's
    * score depends on nothing but the row and the frozen weights — so
    * score maintenance IS the append-CDC insert path:
    * `newDocs` are scored map-side (weights as codegen literals, no
    * join, no shuffle) and merged through
    * [[Merge.insertOnlyPartitionAligned]], which rewrites ONLY the
    * partitions the batch touches; every other partition's files stay
    * byte-identical on disk (pinned in QualityModelSpec). At 100 TB a
    * nightly ingest batch costs O(batch + touched partitions), not a
    * corpus re-score — `incremental == full-recompute` is hash-pinned
    * by the `curation_incremental_score` gate.
    *
    * Contract (inherited from the aligned merge): `keyCol` determines
    * its partition value, and re-sent keys are deduplicated
    * insert-only (first write wins) — a CHANGED document re-ingested
    * under the same key is the SCD1 path, not this one. The feature
    * column is consumed (scored) and dropped; the stored table carries
    * `newDocs`' other columns plus `scoreCol`.
    */
  def scoreIncremental(
      store: TableStore, table: String, newDocs: DataFrame,
      featCol: String, weights: Array[Double],
      keyCol: String, partCol: String,
      scoreCol: String = "score"): Unit = {
    val scored = newDocs
      .withColumn(scoreCol, scoreExpr(col(featCol), weights))
      .drop(featCol)
    Merge.insertOnlyPartitionAligned(store, table, scored,
      keys = Seq(keyCol), partCol = partCol)
  }

  /** UPSERT re-score: the CHANGED-document half of incremental score
    * maintenance ([[scoreIncremental]] covers appends). An edited
    * document re-ingested under its key carries new features and needs
    * its stored score REPLACED — the SCD1 shape — so this routes the
    * map-side-scored batch through [[Merge.scd1PartitionAligned]]:
    * only the partitions the batch touches are read/merged/rewritten,
    * the key's other columns update alongside the score, and untouched
    * partitions stay byte-identical (contract inherited: the key
    * determines its partition — a doc moving partitions is a
    * delete+insert the caller must express explicitly).
    * `curation_incremental_rescore` hash-pins upsert == full recompute
    * over the edited corpus.
    */
  def scoreUpsert(
      store: TableStore, table: String, changedDocs: DataFrame,
      featCol: String, weights: Array[Double],
      keyCol: String, partCol: String,
      scoreCol: String = "score"): Unit = {
    val scored = changedDocs
      .withColumn(scoreCol, scoreExpr(col(featCol), weights))
      .drop(featCol)
    val updateCols = scored.columns
      .filterNot(c => c.equalsIgnoreCase(keyCol) || c.equalsIgnoreCase(partCol))
    Merge.scd1PartitionAligned(store, table, scored,
      keys = Seq(keyCol), updateCols = updateCols.toSeq, partCol = partCol)
  }

  /** Full-batch gradient-descent training; returns the weight vector
    * AFTER each epoch (length `epochs`). Weights start at zero.
    *
    * Update rule per epoch (mean-gradient, so the step size is
    * corpus-size-invariant and the same `lrLog2` works at any scale
    * factor): `w_j ← w_j − 2^lrLog2 · (Σ_i (pred_i − y_i)·x_ij) / n`.
    *
    * Input contract: `featCol` is an array<double> of EXACTLY `dim`
    * elements (enforced; a ragged feature row is a featurizer bug, and
    * silently zero-padding it would skew the gradient), `labelCol`
    * numeric. Rows with a NULL feature array or NULL label are
    * excluded from n and the gradient; NULL ELEMENTS inside a feature
    * vector are 0 (absent feature), matching the corpus-walk semantics
    * elsewhere.
    *
    * @param lrLog2 log2 of the learning rate (lr = 2^lrLog2, exact in
    *        double, so the replay's scaling step is one exact multiply)
    * @param quantizeDp > 0 rounds each per-row contribution to this
    *        many decimals and sums in DECIMAL (order-independent,
    *        engine-replayable); 0 sums raw doubles (fastest, bitwise
    *        nondeterministic across partitionings like any float sum)
    */
  def trainGD(
      df: DataFrame, featCol: String, labelCol: String, dim: Int,
      epochs: Int, lrLog2: Int, link: Link = Identity,
      quantizeDp: Int = 0): Seq[Array[Double]] = {
    require(dim >= 1, s"need dim >= 1, got $dim")
    require(epochs >= 1, s"need >= 1 epoch, got $epochs")
    val lr = math.pow(2.0, lrLog2)
    val base = df
      .select(
        // NULL vector first: it is EXCLUDED (a missing row), not ragged —
        // and size(NULL) is -1 in legacy mode, which would otherwise
        // take the raise branch
        when(col(featCol).isNull, lit(null).cast("array<double>"))
          .when(size(col(featCol)) === dim,
            transform(col(featCol).cast("array<double>"),
              x => coalesce(x, lit(0.0))))
          .otherwise(raise_error(concat(
            lit(s"trainGD: feature vector of length "), size(col(featCol)),
            lit(s" != dim $dim — ragged features are a featurizer bug"))))
          .as("__f"),
        col(labelCol).cast("double").as("__y"))
      .filter(col("__f").isNotNull && col("__y").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = new Array[Double](dim)
      val out = Seq.newBuilder[Array[Double]]
      for (_ <- 1 to epochs) {
        val pred = scoreExpr(col("__f"), w)
        val resid = (link match {
          case Identity => pred
          case Logistic =>
            // σ via expm1-free direct form; engine-local (see class doc)
            lit(1.0) / (lit(1.0) + exp(-pred))
        }) - col("__y")
        val contrib = col("__x") * col("__r")
        val qContrib =
          if (quantizeDp > 0)
            round(contrib, quantizeDp).cast(s"decimal(38,$quantizeDp)")
          else contrib
        // gradient: posexplode fans each row into d (dim, x_j) pairs that
        // carry the row's residual; the dim-keyed agg partial-combines
        // map-side, so the shuffle moves d records per partition
        val rows = base
          .select(resid.as("__r"), posexplode(col("__f")).as(Seq("__j", "__x")))
          .groupBy(col("__j"))
          .agg(sum(qContrib).cast("double").as("__g"),
            count(lit(1)).as("__n"),
            // non-null contributions: under quantizeDp > 0 a SINGLE
            // per-row product with |value| >= 1e29 overflows its cast
            // to decimal(38,dp) to NULL in non-ANSI mode and sum()
            // skips it while n still counts the row — the gradient
            // would be silently wrong for that epoch even though the
            // SUM-level overflow guard below never fires (ADVICE r10)
            count(qContrib).as("__nn"))
          .collect()
        val g = new Array[Double](dim)
        var n = 0L
        rows.foreach { row =>
          if (row.isNullAt(1))
            throw new IllegalStateException(
              s"trainGD: gradient sum for dim ${row.getInt(0)} overflowed " +
                s"decimal(38,$quantizeDp) — the walk is diverging; lower " +
                "the learning rate (lrLog2) or rescale the features")
          if (row.getLong(3) != row.getLong(2))
            throw new IllegalStateException(
              s"trainGD: ${row.getLong(2) - row.getLong(3)} per-row gradient " +
                s"contribution(s) for dim ${row.getInt(0)} overflowed " +
                s"decimal(38,$quantizeDp) and were dropped from the sum — " +
                "a pathological feature row must fail loudly, not skew the " +
                "gradient; rescale the features or lower the learning rate")
          g(row.getInt(0)) = row.getDouble(1)
          n = row.getLong(2)
        }
        require(n > 0, "trainGD: no trainable rows (all features/labels null)")
        val nw = new Array[Double](dim)
        var j = 0
        while (j < dim) { nw(j) = w(j) - lr * (g(j) / n); j += 1 }
        w = nw
        out += w.clone()
      }
      out.result()
    } finally base.unpersist(false)
  }
}
