package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{PqAdc, PqCellResidual, PqEncode, PqEncodePacked,
  PqEncodeResidual, PqProbeCells, PqQueryLut}

/** Product quantization ANN (Jégou et al.): compress each D-dim vector
  * to m sub-codebook indices (m bytes-ish vs 4·D), then answer top-k by
  * ASYMMETRIC distance — the query stays full-precision, each corpus
  * vector is scored as a sum of m LUT lookups. Completes the engine's
  * ANN ladder: brute (exact) → int8 (4× less bandwidth) → IVF (prune
  * cells) → PQ (16–32× compression, the regime where 100 TB of vectors
  * stops fitting storage budgets at all).
  *
  * Scale shape:
  *  - [[train]] is DRIVER-side Lloyd per subspace over a bounded,
  *    deterministic sample (`orderBy(id).limit(sampleCap)`) — the
  *    faiss convention: codebooks converge on ~10⁴–10⁶ samples no
  *    matter the corpus size, so training never shuffles the corpus.
  *  - [[encode]] is MAP-ONLY (one native [[PqEncode]] projection);
  *    at 100 TB the encoded table is materialized once and reused
  *    across every query batch, 16–32× smaller than the raw vectors.
  *  - [[adcTopK]] broadcasts per-query LUTs (m·k doubles per query) and
  *    scans the encoded corpus once for the whole batch; per-query
  *    top-k runs through the bounded-heap TopKAgg like the brute path —
  *    k rows per (query × partition) shuffle, never the scored corpus.
  */
object Pq {

  /** Codebook layout: `flat[(s*k + j)*subDim + t]` = coordinate t of
    * centroid j in subspace s.
    */
  final case class Codebook(m: Int, k: Int, subDim: Int, flat: Array[Double]) {
    def dim: Int = m * subDim

    /** Driver-side encode (mirrors the [[graft.expressions.PqExprs]]
      * kernel: strict-less argmin, lowest-j ties) — used for residual
      * computation during training and probe-side LUT building.
      */
    def encodeOne(v: Array[Double]): Array[Int] = {
      require(v.length == dim, s"vector dim ${v.length} != codebook dim $dim")
      Array.tabulate(m) { s =>
        var best = 0; var bestD = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val base = (s * k + j) * subDim
          var acc = 0.0; var t = 0
          while (t < subDim) {
            val diff = v(s * subDim + t) - flat(base + t)
            acc += diff * diff; t += 1
          }
          if (acc < bestD) { bestD = acc; best = j }
          j += 1
        }
        best
      }
    }

    /** v minus its reconstruction — for an m=1 (coarse) codebook this is
      * the IVF residual that second-level PQ codebooks train on.
      */
    def residualOf(v: Array[Double]): Array[Double] = {
      val codes = encodeOne(v)
      val r = new Array[Double](dim)
      var s = 0
      while (s < m) {
        val base = (s * k + codes(s)) * subDim
        var t = 0
        while (t < subDim) {
          r(s * subDim + t) = v(s * subDim + t) - flat(base + t)
          t += 1
        }
        s += 1
      }
      r
    }

    /** Per-query ADC lookup table: lut[s*k + j] = ‖q_s − c_{s,j}‖². */
    def lutFor(query: Array[Double]): Array[Double] = {
      require(query.length == dim,
        s"query dim ${query.length} != codebook dim $dim")
      val lut = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < k) {
          val base = (s * k + j) * subDim
          var acc = 0.0
          var t = 0
          while (t < subDim) {
            val diff = query(s * subDim + t) - flat(base + t)
            acc += diff * diff
            t += 1
          }
          lut(s * k + j) = acc
          j += 1
        }
        s += 1
      }
      lut
    }
  }

  /** Register the PQ function surface — sourced from the ONE canonical
    * (name → builder) list in [[graft.GraftFunctions.all]], so this
    * operator-local registration can never drift from the
    * SparkSessionExtensions / registerAll surface.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftFunctions.all
      .filter { case (name, _) => name.startsWith("pq_") }
      .foreach { case (name, builder) =>
        graft.GraftFunctions.registerIfAbsent(reg, name, builder, "built-in") }
  }

  private def asDoubles(v: Any): Array[Double] =
    v.asInstanceOf[scala.collection.Seq[Any]].iterator.map {
      case null => 0.0
      case d: java.lang.Double => d.doubleValue
    }.toArray

  /** Per-subspace Lloyd on a bounded deterministic sample. Init:
    * centroid j of every subspace = sample vector j's subvector (the
    * seeded-by-id convention [[Similarity.centroids]] uses). A cell
    * that wins zero samples keeps its previous centroid — dropping it
    * would silently shrink k.
    */
  def train(corpus: DataFrame, m: Int, k: Int, iters: Int,
      sampleCap: Int = 16384,
      idCol: String = "vec_id", vecCol: String = "embedding"): Codebook =
    trainOnSample(collectSample(corpus, sampleCap, idCol, vecCol), m, k, iters)

  /** The bounded, deterministic (id-ordered) training sample. */
  private[operators] def collectSample(corpus: DataFrame, sampleCap: Int,
      idCol: String, vecCol: String): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(sampleCap)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(r => asDoubles(r.get(0)))

  /** Driver-side Lloyd over an in-memory sample — shared by [[train]]
    * and the residual training in [[PqIndex.build]].
    */
  private[operators] def trainOnSample(sample: Array[Array[Double]],
      m: Int, k: Int, iters: Int): Codebook = {
    require(m > 0 && k > 0 && iters >= 0, s"bad PQ params m=$m k=$k iters=$iters")
    require(sample.length >= k,
      s"need at least k=$k training vectors, got ${sample.length}")
    val d = sample.head.length
    require(d > 0 && d % m == 0, s"dim $d not divisible into m=$m subspaces")
    require(sample.forall(_.length == d), "ragged embedding lengths in sample")
    val sub = d / m
    val flat = new Array[Double](k * d)
    for (s <- 0 until m; j <- 0 until k; t <- 0 until sub)
      flat((s * k + j) * sub + t) = sample(j)(s * sub + t)
    var it = 0
    while (it < iters) {
      val sums = new Array[Double](k * d)
      val counts = new Array[Long](m * k)
      sample.foreach { v =>
        var s = 0
        while (s < m) {
          var best = 0; var bestD = Double.PositiveInfinity
          var j = 0
          while (j < k) {
            val base = (s * k + j) * sub
            var acc = 0.0; var t = 0
            while (t < sub) {
              val diff = v(s * sub + t) - flat(base + t)
              acc += diff * diff; t += 1
            }
            if (acc < bestD) { bestD = acc; best = j }
            j += 1
          }
          val base = (s * k + best) * sub
          var t = 0
          while (t < sub) { sums(base + t) += v(s * sub + t); t += 1 }
          counts(s * k + best) += 1
          s += 1
        }
      }
      for (s <- 0 until m; j <- 0 until k; if counts(s * k + j) > 0) {
        val base = (s * k + j) * sub
        val n = counts(s * k + j).toDouble
        var t = 0
        while (t < sub) { flat(base + t) = sums(base + t) / n; t += 1 }
      }
      it += 1
    }
    Codebook(m, k, sub, flat)
  }

  /** Column form of the encoder (for callers composing their own plan). */
  def encodeExpr(vec: Column, cb: Codebook): Column =
    call_function("pq_encode", vec, lit(cb.flat), lit(cb.m))

  /** Map-only corpus encoding: (corpus_id, pq_code array<int>). */
  def encode(corpus: DataFrame, cb: Codebook,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    register(corpus.sparkSession)
    corpus.select(
      col(idCol).as("corpus_id"),
      encodeExpr(col(vecCol), cb).as("pq_code"))
  }

  /** ADC top-k per query over a pre-encoded corpus. `queries` is
    * collected to build the LUTs (bounded — the same contract as the
    * brute/IVF paths' broadcast query side). Output:
    * (query_id, corpus_id, rank, adc) ranked by (adc asc, corpus_id
    * asc); self-matches are excluded like [[Similarity.bruteForceTopK]].
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, cb: Codebook,
      topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    register(spark)
    val qRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(qRows.length <= 4096,
      s"query batch of ${qRows.length} too large to LUT-broadcast — split it")
    import spark.implicits._
    val qluts = qRows.toSeq.map(r => (r.getLong(0), cb.lutFor(asDoubles(r.get(1)))))
    val q = qluts.toDF("query_id", "lut")
    val scored = encoded
      .join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("score", -call_function("pq_adc", col("pq_code"), col("lut")))
    Similarity.topKPerGroup(scored, col("query_id"), topK)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        (-col("score")).as("adc"))
  }

  /** The production PQ pipeline (faiss's IVFPQ+refine shape): a cheap
    * ADC scan shortlists `shortlist` candidates per query, then ONLY the
    * shortlist is re-scored with exact L2² against the raw vectors.
    * Recall approaches exact search while the full-corpus scan still
    * touches only the m-byte codes — at 100 TB the raw-vector reads are
    * `shortlist × queries` point lookups, not a corpus scan. Output:
    * (query_id, corpus_id, rank, dist) ranked by exact (dist asc,
    * corpus_id asc).
    */
  def adcTopKReranked(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, cb: Codebook, topK: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= topK, s"shortlist $shortlist < topK $topK")
    val cand = adcTopK(encoded, queries, cb, shortlist, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"))
    rerankShortlist(cand, corpus, queries, topK, idCol, vecCol)
  }

  /** Exact L2² re-rank of a pre-computed (query_id, corpus_id)
    * shortlist — the refine stage split out so callers that ALSO need
    * the shortlist (coverage-verification gates) can compute the
    * expensive ADC scan once and feed it to both consumers instead of
    * paying it twice inside [[adcTopKReranked]].
    */
  def rerankShortlist(cand: DataFrame, corpus: DataFrame,
      queries: DataFrame, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = cand.sparkSession
    graft.expressions.VectorExprs.register(spark)
    import graft.expressions.VectorExprs.vecDot
    val q = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("__qv"))
    val scored = cand
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv")),
        "corpus_id")
      .join(broadcast(q), "query_id")
      .withColumn("score",
        -(vecDot(col("__cv"), col("__cv"))
          - lit(2.0) * vecDot(col("__cv"), col("__qv"))
          + vecDot(col("__qv"), col("__qv"))))
    Similarity.topKPerGroup(scored, col("query_id"), topK)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        (-col("score")).as("dist"))
  }
}
