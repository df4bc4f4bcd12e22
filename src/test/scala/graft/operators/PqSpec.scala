package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.VectorExprs

/** Pins the product-quantization family: encode argmin semantics
  * (strict-less, lowest-j ties), the ADC = exact-L2 identity on
  * codebook-reconstructible vectors, training determinism and empty-cell
  * survival, loud failures on malformed codes, and the learned path's
  * recall against the exact brute-force ranking.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // tiny 2-subspace codebook: m=2, k=2, subDim=2 → dim 4
  // layout (s*k + j)*sub + t
  private val cb = Pq.Codebook(2, 2, 2,
    Array(
      0.0, 0.0, /* s0 j0 */ 10.0, 10.0, /* s0 j1 */
      5.0, 0.0, /* s1 j0 */ 0.0, 5.0 /* s1 j1 */ ))

  test("encode picks the L2-nearest sub-centroid; ties keep the lowest j") {
    val df = Seq(
      (1L, Seq(1.0, 1.0, 4.0, 1.0)),   // s0 → j0, s1 → j0 (dist 17 vs 32)
      (2L, Seq(9.0, 9.0, 1.0, 4.0)),   // s0 → j1, s1 → j1 (dist 2 vs 17... )
      (3L, Seq(5.0, 5.0, 2.5, 2.5))    // exact midpoints both subspaces → j0 ties
    ).toDF("vec_id", "embedding")
    val out = Pq.encode(df, cb).orderBy("corpus_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(out(1L) == List(0, 0))
    assert(out(2L) == List(1, 1))
    assert(out(3L) == List(0, 0)) // equidistant → smallest index
  }

  test("ADC equals the exact L2² when corpus vectors are codebook reconstructions") {
    // corpus = exact centroid concatenations → quantization error is 0,
    // so ADC must equal the true squared distance to the query
    val corpus = Seq(
      (10L, Seq(0.0, 0.0, 5.0, 0.0)),  // (j0, j0)
      (11L, Seq(10.0, 10.0, 0.0, 5.0)) // (j1, j1)
    ).toDF("vec_id", "embedding")
    val q = Seq((99L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    val out = Pq.adcTopK(Pq.encode(corpus, cb), q, cb, topK = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(out(10L) == l2sq(Seq(1.0, 2.0, 3.0, 4.0), Seq(0.0, 0.0, 5.0, 0.0)))
    assert(out(11L) == l2sq(Seq(1.0, 2.0, 3.0, 4.0), Seq(10.0, 10.0, 0.0, 5.0)))
  }

  test("adcTopK ranks by (adc asc, corpus_id asc) and excludes self") {
    val corpus = Seq(
      (1L, Seq(0.0, 0.0, 5.0, 0.0)),
      (2L, Seq(0.0, 0.0, 5.0, 0.0)),   // same code as 1 → tie on adc
      (3L, Seq(10.0, 10.0, 0.0, 5.0))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter($"vec_id" === 1L)
    val rows = Pq.adcTopK(Pq.encode(corpus, cb), q, cb, topK = 3)
      .orderBy("rank").collect()
    assert(!rows.map(_.getLong(1)).contains(1L), "self excluded")
    assert(rows.head.getLong(1) == 2L, "tie at distance 0 → lowest corpus id first")
  }

  test("malformed codes fail loudly, not silently") {
    Pq.register(spark)
    val bad = Seq((1L, Seq(5, 0), Seq(1.0, 2.0, 3.0, 4.0))) // code 5 with k=2
      .toDF("id", "pq_code", "lut")
    val e = intercept[Exception] {
      bad.select(call_function("pq_adc", $"pq_code", $"lut")).collect()
    }
    assert(e.getMessage != null)
  }

  test("train is deterministic and keeps empty cells alive") {
    val embs = Tables.load(spark, sf, "embeddings")
    val a = Pq.train(embs, m = 4, k = 8, iters = 3)
    val b = Pq.train(embs.repartition(7), m = 4, k = 8, iters = 3)
    assert(a.flat.toSeq == b.flat.toSeq, "codebook must not depend on partitioning")
    assert(a.flat.forall(v => !v.isNaN && !v.isInfinite),
      "empty cells must keep their previous centroid, never divide by zero")
    // k > distinct subvectors: duplicate-heavy corpus still trains
    val dup = Seq.tabulate(10)(i => (i.toLong, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val c = Pq.train(dup, m = 2, k = 4, iters = 2)
    assert(c.flat.forall(v => !v.isNaN))
  }

  test("learned PQ recall@10 vs exact brute force is useful (real corpus)") {
    VectorExprs.register(spark)
    val embs = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select($"vec_id", VectorExprs.vecUnit($"embedding").as("embedding"))
    val queries = embs.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(embs, queries, 10)
      .select($"query_id", $"corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cbL = Pq.train(embs, m = 16, k = 64, iters = 5)
    val pq = Pq.adcTopK(Pq.encode(embs, cbL), queries, cbL, topK = 10)
      .select($"query_id", $"corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) intersect pq.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4,
      f"mean recall@10 $mean%.2f below the pinned floor — PQ ranking degraded")
  }

  test("ADC shortlist + exact re-rank recovers near-exact recall") {
    VectorExprs.register(spark)
    val embs = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select($"vec_id", VectorExprs.vecUnit($"embedding").as("embedding"))
    val queries = embs.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(embs, queries, 10)
      .select($"query_id", $"corpus_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cbL = Pq.train(embs, m = 16, k = 64, iters = 5)
    val enc = Pq.encode(embs, cbL)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"query_id", $"corpus_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      exact.keys.toSeq.map { q =>
        (exact(q) intersect got.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
      }.sum / exact.size
    }
    val adcRecall = recallOf(Pq.adcTopK(enc, queries, cbL, topK = 10))
    val rrRecall = recallOf(
      Pq.adcTopKReranked(enc, embs, queries, cbL, topK = 10, shortlist = 50))
    assert(rrRecall >= adcRecall, "re-ranking must never lose recall vs raw ADC")
    assert(rrRecall >= 0.8,
      f"reranked recall@10 $rrRecall%.2f below the pinned floor")
  }

  test("training reduces quantization error vs the un-iterated init") {
    val embs = Tables.load(spark, sf, "embeddings")
    def mse(cb: Pq.Codebook): Double = {
      val vecs = embs.select($"embedding".cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      vecs.map { v =>
        val code = graft.expressions.PqExprs.pqEncode(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
          graft.expressions.PqExprs.KindDouble, cb.flat, cb.m)
        val codes = code.toIntArray()
        (0 until cb.m).map { s =>
          val base = (s * cb.k + codes(s)) * cb.subDim
          (0 until cb.subDim).map { t =>
            val d = v(s * cb.subDim + t) - cb.flat(base + t); d * d
          }.sum
        }.sum
      }.sum / vecs.length
    }
    val init = Pq.train(embs, m = 8, k = 16, iters = 0)
    val trained = Pq.train(embs, m = 8, k = 16, iters = 3)
    assert(mse(trained) <= mse(init),
      "Lloyd iterations must not increase mean quantization error")
  }
}
