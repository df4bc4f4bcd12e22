package graft.operators

import graft.SparkSpec

/** Block (simultaneous orthogonal) power iteration — scan count,
  * component parity with sequential deflation, dead-column restart, and
  * rank exhaustion. Shares PcaToprSpec's planted exact-rank-3 fixture
  * algebra.
  */
class PcaBlockSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val s2 = math.sqrt(2.0)
  private val u1 = Array(1 / s2, 1 / s2, 0, 0, 0, 0, 0, 0)
  private val u2 = Array(1 / s2, -1 / s2, 0, 0, 0, 0, 0, 0)
  private val u3 = Array(0, 0, 1 / s2, -1 / s2, 0.0, 0, 0, 0)

  private def scaled(u: Array[Double], a: Double): Seq[Double] =
    u.map(_ * a).toSeq

  private lazy val planted = {
    val alphas = (0 until 100).map(i => 4.0 + (i % 7))
    val betas = (0 until 50).map(i => 2.0 + (i % 5))
    val gammas = (0 until 30).map(i => 1.0 + (i % 3))
    val rows = alphas.map(scaled(u1, _)) ++ betas.map(scaled(u2, _)) ++
      gammas.map(scaled(u3, _))
    rows.toDF("embedding").localCheckpoint(true)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("distributed pass count is iterations + 2, INDEPENDENT of r") {
    // the operator's whole point: sequential deflation pays
    // r·iterations corpus scans; the block pays one trace pass +
    // `iterations` block passes + one final Rayleigh pass
    for (r <- Seq(1, 3, 5); iters <- Seq(2, 6)) {
      val (comps, passes) = Similarity.topPrincipalComponentsBlockCounted(
        planted, "embedding", r, iters, quantizeDp = 0)
      assert(comps.size === r)
      assert(passes === iters + 2,
        s"r=$r iters=$iters spent $passes distributed passes")
    }
  }

  test("early exit: converged walk stops short with the FULL walk's components") {
    // the planted exact-rank-3 spectrum is stationary within a few
    // iterations; with convergeTol the walk must stop well under the
    // 24-iteration budget and return components equal to the full walk
    val (full, fullPasses) = Similarity.topPrincipalComponentsBlockCounted(
      planted, "embedding", r = 3, iterations = 24, quantizeDp = 0)
    val (early, earlyPasses) = Similarity.topPrincipalComponentsBlockCounted(
      planted, "embedding", r = 3, iterations = 24, quantizeDp = 0,
      convergeTol = 1e-12)
    assert(fullPasses === 26)
    assert(earlyPasses < fullPasses,
      s"early exit never fired: $earlyPasses passes")
    full.zip(early).zipWithIndex.foreach { case (((lf, vf, _), (le, ve, _)), k) =>
      assert(math.abs(lf - le) <= 1e-6 * math.max(1.0, lf), s"λ$k: $lf vs $le")
      // eigenvector equality up to sign
      val d = math.abs(dot(vf, ve))
      assert(d > 1.0 - 1e-9, s"component $k rotated: |dot| = $d")
    }
    // convergeTol = 0 (the gate regime) is bit-compatible with the
    // pre-early-exit walk: exactly iterations + 2 passes, always
    val (_, p0) = Similarity.topPrincipalComponentsBlockCounted(
      planted, "embedding", r = 3, iterations = 4, quantizeDp = 9)
    assert(p0 === 6)
  }

  test("block recovers the planted spectrum and matches sequential deflation") {
    val expected = Seq(
      (0 until 100).map(i => math.pow(4.0 + (i % 7), 2)).sum,
      (0 until 50).map(i => math.pow(2.0 + (i % 5), 2)).sum,
      (0 until 30).map(i => math.pow(1.0 + (i % 3), 2)).sum)
    val block = Similarity.topPrincipalComponentsBlock(
      planted, "embedding", r = 3, iterations = 20)
    val defl = Similarity.topPrincipalComponentsGram(
      planted, "embedding", r = 3, iterations = 20)
    block.zip(defl).zip(expected).foreach {
      case (((lb, vb, rb), (ld, vd, _)), expLambda) =>
        assert(math.abs(lb - expLambda) / expLambda < 1e-9,
          s"block eigenvalue $lb vs planted $expLambda")
        assert(math.abs(lb - ld) / ld < 1e-9, s"block $lb vs deflation $ld")
        assert(math.abs(math.abs(dot(vb, vd)) - 1.0) < 1e-9,
          s"directions disagree: |cos| = ${math.abs(dot(vb, vd))}")
        assert(rb < 1e-9, s"block residual $rb")
    }
    // block columns mutually orthogonal
    for (i <- 0 until 3; j <- (i + 1) until 3)
      assert(math.abs(dot(block(i)._2, block(j)._2)) < 1e-9)
  }

  test("dead start column restarts on the next basis vector (no NaN, no zero component)") {
    // dimension 0 identically zero: e1 starts in the null space — the
    // column must restart, not freeze, and still find the top direction
    val corpus = Seq(
      Seq(0.0, 3.0, 1.0), Seq(0.0, 2.9, 1.1), Seq(0.0, 3.1, 0.9))
      .toDF("embedding")
    val got = Similarity.topPrincipalComponentsBlock(
      corpus, "embedding", r = 2, iterations = 15)
    val (l1, v1, r1) = got.head
    assert(!l1.isNaN && l1 > 0 && v1.forall(!_.isNaN))
    assert(math.abs(v1(0)) < 1e-12) // the dead dimension stays zero
    assert(r1 < 1e-6)
    // second component: the orthogonal in-plane direction, λ2 > 0
    assert(got(1)._1 > 0 && got(1)._1 < l1)
    assert(math.abs(dot(v1, got(1)._2)) < 1e-9)
  }

  test("rank exhaustion degrades to zero components (r past the true rank)") {
    val got = Similarity.topPrincipalComponentsBlock(
      planted, "embedding", r = 5, iterations = 12)
    assert(got.size === 5)
    // rank-3 data: columns 4-5 restart through the remaining basis and
    // converge onto deflation round-off or freeze — either way ~zero
    assert(got(3)._1 < 1e-6 * got(0)._1)
    assert(got(4)._1 < 1e-6 * got(0)._1)
    got.foreach { case (l, v, r) => assert(!l.isNaN && v.forall(!_.isNaN)) }
  }

  test("all-zero corpus and empty vectors degrade, never NaN") {
    val zeros = Seq(Seq(0.0, 0.0)).toDF("embedding")
    val gz = Similarity.topPrincipalComponentsBlock(zeros, "embedding", r = 2,
      iterations = 3)
    gz.foreach { case (l, v, r) => assert(l === 0.0 && v.forall(_ === 0.0) && r === 0.0) }
    val empty = Seq.fill(3)(Seq.empty[Double]).toDF("embedding")
    val ge = Similarity.topPrincipalComponentsBlock(empty, "embedding", r = 2,
      iterations = 3)
    ge.foreach { case (l, v, r) => assert(l === 0.0 && v.isEmpty && r === 0.0) }
  }

  test("quantized block walk is deterministic run-to-run (gate regime)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.topPrincipalComponentsBlock(
      emb, "embedding", r = 3, iterations = 8, quantizeDp = 9)
    val b = Similarity.topPrincipalComponentsBlock(
      emb.repartition(7), "embedding", r = 3, iterations = 8, quantizeDp = 9)
    a.zip(b).foreach { case ((l1, v1, r1), (l2, v2, r2)) =>
      assert(l1 === l2 && r1 === r2)
      assert(v1.toSeq === v2.toSeq)
    }
    // mutually orthogonal, positive spectrum, ordered
    for (i <- 0 until 3; j <- (i + 1) until 3)
      assert(math.abs(dot(a(i)._2, a(j)._2)) < 1e-6)
    assert(a.map(_._1) === a.map(_._1).sorted.reverse)
  }
}
