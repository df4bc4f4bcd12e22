package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-component PCA (deflated power iteration) — planted-spectrum
  * recovery, orthogonality, residuals, and rank exhaustion.
  *
  * The fixture plants an EXACT rank-3 spectrum: rows are multiples of
  * three mutually orthogonal directions with disjoint row blocks, so
  * XᵀX = Σα²·u₁u₁ᵀ + Σβ²·u₂u₂ᵀ + Σγ²·u₃u₃ᵀ with no cross terms — the
  * eigenvalues and eigenvectors are known in closed form.
  */
class PcaToprSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val s2 = math.sqrt(2.0)
  private val u1 = Array(1 / s2, 1 / s2, 0, 0, 0, 0, 0, 0)
  private val u2 = Array(1 / s2, -1 / s2, 0, 0, 0, 0, 0, 0)
  private val u3 = Array(0, 0, 1 / s2, -1 / s2, 0.0, 0, 0, 0)

  private def scaled(u: Array[Double], a: Double): Seq[Double] =
    u.map(_ * a).toSeq

  // disjoint row blocks — each block spans exactly one direction
  private lazy val planted = {
    val alphas = (0 until 100).map(i => 4.0 + (i % 7))   // Σα² ≈ 4900
    val betas = (0 until 50).map(i => 2.0 + (i % 5))     // Σβ² ≈ 800
    val gammas = (0 until 30).map(i => 1.0 + (i % 3))    // Σγ² ≈ 130
    val rows = alphas.map(scaled(u1, _)) ++ betas.map(scaled(u2, _)) ++
      gammas.map(scaled(u3, _))
    rows.toDF("embedding").localCheckpoint(true)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("top-3 recovers the planted eigenvalues and directions") {
    val expected = Seq(
      (0 until 100).map(i => math.pow(4.0 + (i % 7), 2)).sum,
      (0 until 50).map(i => math.pow(2.0 + (i % 5), 2)).sum,
      (0 until 30).map(i => math.pow(1.0 + (i % 3), 2)).sum)
    val got = Similarity.topPrincipalComponents(
      planted, "embedding", r = 3, iterations = 20)
    assert(got.size === 3)
    got.zip(expected).zip(Seq(u1, u2, u3)).foreach {
      case (((lambda, v, resid), expLambda), expU) =>
        assert(math.abs(lambda - expLambda) / expLambda < 1e-9,
          s"eigenvalue $lambda vs $expLambda")
        assert(math.abs(math.abs(dot(v, expU)) - 1.0) < 1e-9,
          s"direction drifted: |cos| = ${math.abs(dot(v, expU))}")
        assert(resid < 1e-9, s"residual $resid")
    }
    // eigenvalues strictly decreasing
    assert(got.map(_._1) === got.map(_._1).sorted.reverse)
  }

  test("components are mutually orthogonal") {
    val got = Similarity.topPrincipalComponents(
      planted, "embedding", r = 3, iterations = 20)
    for (i <- 0 until 3; j <- (i + 1) until 3)
      assert(math.abs(dot(got(i)._2, got(j)._2)) < 1e-9,
        s"components $i,$j not orthogonal")
  }

  test("rank exhaustion: components past the true rank collapse to ~zero") {
    val got = Similarity.topPrincipalComponents(
      planted, "embedding", r = 5, iterations = 12)
    // rank-3 data: components 4 and 5 see only deflation round-off
    assert(got(3)._1 < 1e-6 * got(0)._1)
    assert(got(4)._1 < 1e-6 * got(0)._1)
  }

  test("r = 1 is bit-identical to the single-component API") {
    val one = Similarity.topPrincipalComponent(planted, "embedding", 12)
    val multi = Similarity.topPrincipalComponents(
      planted, "embedding", r = 1, iterations = 12).head
    assert(one._1 === multi._1)
    assert(one._2.toSeq === multi._2.toSeq)
    assert(one._3 === multi._3)
  }

  test("quantized path stays orthogonal and convergent (the gate regime)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.topPrincipalComponents(
      emb, "embedding", r = 3, iterations = 12, quantizeDp = 9)
    assert(got.size === 3)
    assert(got.map(_._1) === got.map(_._1).sorted.reverse)
    for (i <- 0 until 3; j <- (i + 1) until 3)
      assert(math.abs(dot(got(i)._2, got(j)._2)) < 1e-6)
    // random-ish embeddings have a tight eigenvalue cluster (gap ratio
    // ~0.9 measured at sf0.001), so 12 iterations land converging-not-
    // converged: the bar asserts the walk is well inside the basin
    // (resid halves every ~7 iterations), not machine-precision done
    got.foreach { case (lambda, _, resid) =>
      assert(lambda > 0.0)
      assert(resid < 0.1, s"gate convergence bar missed: $resid")
    }
  }

  test("a corpus of all-empty vectors degrades to zero components, no crash") {
    val empty = Seq.fill(5)(Seq.empty[Double]).toDF("embedding")
    val got = Similarity.topPrincipalComponents(empty, "embedding", r = 2)
    assert(got.size === 2)
    got.foreach { case (lambda, v, resid) =>
      assert(lambda === 0.0 && v.isEmpty && resid === 0.0)
    }
  }

  test("one-pass Gram matrix equals the naive per-row outer-product sum") {
    // mixed shapes: ragged short row (zero-padded semantics), a NULL
    // vector (skipped), negative and zero elements
    val data = Seq(
      Some(Seq(1.0, -2.0, 3.0, 0.5)),
      Some(Seq(2.0, 0.0, -1.0)), // ragged: dim 3 of this row reads 0
      None,
      Some(Seq(-0.5, 4.0, 2.5, -3.0)))
    val df = data.toDF("embedding")
    val (g, n) = Similarity.gramMatrixOnePass(df, "embedding")
    assert(n === 3) // the NULL vector is skipped, not counted
    val dim = 4
    assert(g.length === dim && g.forall(_.length === dim))
    val rows = data.flatten.map(x => Array.tabulate(dim)(j =>
      if (j < x.length) x(j) else 0.0))
    for (j <- 0 until dim; k <- 0 until dim) {
      val naive = rows.map(x => x(j) * x(k)).sum
      assert(math.abs(g(j)(k) - naive) < 1e-12, s"G($j,$k)=${g(j)(k)} vs $naive")
      assert(g(j)(k) === g(k)(j), s"asymmetric at ($j,$k)")
    }
  }

  test("gram matrix of an empty/all-null corpus is empty with zero rows") {
    val (g0, n0) = Similarity.gramMatrixOnePass(
      Seq.empty[Option[Seq[Double]]].toDF("embedding"), "embedding")
    assert(g0.isEmpty && n0 === 0)
    val (g1, n1) = Similarity.gramMatrixOnePass(
      Seq[Option[Seq[Double]]](None, None).toDF("embedding"), "embedding")
    assert(g1.isEmpty && n1 === 0)
  }

  test("gram path: null ELEMENTS contribute zero (walk parity), all-empty degrades") {
    // a null element inside a vector must act as 0.0 — the walk's
    // posexplode sums skip nulls — not crash the typed deserializer
    val withNullElem = Seq(
      Seq[java.lang.Double](1.0, null, 2.0),
      Seq[java.lang.Double](3.0, 4.0, null)).toDF("embedding")
    val (g, n) = Similarity.gramMatrixOnePass(withNullElem, "embedding")
    assert(n === 2)
    assert(g(0)(0) === 10.0) // 1 + 9
    assert(g(1)(0) === 12.0) // 0*1 + 4*3
    assert(g(2)(0) === 2.0)  // 2*1 + 0*3
    assert(g(1)(1) === 16.0)
    assert(g(2)(2) === 4.0)
    // all-EMPTY vectors: same degrade-to-zero-components contract as
    // the multi-pass walk (r zero components, no crash)
    val empty = Seq.fill(4)(Seq.empty[Double]).toDF("embedding")
    val got = Similarity.topPrincipalComponentsGram(empty, "embedding", r = 2)
    assert(got.size === 2)
    got.foreach { case (lambda, v, resid) =>
      assert(lambda === 0.0 && v.isEmpty && resid === 0.0)
    }
    // all-NULL corpus: same loud require as the walk
    val ex = intercept[IllegalArgumentException] {
      Similarity.topPrincipalComponentsGram(
        Seq[Option[Seq[Double]]](None).toDF("embedding"), "embedding")
    }
    assert(ex.getMessage.contains("at least one non-null vector"))
  }

  test("one-scan Gram walk matches the 36-scan distributed walk") {
    // the same deflated walk driven by the in-memory G must agree with
    // the per-iteration distributed Gram product to machine precision —
    // they differ only in float summation ORDER
    val multi = Similarity.topPrincipalComponentsMultiPass(
      planted, "embedding", r = 3, iterations = 20)
    val viaGram = Similarity.topPrincipalComponentsGram(
      planted, "embedding", r = 3, iterations = 20)
    assert(viaGram.size === 3)
    multi.zip(viaGram).foreach { case ((l1, v1, r1), (l2, v2, r2)) =>
      assert(math.abs(l1 - l2) / l1 < 1e-9, s"eigenvalue $l1 vs $l2")
      assert(math.abs(math.abs(dot(v1, v2)) - 1.0) < 1e-9,
        s"directions disagree: |cos| = ${math.abs(dot(v1, v2))}")
      assert(r2 < 1e-9, s"gram-walk residual $r2")
    }
  }

  test("width dispatch: below the envelope the default entry IS the one-scan Gram path") {
    // VERDICT r9 item 1 — dim 8 ≤ GramEnvelopeDim, so the dispatcher
    // must return BIT-IDENTICAL results to calling the Gram path
    // directly (same code, not merely close)
    val viaDefault = Similarity.topPrincipalComponents(
      planted, "embedding", r = 3, iterations = 12)
    val viaGram = Similarity.topPrincipalComponentsGram(
      planted, "embedding", r = 3, iterations = 12)
    viaDefault.zip(viaGram).foreach { case ((l1, v1, r1), (l2, v2, r2)) =>
      assert(l1 === l2 && r1 === r2)
      assert(v1.toSeq === v2.toSeq)
    }
  }

  test("width dispatch: past the envelope the default entry takes the BLOCK walk") {
    // dim = GramEnvelopeDim + 1 would put ~268 MB of d²/2 accumulator in
    // EVERY task on the Gram path — the dispatcher must route wide
    // vectors to the O(d)-per-task block iteration (all r components
    // per scan; VERDICT r9 item 2 names sequential deflation's
    // r·iterations scans as the wide-vector gap). Sparse rank-1 fixture
    // keeps the test cheap: only two live dimensions.
    val wide = Similarity.GramEnvelopeDim + 1
    val rows = Seq(3.0, 4.0, 5.0).map { a =>
      Seq.tabulate(wide)(j =>
        if (j == 0) 0.6 * a else if (j == wide - 1) 0.8 * a else 0.0)
    }
    val df = rows.toDF("embedding")
    val viaDefault = Similarity.topPrincipalComponents(
      df, "embedding", r = 1, iterations = 4)
    val viaBlock = Similarity.topPrincipalComponentsBlock(
      df, "embedding", r = 1, iterations = 4)
    val (ld, vd, rd) = viaDefault.head
    val (lw, vw, _) = viaBlock.head
    assert(ld === lw && vd.toSeq === vw.toSeq) // same path, bit-identical
    assert(math.abs(ld - 50.0) < 1e-9) // Σ‖x‖² = 9+16+25
    assert(rd < 1e-12)
    // and the Gram path itself REFUSES this width rather than OOMing
    // (the require fires inside a task, so unwrap the cause chain)
    val ex = intercept[Exception] {
      Similarity.topPrincipalComponentsGram(df, "embedding", r = 1,
        iterations = 2)
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("envelope"), msgs.take(300))
  }

  test("quantized G-walk converges and matches the float G-walk direction (gate regime)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform(col("embedding").cast("array<double>"),
        y => round(y * 10, 0)).as("qv"))
    val Seq((lq, vq, rq)) = Similarity.topPrincipalComponentsGram(
      emb, "qv", r = 1, iterations = 8, quantizeDp = 9)
    val Seq((lf, vf, _)) = Similarity.topPrincipalComponentsGram(
      emb, "qv", r = 1, iterations = 8)
    assert(lq > 0.0 && rq < 0.1, s"quantized walk off basin: resid $rq")
    // 9dp contribution rounding perturbs the iterate by ~1e-9 per step —
    // directions agree far inside the convergence tolerance
    val cos = math.abs(vq.zip(vf).map { case (a, b) => a * b }.sum)
    assert(math.abs(cos - 1.0) < 1e-6, s"|cos| = $cos")
    assert(math.abs(lq - lf) / lf < 1e-6)
    // determinism: the quantized path is exactly replayable run-to-run
    val Seq((lq2, vq2, _)) = Similarity.topPrincipalComponentsGram(
      emb, "qv", r = 1, iterations = 8, quantizeDp = 9)
    assert(lq2 === lq && vq2.toSeq === vq.toSeq)
  }

  test("one-pass correlation matrix equals the naive formula; constant dim is NaN") {
    // dim 3 is CONSTANT (zero variance) — corr must be NaN against it
    val data = Seq(
      Seq(1.0, 2.0, -1.0, 5.0),
      Seq(2.0, 1.0, 0.0, 5.0),
      Seq(3.0, 5.0, 2.0, 5.0),
      Seq(4.0, 3.0, 1.0, 5.0))
    val (corr, n) = Similarity.correlationMatrixOnePass(
      data.toDF("embedding"), "embedding")
    assert(n === 4 && corr.length === 4)
    val dim = 4
    def naive(j: Int, k: Int): Double = {
      val (xs, ys) = (data.map(_(j)), data.map(_(k)))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val (vx, vy) = (xs.map(a => (a - mx) * (a - mx)).sum,
        ys.map(b => (b - my) * (b - my)).sum)
      cov / math.sqrt(vx * vy)
    }
    for (j <- 0 until dim; k <- 0 until dim) {
      assert(corr(j)(k) === corr(k)(j) ||
        (corr(j)(k).isNaN && corr(k)(j).isNaN), s"asymmetric at ($j,$k)")
      if (j == 3 || k == 3) assert(corr(j)(k).isNaN, s"($j,$k) not NaN")
      else if (j == k) assert(math.abs(corr(j)(k) - 1.0) < 1e-12)
      else assert(math.abs(corr(j)(k) - naive(j, k)) < 1e-9,
        s"corr($j,$k)=${corr(j)(k)} vs ${naive(j, k)}")
    }
  }

  test("whitened projections are energy-normalized and decorrelated (emb_whiten semantics)") {
    // λ is the eigenvalue of the (uncentered) second-moment matrix, so
    // Σ_rows (x·v)² = vᵀXᵀXv = λ for a converged unit eigenvector —
    // whitening z = (x·v)/√λ gives unit total energy per component and
    // zero cross-energy between components. Exact on the planted
    // rank-3 fixture (closed-form spectrum).
    val comps = Similarity.topPrincipalComponents(
      planted, "embedding", r = 3, iterations = 30)
    val rows = planted.as[Seq[Double]].collect().map(_.toArray)
    val z = Array.tabulate(3)(c =>
      rows.map(x => dot(x, comps(c)._2) / math.sqrt(comps(c)._1)))
    for (c <- 0 until 3) {
      val energy = z(c).map(v => v * v).sum
      assert(math.abs(energy - 1.0) < 1e-9,
        s"component $c whitened energy $energy != 1")
    }
    for (i <- 0 until 3; j <- (i + 1) until 3) {
      val cross = z(i).zip(z(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(cross) < 1e-9, s"cross-energy $i/$j = $cross")
    }
  }

  test("momentsOnePassCapped: Left(maxLen) on over-cap input, Right moments otherwise") {
    // the dispatcher's probe-free width decision rests on this contract:
    // a capped scan must REPORT overflow (never throw, never return a
    // partial Gram) and the narrow path must be the full moments
    val mixed = Seq(
      Seq(1.0, 2.0),
      Seq.tabulate(10)(_.toDouble), // widest: 10 > cap 4
      Seq(3.0)).toDF("embedding")
    Similarity.momentsOnePassCapped(mixed, "embedding", cap = 4) match {
      case Left(maxLen) => assert(maxLen === 10)
      case Right(_) => fail("over-cap corpus must report Left")
    }
    val narrow = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("embedding")
    Similarity.momentsOnePassCapped(narrow, "embedding", cap = 4) match {
      case Right((n, sums, g)) =>
        assert(n === 2L)
        assert(sums.toSeq === Seq(4.0, 6.0))
        assert(g(0)(0) === 10.0 && g(1)(1) === 20.0 && g(0)(1) === 14.0)
      case Left(w) => fail(s"narrow corpus reported overflow $w")
    }
    // failFast preserves the momentsOnePass contract: in-task raise
    val ex = intercept[Exception] {
      Similarity.momentsOnePassCapped(mixed, "embedding", cap = 4,
        failFast = true)
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("envelope"), msgs.take(300))
  }
}
