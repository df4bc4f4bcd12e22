package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained quality filtering ([[QualityModel]]): exact one-step recovery
  * on an orthonormal planted design, quantized-walk determinism across
  * partitionings, logistic separation, and the input-contract guards.
  * Cross-engine replay of the identity-link walk is the `qf_linear_gd`
  * gate's territory.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // balanced ±1 design: Gram/n = I exactly, so mean-gradient GD with
  // lr = 2^0 recovers a noiseless linear target in ONE epoch — the
  // closed-form case that pins the update rule's scaling exactly
  private lazy val orthonormal = {
    val rows = (0 until 50).map(_ => (Seq(1.0, 1.0), 5.0)) ++
      (0 until 50).map(_ => (Seq(1.0, -1.0), -1.0)) // y = 2 + 3u
    rows.toDF("features", "y")
  }

  test("identity link: one epoch recovers a noiseless target on an orthonormal design") {
    val w = QualityModel.trainGD(orthonormal, "features", "y", dim = 2,
      epochs = 1, lrLog2 = 0).head
    assert(w.toSeq === Seq(2.0, 3.0))
    // and the recovered model scores exactly
    val mse = orthonormal
      .select(pow(QualityModel.scoreExpr(col("features"), w) - col("y"), 2)
        .as("se"))
      .agg(sum("se")).head().getDouble(0)
    assert(mse === 0.0)
  }

  test("quantized walk is bit-identical across partitionings") {
    val docs = (0 until 400).map { i =>
      (Seq(1.0, (i % 37).toDouble, (i % 11).toDouble), (i % 2).toDouble)
    }.toDF("features", "y")
    def weights(parts: Int): Seq[Seq[Double]] =
      QualityModel.trainGD(docs.repartition(parts), "features", "y",
        dim = 3, epochs = 3, lrLog2 = -12, quantizeDp = 9).map(_.toSeq)
    assert(weights(1) == weights(13))
  }

  test("logistic link separates a planted linearly-separable corpus") {
    val rows = (0 until 200).map { i =>
      val u = if (i % 2 == 0) 1.0 + (i % 5) * 0.1 else -1.0 - (i % 5) * 0.1
      (Seq(1.0, u), if (u > 0) 1.0 else 0.0)
    }
    val df = rows.toDF("features", "y")
    val w = QualityModel.trainGD(df, "features", "y", dim = 2,
      epochs = 50, lrLog2 = 1, link = QualityModel.Logistic).last
    val acc = df.select(
        (when(QualityModel.scoreExpr(col("features"), w) > 0, 1.0)
          .otherwise(0.0) === col("y")).cast("int").as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    assert(acc >= 0.95, s"logistic accuracy $acc")
  }

  test("ragged feature vectors raise; null rows are excluded from n, not zero-filled") {
    val ragged = Seq((Seq(1.0, 2.0), 1.0), (Seq(1.0), 0.0))
      .toDF("features", "y")
    val ex = intercept[Exception] {
      QualityModel.trainGD(ragged, "features", "y", dim = 2,
        epochs = 1, lrLog2 = 0)
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("ragged"), msgs.take(200))

    // null label / null feature rows must not dilute the mean gradient
    val withNulls = Seq(
      (Some(Seq(1.0, 1.0)), Some(5.0)),
      (Some(Seq(1.0, -1.0)), Some(-1.0)),
      (None: Option[Seq[Double]], Some(9.0)),
      (Some(Seq(1.0, 1.0)), None: Option[Double]))
      .toDF("features", "y")
    val clean = Seq((Seq(1.0, 1.0), 5.0), (Seq(1.0, -1.0), -1.0))
      .toDF("features", "y")
    val a = QualityModel.trainGD(withNulls, "features", "y", dim = 2,
      epochs = 2, lrLog2 = -1).map(_.toSeq)
    val b = QualityModel.trainGD(clean, "features", "y", dim = 2,
      epochs = 2, lrLog2 = -1).map(_.toSeq)
    assert(a == b)
  }

  test("quantized LOGISTIC walk is bit-identical across partitionings") {
    // the qf_logistic_gd gate is rows-only (libm exp is not
    // cross-engine replayable) — within-engine determinism of the
    // quantized walk is what makes its rerun rows stable, so pin it
    val docs = (0 until 400).map { i =>
      (Seq(1.0, (i % 37) / 37.0, (i % 11) / 11.0), (i % 2).toDouble)
    }.toDF("features", "y")
    def weights(parts: Int): Seq[Seq[Double]] =
      QualityModel.trainGD(docs.repartition(parts), "features", "y",
        dim = 3, epochs = 4, lrLog2 = 1, link = QualityModel.Logistic,
        quantizeDp = 9).map(_.toSeq)
    assert(weights(1) == weights(13))
  }

  test("a SINGLE overflowing per-row contribution raises; sum() cannot silently skip it") {
    // ADVICE r10: one |contribution| >= 1e29 overflows its OWN cast to
    // decimal(38,9) to NULL in non-ANSI mode; sum() skips the NULL
    // while n still counts the row — without the per-dim non-null
    // count guard the epoch's gradient would be silently wrong (the
    // SUM-level overflow guard never fires because the remaining
    // addends stay tiny)
    val docs = (Seq((Seq(1.0, 1e30), 1.0)) ++
      (0 until 50).map(i => (Seq(1.0, (i % 7).toDouble), 0.0)))
      .toDF("features", "y")
    val ex = intercept[IllegalStateException] {
      QualityModel.trainGD(docs, "features", "y", dim = 2,
        epochs = 1, lrLog2 = -4, quantizeDp = 9)
    }
    assert(ex.getMessage.contains("dropped from the sum"), ex.getMessage)
  }

  test("scoreIncremental: appends score only the batch, untouched partitions byte-identical, equals full recompute") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-qm-inc-").toString)
    def partFiles(part: String) = {
      val d = java.nio.file.Paths.get(store.root, "scored", part)
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(p => (p.getFileName.toString,
          java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p))).toSet
      } finally s.close()
    }
    val w = Array(0.5, 2.0)
    def docs(ids: Range, part: String) =
      ids.map(i => (i.toLong, part, Seq(1.0, i.toDouble))).toDF("k", "p", "f")
    // batch 1 creates partitions p0 + p1
    QualityModel.scoreIncremental(store, "scored",
      docs(0 until 4, "p0").union(docs(4 until 8, "p1")),
      "f", w, keyCol = "k", partCol = "p")
    val beforeP0 = partFiles("p=p0")
    // batch 2 touches ONLY p1 — p0's files must not be rewritten
    QualityModel.scoreIncremental(store, "scored",
      docs(8 until 12, "p1"), "f", w, keyCol = "k", partCol = "p")
    assert(partFiles("p=p0") === beforeP0)
    // incremental state == full map-side recompute over all rows
    val got = store.read("scored").select($"k", $"score")
      .as[(Long, Double)].collect().toMap
    assert(got.size == 12)
    (0 until 12).foreach { i =>
      assert(got(i.toLong) === 0.5 + 2.0 * i, s"row $i")
    }
    // insert-only: re-sending a key leaves the first score in place
    QualityModel.scoreIncremental(store, "scored",
      Seq((5L, "p1", Seq(1.0, 999.0))).toDF("k", "p", "f"),
      "f", w, keyCol = "k", partCol = "p")
    assert(store.read("scored").filter($"k" === 5L)
      .select($"score").as[Double].head() === 0.5 + 2.0 * 5)
  }

  test("scoreUpsert: edited keys re-score in place, other partitions byte-identical, new keys insert") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-qm-ups-").toString)
    def partFiles(part: String) = {
      val d = java.nio.file.Paths.get(store.root, "scored", part)
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(p => (p.getFileName.toString,
          java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p))).toSet
      } finally s.close()
    }
    val w = Array(1.0, 3.0)
    def rows(xs: (Long, String, Double)*) =
      xs.map { case (k, p, x) => (k, p, Seq(1.0, x)) }.toDF("k", "p", "f")
    QualityModel.scoreIncremental(store, "scored",
      rows((1L, "p0", 2.0), (2L, "p0", 4.0), (3L, "p1", 6.0)),
      "f", w, keyCol = "k", partCol = "p")
    val beforeP1 = partFiles("p=p1")
    // k=1 edited (2.0 -> 10.0), k=9 brand-new — both land in p0 only
    QualityModel.scoreUpsert(store, "scored",
      rows((1L, "p0", 10.0), (9L, "p0", 1.0)),
      "f", w, keyCol = "k", partCol = "p")
    val got = store.read("scored").select($"k", $"score")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 31.0, 2L -> 13.0, 3L -> 19.0, 9L -> 4.0))
    // p1 never opened
    assert(partFiles("p=p1") === beforeP1)
  }

  test("a diverging quantized walk fails loudly on decimal overflow, not with an opaque NPE") {
    // lr far past 2/λmax: residuals grow ~(lr·λ)× per epoch, and the
    // 9dp DECIMAL(38,9) gradient sum (29 integer digits) overflows to
    // NULL within a few epochs — the guard must name the cause
    val docs = (0 until 100).map(i =>
      (Seq(1.0, 1000.0 + i), 1.0)).toDF("features", "y")
    val ex = intercept[IllegalStateException] {
      QualityModel.trainGD(docs, "features", "y", dim = 2,
        epochs = 12, lrLog2 = 40, quantizeDp = 9)
    }
    assert(ex.getMessage.contains("overflowed"), ex.getMessage)
  }
}
