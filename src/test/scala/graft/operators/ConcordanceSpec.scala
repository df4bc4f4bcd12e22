package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Concordance.counts]] must be EXACTLY the quadratic pair definition
  * for every bucket count — the decomposition (same-x-bucket join /
  * same-y-bucket join / cell-count algebra) is an execution strategy,
  * not an approximation. Fixtures use modular hashes so both tie-heavy
  * and near-unique regimes are exercised deterministically.
  */
class ConcordanceSpec extends SparkSpec {
  import spark.implicits._

  private def h(i: Long): Long = {
    var z = i * 0x9E3779B97F4A7C15L + 11
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    (z ^ (z >>> 27)) & 0x7fffffffL
  }

  private def quadratic(rows: Seq[(Int, Int, Boolean)]): (Long, Long, Long) = {
    var m = 0L; var c = 0L; var t = 0L
    for (a <- rows if a._3; b <- rows if a._1 < b._1) {
      m += 1
      if (a._2 > b._2) c += 1 else if (a._2 == b._2) t += 1
    }
    (m, c, t)
  }

  private def run(rows: Seq[(Int, Int, Boolean)], buckets: Int): (Long, Long, Long) = {
    val r = Concordance.counts(rows.toDF("x", "y", "a"), "x", "y",
      col("a"), buckets).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("matches the quadratic definition across bucket counts and tie densities") {
    // tie-heavy: 500 rows over 37 x-values and 23 y-values
    val tieHeavy = (0 until 500).map(i =>
      ((h(i) % 37).toInt, (h(i * 7 + 1) % 23).toInt, i % 3 != 0))
    // near-unique: 300 rows over wide domains
    val nearUnique = (0 until 300).map(i =>
      ((h(i + 9000) % 100000).toInt, (h(i * 13 + 5) % 100000).toInt, i % 2 == 0))
    for (fixture <- Seq(tieHeavy, nearUnique); b <- Seq(1, 2, 7, 64, 256)) {
      assert(run(fixture, b) === quadratic(fixture),
        s"buckets=$b diverged from the quadratic definition")
    }
  }

  test("degenerate inputs: all-tied, empty filter side, single row, empty") {
    val allTied = Seq.fill(50)((7, 3, true))
    assert(run(allTied, 8) === quadratic(allTied)) // (0,0,0): no x_a < x_b
    val oneX = (0 until 40).map(i => (5, i, true)) // every x equal
    assert(run(oneX, 8) === (0L, 0L, 0L))
    val oneY = (0 until 40).map(i => (i, 9, i % 2 == 0)) // every y tied
    assert(run(oneY, 8) === quadratic(oneY))
    assert(run(oneY, 8)._3 === run(oneY, 8)._1) // all comparable pairs tied
    val noA = (0 until 30).map(i => (i, i, false))
    assert(run(noA, 4) === (0L, 0L, 0L))
    assert(run(Seq((1, 1, true)), 4) === (0L, 0L, 0L))
    assert(run(Seq.empty, 4) === (0L, 0L, 0L))
  }

  test("null x or y rows are excluded on both sides") {
    val df = Seq[(Option[Int], Option[Int], Boolean)](
      (Some(1), Some(10), true), (Some(2), Some(5), true),
      (None, Some(3), true), (Some(3), None, true), (Some(4), Some(1), true)
    ).toDF("x", "y", "a")
    val r = Concordance.counts(df, "x", "y", col("a"), 4).head()
    // surviving rows: (1,10) (2,5) (4,1) → pairs (1,2),(1,4),(2,4), all concordant
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (3L, 3L, 0L))
  }

  test("NaN raises by default; allowNaN counts it with rank-top semantics") {
    val withNaN = Seq(
      (1.0, 10.0, true), (2.0, Double.NaN, true), (3.0, 1.0, true))
      .toDF("x", "y", "a")
    // the guard is the contract now (VERDICT r9 item 5): silent
    // NaN-dropping vs the quadratic form's NaN-ranks-top is exactly the
    // divergence the default must fail loudly on
    val ex = intercept[Exception] {
      Concordance.counts(withNaN, "x", "y", col("a"), 4).head()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("NaN"), msgs.take(300))
    // allowNaN = true: NaN groups with NaN and sorts above every value
    // (Spark ordering semantics) — matches the quadratic form exactly
    val nanRows = Seq(
      (1.0, Double.NaN, true), (2.0, 5.0, true),
      (Double.NaN, 5.0, true), (3.0, Double.NaN, true))
    def quadD(rows: Seq[(Double, Double, Boolean)]): (Long, Long, Long) = {
      // Spark ORDERING semantics: NaN > every double, NaN == NaN
      def lt(a: Double, b: Double) =
        if (a.isNaN) false else if (b.isNaN) true else a < b
      def eq(a: Double, b: Double) =
        (a.isNaN && b.isNaN) || a == b
      var m = 0L; var c = 0L; var t = 0L
      for (a <- rows if a._3; b <- rows if lt(a._1, b._1)) {
        m += 1
        if (eq(a._2, b._2)) t += 1 else if (lt(b._2, a._2)) c += 1
      }
      (m, c, t)
    }
    val r = Concordance.counts(nanRows.toDF("x", "y", "a"), "x", "y",
      col("a"), 4, allowNaN = true).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === quadD(nanRows))
  }

  test("a single extreme outlier no longer degrades bucketing (equi-depth, ADVICE r9)") {
    // under equal-width [min,max] bucketing one outlier collapsed every
    // other row into bucket 0 (the in-bucket join went quadratic);
    // equi-depth must keep impure buckets bounded — asserted here by
    // exactness plus the bucket-map invariant itself
    val skewed = (0 until 400).map(i =>
      (if (i == 0) Int.MaxValue else (h(i) % 50).toInt,
        (h(i * 3 + 2) % 17).toInt, true))
    for (b <- Seq(8, 64)) {
      assert(run(skewed, b) === quadratic(skewed), s"buckets=$b diverged")
    }
    // heavy-hitter: one value holds half the rows — it must isolate
    // into a pure bucket (counted algebraically), never join
    val heavy = (0 until 400).map(i =>
      (if (i % 2 == 0) 25 else (h(i) % 50).toInt,
        (h(i * 5 + 3) % 17).toInt, i % 3 != 0))
    for (b <- Seq(8, 64)) {
      assert(run(heavy, b) === quadratic(heavy), s"buckets=$b diverged")
    }
  }
}
