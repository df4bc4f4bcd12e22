package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JL sign projection ([[RandomProjection]]): the driver-side md5
  * parity matches the SQL formula the oracle replays, the map-side
  * expression equals a reference matmul, null semantics, and a
  * distance-preservation sanity bound on real embeddings.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("signAt matches the SQL md5-hex-parity formula Spark-side") {
    // the exact expression the DuckDB oracle uses, evaluated by Spark's
    // own md5 — three engines (JVM digest, Spark, DuckDB) must agree,
    // and Spark≡JVM here plus the oracle-green gate covers the triangle
    val pairs = for (j <- 0 until 16; k <- 0 until 4) yield (j, k)
    val sqlSide = pairs.toDF("j", "k")
      .select(col("j"), col("k"),
        when(substring(md5(concat(lit("rp:"), col("j").cast("string"),
          lit(":"), col("k").cast("string"))), 1, 1)
          .isin("0", "2", "4", "6", "8", "a", "c", "e"), 1.0)
          .otherwise(-1.0).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (j, k) =>
      assert(RandomProjection.signAt("rp", j, k) === sqlSide((j, k)),
        s"sign mismatch at ($j,$k)")
    }
    // both signs occur (a degenerate all-ones matrix projects onto one ray)
    assert(sqlSide.values.toSet === Set(1.0, -1.0))
  }

  test("projectExpr equals the reference matmul; null element -> 0, null vector -> NULL") {
    val m = RandomProjection.signMatrix(dim = 5, k = 3, salt = "spec")
    val vecs = Seq(
      (1L, Some(Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 5.0))),
      (2L, Some(Seq[java.lang.Double](1.0, null, 2.0, null, 3.0))),
      (3L, None: Option[Seq[java.lang.Double]]))
      .toDF("id", "v")
    val got = vecs.select(col("id"),
        RandomProjection.projectExpr(col("v"), m).as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    def ref(x: Seq[Double]): Seq[Double] =
      m.toSeq.map(row => row.zip(x).map { case (s, xv) => s * xv }.sum)
    assert(got(1L) === ref(Seq(1.0, 2.0, 3.0, 4.0, 5.0)))
    assert(got(2L) === ref(Seq(1.0, 0.0, 2.0, 0.0, 3.0)))
    assert(got(3L) === null)
  }

  test("a ragged vector raises instead of projecting a truncated dot product") {
    val m = RandomProjection.signMatrix(dim = 5, k = 2, salt = "spec")
    val short = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v") // 2 != 5
    val ex = intercept[Exception] {
      short.select(RandomProjection.projectExpr(col("v"), m)).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("matrix width"), msgs.take(300))
  }

  test("distance preservation on real embeddings (JL sanity at k=16)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(20).collect()
      .map(r => r.getSeq[Double](1).toArray)
    val k = 16
    val m = RandomProjection.signMatrix(dim = emb.head.length, k = k, salt = "jl")
    def proj(x: Array[Double]): Array[Double] =
      m.map(row => row.zip(x).map { case (s, xv) => s * xv }.sum / math.sqrt(k))
    val ps = emb.map(proj)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // median pairwise distortion near 1 — a LOOSE sanity band (k=16 is
    // small; the theorem's ε at this k is generous), catching sign-matrix
    // bugs (all-ones, wrong orientation) rather than pinning constants
    val ratios = for {
      i <- emb.indices; j <- emb.indices if i < j
      dOrig = d2(emb(i), emb(j)) if dOrig > 0
    } yield d2(ps(i), ps(j)) / dOrig
    val sorted = ratios.sorted
    val med = sorted(sorted.size / 2)
    assert(med > 0.5 && med < 2.0, s"median distortion $med")
  }
}
