package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** Pins the int8 quantization invariants the quantized ANN path relies
  * on: per-element dequantization error ≤ max_abs/254, quantized dot
  * close to the exact dot on unit vectors, interpreted eval identical to
  * generated code, and top-k recall ≥ 0.9 of the exact ranking on the
  * real embeddings table.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def randVec(seed: Long, dim: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)((r.nextDouble() * 2 - 1).toFloat)
  }

  test("dequantization error per element is bounded by max_abs/254") {
    val vecs = (1L to 50L).map(s => (s, randVec(s, 64)))
    VectorExprs.register(spark)
    vecs.toDF("id", "v")
      .select($"id", $"v", VectorExprs.vecQ8($"v").as("q"))
      .collect().foreach { r =>
        val v = r.getSeq[Float](1)
        val q = r.getAs[Array[Byte]]("q")
        val maxAbs = java.nio.ByteBuffer.wrap(q).getDouble
        assert(q.length == 8 + v.length)
        v.indices.foreach { i =>
          val dequant = q(8 + i) * maxAbs / 127.0
          assert(math.abs(v(i) - dequant) <= maxAbs / 254.0 + 1e-9,
            s"elem $i: ${v(i)} vs $dequant (maxAbs $maxAbs)")
        }
      }
  }

  test("quantized dot approximates the exact dot on unit vectors") {
    VectorExprs.register(spark)
    val pairs = (1L to 100L).map(s => (randVec(s, 64), randVec(s + 1000, 64)))
    val df = pairs.toDF("a", "b").select(
      VectorExprs.vecDot(Similarity.normalize($"a"), Similarity.normalize($"b"))
        .as("exact"),
      VectorExprs.vecDotQ8(
        VectorExprs.vecQ8(Similarity.normalize($"a")),
        VectorExprs.vecQ8(Similarity.normalize($"b"))).as("approx"))
    val worst = df.select(max(abs($"exact" - $"approx"))).head().getDouble(0)
    // 64-dim unit vectors: int8 rounding error accumulates ~sqrt(d)/254
    assert(worst <= 0.05, s"worst |exact - approx| = $worst")
    // zero vectors never NaN
    val z = Seq((Seq.fill(8)(0.0f), randVec(5, 8))).toDF("a", "b")
      .select(VectorExprs.vecDotQ8(
        VectorExprs.vecQ8($"a"), VectorExprs.vecQ8($"b")).as("d"))
      .head().getDouble(0)
    assert(z == 0.0)
  }

  test("interpreted eval == generated code for quantize and dot") {
    VectorExprs.register(spark)
    val df = (1L to 50L).map(s => (s, randVec(s, 32), randVec(s + 99, 32)))
      .toDF("id", "a", "b")
    def run(mode: String): Seq[(Long, Double)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select($"id",
          VectorExprs.vecDotQ8(
            VectorExprs.vecQ8($"a"), VectorExprs.vecQ8($"b")).as("d"))
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(run("NO_CODEGEN") == run("CODEGEN_ONLY"))
  }

  test("quantized top-k recall >= 0.9 of exact top-k on real embeddings") {
    val emb = Tables.load(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "corpus_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = hits(Similarity.bruteForceTopK(emb, queries, k = 10))
    val approx = hits(Similarity.bruteForceTopKQuantized(emb, queries, k = 10))
    val recalls = exact.map { case (q, ex) =>
      (approx.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean (per-query: ${recalls.toSeq.sorted})")
  }
}
