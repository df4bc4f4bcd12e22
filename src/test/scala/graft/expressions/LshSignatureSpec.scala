package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LshSignatureSpec extends SparkSpec {
  import spark.implicits._

  VectorExprs.register(spark)

  test("signature packs sign bits plane-major into per-table longs") {
    // dim=2, 2 tables × 2 bits. Planes chosen so signs are unambiguous:
    //  p0=(1,0)  → dot=x      p1=(0,1)  → dot=y
    //  p2=(-1,0) → dot=-x     p3=(1,1)  → dot=x+y
    val flat = Seq(1.0, 0.0, 0.0, 1.0, -1.0, 0.0, 1.0, 1.0)
    val df = Seq(
      (1L, Array(2.0f, 3.0f)),   // t0: x>0 bit0, y>0 bit1 = 3; t1: -x<0, x+y>0 bit1 = 2
      (2L, Array(-1.0f, 0.5f)),  // t0: x<0, y>0 = 2;  t1: -x>0 bit0, x+y<0 = 1
      (3L, Array(0.0f, 0.0f)))   // all dots 0 → no bits (ties are "not > 0")
      .toDF("id", "v")
    val got = df.select($"id",
        VectorExprs.lshSig($"v", typedlit(flat), lit(2)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) == Seq(3L, 2L))
    assert(got(2L) == Seq(2L, 1L))
    assert(got(3L) == Seq(0L, 0L))
  }

  test("interpreted and codegen paths agree; signs are scale-invariant") {
    val rng = new scala.util.Random(7)
    val flat = Seq.fill(4 * 8 * 16)(rng.nextGaussian())
    val df = (1L to 50L).map(i =>
        (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
    def run(mode: String): Seq[(Long, Seq[Long])] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try df.select($"id", VectorExprs.lshSig($"v", typedlit(flat), lit(8)).as("s"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val interp = run("NO_CODEGEN")
    assert(interp == run("CODEGEN_ONLY"))
    // scaling a vector never changes its buckets (sign invariance)
    val scaled = df.select($"id", transform($"v", x => x * 100f).as("v"))
      .select($"id", VectorExprs.lshSig($"v", typedlit(flat), lit(8)).as("s"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(scaled == interp)
  }
}
