package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native vec_dot/vec_norm agree with the zip_with/aggregate reference") {
    VectorExprs.register(spark)
    val emb = Tables.load(spark, sf, "embeddings").limit(100)
    val pairs = emb.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .crossJoin(emb.select($"vec_id".as("id2"), $"embedding".as("v2")))
      .filter($"id1" < $"id2").limit(500)
    val diff = pairs.select(
        abs(VectorExprs.vecDot($"v1", $"v2") - Similarity.dot($"v1", $"v2")).as("dd"),
        abs(VectorExprs.vecNorm($"v1") - Similarity.l2Norm($"v1")).as("dn"))
      .agg(max($"dd"), max($"dn")).head()
    assert(diff.getDouble(0) < 1e-12)
    assert(diff.getDouble(1) < 1e-12)
  }

  test("interpreted eval equals codegen result (double and float arrays)") {
    VectorExprs.register(spark)
    // double arrays
    val d = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .select(VectorExprs.vecDot($"a", $"b").as("dot"), VectorExprs.vecNorm($"a").as("n"))
      .head()
    assert(d.getDouble(0) == 32.0)
    assert(math.abs(d.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    // float arrays
    val f = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
      .select(VectorExprs.vecDot($"a", $"b")).as[Double].head()
    assert(f == 0.0)
  }

  test("null inputs yield null, type errors rejected at analysis") {
    VectorExprs.register(spark)
    val r = Seq((null: Array[Double], Array(1.0)))
      .toDF("a", "b")
      .select(VectorExprs.vecDot($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq(("notavector", 1)).toDF("a", "b")
        .select(VectorExprs.vecDot($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("SQL surface: vec_dot callable from spark.sql") {
    VectorExprs.register(spark)
    Tables.load(spark, sf, "embeddings").limit(5).createOrReplaceTempView("e5")
    val n = spark.sql(
      "SELECT vec_dot(a.embedding, b.embedding) AS d FROM e5 a JOIN e5 b ON a.vec_id < b.vec_id")
      .filter(col("d").isNotNull).count()
    assert(n == 10)
  }
}
