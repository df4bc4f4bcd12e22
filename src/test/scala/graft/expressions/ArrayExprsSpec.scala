package graft.expressions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ArrayExprsSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_intersect_size equals size(array_intersect) on randomized sorted-distinct arrays") {
    ArrayExprs.register(spark)
    val rng = new Random(7)
    val vocab = (0 until 200).map(i => s"tok$i")
    val rows = (0 until 500).map { _ =>
      val a = rng.shuffle(vocab).take(rng.nextInt(50)).distinct.sorted
      val b = rng.shuffle(vocab).take(rng.nextInt(50)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("x"))) :+ ((Seq.empty[String], Seq.empty[String]))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        ArrayExprs.sortedIntersectSize($"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(bad.count() == 0)
  }

  test("real corpus: minhash verify counts identical under native intersect") {
    ArrayExprs.register(spark)
    // the exact shape the dedup verify join runs: per-doc sorted
    // distinct tokens, pairwise intersection size
    val toks = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
      .select($"doc_id", array_sort(array_distinct(split(lower(trim($"text")), "\\s+"))).as("t"))
    val pairs = toks.select($"doc_id".as("id1"), $"t".as("t1"))
      .crossJoin(toks.select($"doc_id".as("id2"), $"t".as("t2")))
      .filter($"id1" < $"id2")
    val bad = pairs.select(
        ArrayExprs.sortedIntersectSize($"t1", $"t2").as("fast"),
        size(array_intersect($"t1", $"t2")).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(bad.count() == 0)
  }

  test("null array yields null; null elements (sorted last) never match") {
    ArrayExprs.register(spark)
    val r = Seq((null: Seq[String], Seq("a")))
      .toDF("a", "b")
      .select(ArrayExprs.sortedIntersectSize($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
    val withNulls = Seq((Seq("a", "b", null), Seq("a", null)))
      .toDF("a", "b")
      .select(ArrayExprs.sortedIntersectSize($"a", $"b")).as[Int].head()
    assert(withNulls == 1)
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(ArrayExprs.sortedIntersectSize($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("array") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
