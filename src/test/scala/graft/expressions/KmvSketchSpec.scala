package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the KMV sketch's estimator contract: exactness below k, bounded
  * relative error above it, partition/merge invariance (the sketch is a
  * deterministic function of the SET, not the layout), and the set
  * algebra (union / jaccard / intersection estimates) that justifies KMV
  * next to HLL.
  */
class KmvSketchSpec extends SparkSpec with Matchers {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    KmvSketch.register(spark)
  }

  private def sketchOf(ids: Seq[Long], k: Int, parts: Int = 4) = {
    ids.toDF("id").repartition(parts)
      .agg(KmvSketch.kmvSketch(col("id"), k).as("s"))
      .select(col("s.estimate").as("est"), col("s.sketch").as("sk"))
      .collect()(0)
  }

  test("exact when distinct count is below k") {
    val r = sketchOf(1L to 100L, k = 256)
    r.getDouble(0) shouldBe 100.0
    r.getSeq[Long](1).size shouldBe 100
  }

  test("estimate within 15% at 50k distinct, k=512") {
    val r = sketchOf(1L to 50000L, k = 512)
    math.abs(r.getDouble(0) / 50000.0 - 1.0) should be < 0.15
  }

  test("duplicates don't inflate: sketch sees the set, not the bag") {
    val once = sketchOf(1L to 5000L, k = 512)
    val thrice = sketchOf((1L to 5000L) ++ (1L to 5000L) ++ (1L to 5000L), k = 512)
    thrice.getDouble(0) shouldBe once.getDouble(0)
    thrice.getSeq[Long](1) shouldBe once.getSeq[Long](1)
  }

  test("partition invariance: identical sketch at 1, 7, and 32 partitions") {
    val a = sketchOf(1L to 20000L, k = 256, parts = 1)
    val b = sketchOf(1L to 20000L, k = 256, parts = 7)
    val c = sketchOf(1L to 20000L, k = 256, parts = 32)
    a.getSeq[Long](1) shouldBe b.getSeq[Long](1)
    b.getSeq[Long](1) shouldBe c.getSeq[Long](1)
    a.getDouble(0) shouldBe c.getDouble(0)
  }

  test("sketch array is ascending and non-negative (63-bit domain)") {
    val sk = sketchOf(1L to 10000L, k = 128).getSeq[Long](1)
    sk.size shouldBe 128
    all(sk) should be >= 0L
    sk shouldBe sk.sorted
  }

  test("set algebra: union / jaccard / intersection on planted overlap") {
    val k = 512
    // A = 1..30000, B = 20001..50000: |A∪B| = 50000, |A∩B| = 10000, J = 0.2
    val df = spark.range(1, 50001).select(
      col("id"),
      (col("id") <= 30000).as("in_a"), (col("id") > 20000).as("in_b"))
    val r = df.agg(
        KmvSketch.kmvSketch(when(col("in_a"), col("id")), k).as("sa"),
        KmvSketch.kmvSketch(when(col("in_b"), col("id")), k).as("sb"))
      .select(
        KmvSketch.unionEstimate(col("sa.sketch"), col("sb.sketch"), k).as("u"),
        KmvSketch.jaccardEstimate(col("sa.sketch"), col("sb.sketch"), k).as("j"),
        KmvSketch.intersectEstimate(col("sa.sketch"), col("sb.sketch"), k).as("i"))
      .collect()(0)
    math.abs(r.getDouble(0) / 50000.0 - 1.0) should be < 0.15
    math.abs(r.getDouble(1) - 0.2) should be < 0.08
    math.abs(r.getDouble(2) / 10000.0 - 1.0) should be < 0.35
  }

  test("union of disjoint small sets is exact (merged sketch below k)") {
    val k = 512
    val df = spark.range(1, 201).select(
      col("id"), (col("id") <= 100).as("in_a"))
    val r = df.agg(
        KmvSketch.kmvSketch(when(col("in_a"), col("id")), k).as("sa"),
        KmvSketch.kmvSketch(when(!col("in_a"), col("id")), k).as("sb"))
      .select(
        KmvSketch.unionEstimate(col("sa.sketch"), col("sb.sketch"), k).as("u"),
        KmvSketch.jaccardEstimate(col("sa.sketch"), col("sb.sketch"), k).as("j"))
      .collect()(0)
    r.getDouble(0) shouldBe 200.0
    r.getDouble(1) shouldBe 0.0
  }

  test("nulls are ignored, not hashed") {
    val est = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("id")
      .agg(KmvSketch.kmvSketch(col("id"), 64).as("s"))
      .select(col("s.estimate")).collect()(0).getDouble(0)
    est shouldBe 3.0
  }
}
