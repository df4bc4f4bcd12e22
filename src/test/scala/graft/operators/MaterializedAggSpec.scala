package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) = df
    .select($"k", $"__mv_count", $"sum_v".cast("double"))
    .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

  test("applyDelta equals full recompute for inserts, deletes, updates, vanished groups") {
    val v0 = Seq((1L, 10), (1L, 20), (2L, 5), (3L, 7))
      .toDF("k", "v").select($"k", $"v".cast("decimal(18,2)").as("v"))
    // group 1 updated (20 -> 25), group 2 deleted entirely, group 4 new
    val v1 = Seq((1L, 10), (1L, 25), (3L, 7), (4L, 100))
      .toDF("k", "v").select($"k", $"v".cast("decimal(18,2)").as("v"))
    val changes =
      v1.exceptAll(v0).withColumn("_change_type", lit("insert"))
        .unionByName(v0.exceptAll(v1).withColumn("_change_type", lit("delete")))
    val maintained = MaterializedAgg.applyDelta(
      MaterializedAgg.compute(v0, Seq("k"), Seq("v")), changes, Seq("k"), Seq("v"))
    assert(asMap(maintained) === asMap(MaterializedAgg.compute(v1, Seq("k"), Seq("v"))))
    // the vanished group is truly gone, not a zero row
    assert(!asMap(maintained).contains(2L))
  }

  test("applyDelta composes: two deltas in sequence equal one recompute") {
    def mk(rows: Seq[(Long, Int)]) = rows.toDF("k", "v")
      .select($"k", $"v".cast("decimal(18,2)").as("v"))
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      b.exceptAll(a).withColumn("_change_type", lit("insert"))
        .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
    val v0 = mk(Seq((1L, 1), (2L, 2)))
    val v1 = mk(Seq((1L, 1), (2L, 3), (3L, 9)))
    val v2 = mk(Seq((2L, 3), (3L, 9), (3L, 1)))
    val s2 = MaterializedAgg.applyDelta(
      MaterializedAgg.applyDelta(
        MaterializedAgg.compute(v0, Seq("k"), Seq("v")),
        diff(v0, v1), Seq("k"), Seq("v")),
      diff(v1, v2), Seq("k"), Seq("v"))
    assert(asMap(s2) === asMap(MaterializedAgg.compute(v2, Seq("k"), Seq("v"))))
  }

  test("unknown change types fail loudly instead of corrupting the state") {
    val state = MaterializedAgg.compute(
      Seq((1L, 1)).toDF("k", "v").select($"k", $"v".cast("decimal(18,2)").as("v")),
      Seq("k"), Seq("v"))
    val bad = Seq((1L, 1)).toDF("k", "v")
      .select($"k", $"v".cast("decimal(18,2)").as("v"))
      .withColumn("_change_type", lit("update_preimage")) // Delta-CDF style tag
    val e = intercept[Exception] {
      MaterializedAgg.applyDelta(state, bad, Seq("k"), Seq("v")).collect()
    }
    assert(e.getMessage.contains("unknown change type"))
  }
}
