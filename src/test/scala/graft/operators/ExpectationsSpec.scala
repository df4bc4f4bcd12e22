package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),     // fails positive
    (3L, None, "ok"),           // NULL condition = violation (DLT semantics)
    (4L, Some(3.0), "bad"),     // fails tag
    (5L, Some(-1.0), "bad"))    // fails both
    .toDF("id", "v", "tag")

  private val exps = Seq(
    expect("positive", $"v" > 0),
    expect("good_tag", $"tag" === "ok"))

  test("annotate lists violated expectations sorted; valid/quarantine partition") {
    val ann = annotate(df, exps)
      .select($"id", array_join($"failed_expectations", ",").as("f"))
      .as[(Long, String)].collect().toMap
    assert(ann == Map(1L -> "", 2L -> "positive", 3L -> "positive",
      4L -> "good_tag", 5L -> "good_tag,positive"))

    assert(valid(df, exps).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(valid(df, exps).columns.toSeq == df.columns.toSeq) // annotation dropped
    val q = quarantine(df, exps).select("id").as[Long].collect().sorted.toSeq
    assert(q == Seq(2L, 3L, 4L, 5L))
    // partition is exact: every row lands on exactly one side
    assert(valid(df, exps).count() + quarantine(df, exps).count() == df.count())
  }

  test("observed metrics ride the action — no extra jobs, exact counts") {
    val (obs, o) = observed(df, exps)
    obs.collect() // the caller's own action materializes the metrics
    val m = o.get
    assert(m("n_rows") == 5L)
    assert(m("failed_positive") == 3L) // ids 2, 3 (null), 5
    assert(m("failed_good_tag") == 2L) // ids 4, 5
  }

  test("re-annotating refuses instead of silently overwriting the violation record") {
    val df = Seq((1L, 5)).toDF("id", "v")
    val once = Expectations.annotate(df, Seq(Expectations.expect("pos", col("v") > 0)))
    val e = intercept[IllegalArgumentException](
      Expectations.annotate(once, Seq(Expectations.expect("big", col("v") > 10))))
    assert(e.getMessage.contains("failed_expectations"))
  }
}
