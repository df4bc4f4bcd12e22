package graft.plans

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** A config-only user (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * must get the whole SQL surface — scalar natives, sketch aggregates,
  * and the injected rule/strategy — with zero Scala imports.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtendedSession(f: SparkSession => Unit): Unit = {
    // getOrCreate returns an existing session and IGNORES extensions, so
    // clear the active/default slots, build a fresh session on the same
    // SparkContext, and restore afterwards (never stop it — the context
    // is shared with the whole suite).
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(prev.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s2)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("injected functions: scalar natives callable from plain SQL") {
    withExtendedSession { s2 =>
      assert(s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0) == 11.0)
      assert(s2.sql("SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d'))")
        .head().getInt(0) == 2)
      val jw = s2.sql("SELECT jaro_winkler_sim('martha', 'marhta')")
        .head().getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-9)
      assert(s2.sql("SELECT quantile_bucket(5.0d, array(1.0d, 4.0d, 9.0d))")
        .head().getLong(0) == 2L)
    }
  }

  test("injected functions: sketch aggregates callable from plain SQL") {
    withExtendedSession { s2 =>
      s2.range(1000).createOrReplaceTempView("ext_ids")
      // KMV distinct estimate within its k=256 bound (~6% rel. error)
      // KMV's contract: non-negative uniform hashes (estimate scales by
      // 2^63), exactly as its gates feed it
      val kmv = s2.sql(
        "SELECT kmv_sketch(abs(xxhash64(id)), 256) AS sk FROM ext_ids")
        .selectExpr("sk.estimate", "size(sk.sketch)").head()
      assert(math.abs(kmv.getDouble(0) - 1000.0) / 1000.0 < 0.2,
        s"estimate ${kmv.getDouble(0)}")
      assert(kmv.getInt(1) == 256)
      val top = s2.sql(
        "SELECT topk_by(CAST(id AS DOUBLE), id, 3) AS t FROM ext_ids")
        .selectExpr("transform(t, x -> x.corpus_id)").head().getSeq[Long](0)
      assert(top == Seq(999L, 998L, 997L))
    }
  }

  test("rule and strategy still injected alongside the functions") {
    withExtendedSession { s2 =>
      s2.conf.set(ApproxDistinctRule.ConfKey, "true")
      s2.range(100).createOrReplaceTempView("ext_r")
      // HyperLogLogPlusPlus prints as approx_count_distinct — the rule
      // fired iff the exact count(distinct) is gone from the plan
      val plan = s2.sql("SELECT COUNT(DISTINCT id) FROM ext_r")
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"ApproxDistinctRule not applied:\n$plan")
    }
  }
}
