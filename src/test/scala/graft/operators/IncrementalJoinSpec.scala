package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Join-view IVM: the signed delta algebra must reproduce the full join
  * exactly — multiset semantics, deletes, both-side changes, and the
  * delta×delta cross term.
  */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def viewRows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSet

  test("refresh ≡ full join across inserts, deletes, and both-side changes") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmj-").toString, retainVersions = 10)

    // duplicates on purpose: (1,"x") twice in A — multiset semantics
    val a0 = Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "z"))
      .toDF("k", "a_val")
    val b0 = Seq((1L, "P"), (2L, "Q"), (4L, "R")).toDF("k", "b_val")
    store.overwrite("A", a0)
    store.overwrite("B", b0)
    val aV0 = store.currentVersion("A")
    val bV0 = store.currentVersion("B")

    store.overwrite("V", IncrementalJoin.fullJoin(
      store.read("A"), store.read("B"), Seq("k")))

    // A: delete one (1,x) copy, insert (4,w); B: delete (2,Q), insert
    // (3,S) and a SECOND (1,P) copy — every delta class at once
    val a1 = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w")).toDF("k", "a_val")
    val b1 = Seq((1L, "P"), (1L, "P"), (3L, "S"), (4L, "R")).toDF("k", "b_val")
    store.overwrite("A", a1)
    store.overwrite("B", b1)
    val aV1 = store.currentVersion("A")
    val bV1 = store.currentVersion("B")

    IncrementalJoin.refresh(store, "V", "A", aV0, aV1, "B", bV0, bV1, Seq("k"))

    val expected = IncrementalJoin.fullJoin(a1, b1, Seq("k"))
    assert(viewRows(store.read("V")) == viewRows(expected))
    // sanity on the multiset: (1,x,P) now has multiplicity 1*2 = 2
    val m = store.read("V").where("k = 1").select("__mult")
      .collect().map(_.getLong(0)).toSeq
    assert(m == Seq(2L))
  }

  test("a second refresh chains from the refreshed state (no full rebuild in between)") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmj2-").toString, retainVersions = 10)
    val a0 = Seq((1L, "x"), (2L, "y")).toDF("k", "a_val")
    val b0 = Seq((1L, "P"), (2L, "Q")).toDF("k", "b_val")
    store.overwrite("A", a0); store.overwrite("B", b0)
    val (av0, bv0) = (store.currentVersion("A"), store.currentVersion("B"))
    store.overwrite("V", IncrementalJoin.fullJoin(a0, b0, Seq("k")))

    val a1 = Seq((2L, "y"), (3L, "z")).toDF("k", "a_val")
    store.overwrite("A", a1)
    val av1 = store.currentVersion("A")
    IncrementalJoin.refresh(store, "V", "A", av0, av1, "B", bv0, bv0, Seq("k"))

    val b1 = Seq((2L, "Q"), (3L, "S")).toDF("k", "b_val")
    store.overwrite("B", b1)
    val bv1 = store.currentVersion("B")
    IncrementalJoin.refresh(store, "V", "A", av1, av1, "B", bv0, bv1, Seq("k"))

    val expected = IncrementalJoin.fullJoin(a1, b1, Seq("k"))
    assert(viewRows(store.read("V")) == viewRows(expected))
  }

  test("empty deltas are a no-op refresh") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmj3-").toString, retainVersions = 10)
    val a0 = Seq((1L, "x")).toDF("k", "a_val")
    val b0 = Seq((1L, "P")).toDF("k", "b_val")
    store.overwrite("A", a0); store.overwrite("B", b0)
    val (av, bv) = (store.currentVersion("A"), store.currentVersion("B"))
    store.overwrite("V", IncrementalJoin.fullJoin(a0, b0, Seq("k")))
    IncrementalJoin.refresh(store, "V", "A", av, av, "B", bv, bv, Seq("k"))
    assert(viewRows(store.read("V")) ==
      viewRows(IncrementalJoin.fullJoin(a0, b0, Seq("k"))))
  }

  private def aggRows(df: org.apache.spark.sql.DataFrame) = df
    .selectExpr("g", "n_rows", "__nn", "CAST(total_m AS STRING)")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      Option(r.getString(3)))).toSet

  test("refreshAgg ≡ fullJoinAgg across both-side inserts and deletes") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmja-").toString, retainVersions = 10)
    val a0 = Seq((1L, Some(10.0)), (1L, Some(5.0)), (2L, Some(7.0)), (3L, Some(1.0)))
      .toDF("k", "m")
    val b0 = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g3")).toDF("k", "g")
    store.overwrite("A", a0); store.overwrite("B", b0)
    val (av0, bv0) = (store.currentVersion("A"), store.currentVersion("B"))
    store.overwrite("V", IncrementalJoin.fullJoinAgg(a0, b0, Seq("k"), Seq("g"), "m"))

    val a1 = Seq((1L, Some(10.0)), (2L, Some(7.0)), (4L, Some(100.0)), (5L, None))
      .toDF("k", "m") // delete (1,5.0) and (3,1.0); insert (4,100), (5,null)
    val b1 = Seq((1L, "g1"), (2L, "g1"), (4L, "g3"), (5L, "g2")).toDF("k", "g")
    store.overwrite("A", a1); store.overwrite("B", b1)
    IncrementalJoin.refreshAgg(store, "V",
      "A", av0, store.currentVersion("A"), "B", bv0, store.currentVersion("B"),
      Seq("k"), Seq("g"), "m")
    assert(aggRows(store.read("V")) ==
      aggRows(IncrementalJoin.fullJoinAgg(a1, b1, Seq("k"), Seq("g"), "m")))
    // g2 survives on the null-measure row alone: SUM must be NULL, not 0
    val g2 = store.read("V").where("g = 'g2'")
      .select("n_rows", "total_m").collect()
    assert(g2.length == 1 && g2(0).getLong(0) == 1L && g2(0).isNullAt(1))
  }

  test("refreshAgg drops a group whose last join row disappears, exactly") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmja2-").toString, retainVersions = 10)
    val a0 = Seq((1L, 2.0), (3L, 9.0)).toDF("k", "m")
    val b0 = Seq((1L, "g1"), (3L, "g9")).toDF("k", "g")
    store.overwrite("A", a0); store.overwrite("B", b0)
    val (av0, bv0) = (store.currentVersion("A"), store.currentVersion("B"))
    store.overwrite("V", IncrementalJoin.fullJoinAgg(a0, b0, Seq("k"), Seq("g"), "m"))
    val a1 = Seq((1L, 2.0)).toDF("k", "m") // g9 loses its only row
    store.overwrite("A", a1)
    IncrementalJoin.refreshAgg(store, "V",
      "A", av0, store.currentVersion("A"), "B", bv0, bv0, Seq("k"), Seq("g"), "m")
    assert(store.read("V").select("g").collect().map(_.getString(0)).toSeq == Seq("g1"))
  }
}
