package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft-merge-").toString)

  test("insert-only merge adds absent keys, never updates, idempotent rerun") {
    val store = freshStore()
    val v1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    store.overwrite("t", v1)
    val src = Seq((2, "CHANGED"), (3, "c")).toDF("k", "v")
    Merge.mergeInto(store, "t", src, Seq("k"))
    val after = store.read("t").orderBy("k").as[(Int, String)].collect().toSeq
    assert(after == Seq((1, "a"), (2, "b"), (3, "c"))) // 2 not updated
    // rerun with identical source adds 0 rows (FIXTURES.md edge 8)
    Merge.mergeInto(store, "t", src, Seq("k"))
    assert(store.read("t").count() == 3)
  }

  test("scd1 merge updates listed attrs only, inserts new, keeps survivors") {
    val store = freshStore()
    val target = Seq((1, "a", "keep1"), (2, "b", "keep2")).toDF("k", "v", "stable")
    store.overwrite("t2", target)
    val src = Seq((2, "B2", "ignored"), (3, "c", "new3")).toDF("k", "v", "stable")
    Merge.mergeInto(store, "t2", src, Seq("k"), updateCols = Seq("v"))
    val after = store.read("t2").orderBy("k").as[(Int, String, String)].collect().toSeq
    assert(after == Seq(
      (1, "a", "keep1"),    // survivor untouched
      (2, "B2", "keep2"),   // v updated, stable kept from target
      (3, "c", "new3")))    // inserted whole
    // idempotence: rerunning the same source changes nothing
    Merge.mergeInto(store, "t2", src, Seq("k"), updateCols = Seq("v"))
    assert(store.read("t2").orderBy("k").as[(Int, String, String)].collect().toSeq == after)
  }

  test("overwrite swap is atomic-ish: table readable after repeated overwrites") {
    val store = freshStore()
    (1 to 3).foreach { i =>
      store.overwrite("t3", Seq((i, s"v$i")).toDF("k", "v"))
      assert(store.read("t3").as[(Int, String)].head() == ((i, s"v$i")))
    }
    assert(store.exists("t3"))
    assert(!store.exists("never-written"))
  }

  test("schema evolution: new source columns widen the table, old rows get nulls") {
    val store = freshStore()
    store.overwrite("t5", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    // source grew a column; evolveSchema widens instead of failing
    Merge.mergeInto(store, "t5",
      Seq((2, "CHANGED", 9.5), (3, "c", 7.0)).toDF("k", "v", "score"),
      keys = Seq("k"), evolveSchema = true)
    val rows = store.read("t5").orderBy("k")
      .select("k", "v", "score").as[(Int, String, Option[Double])].collect().toSeq
    // insert-only: key 2 untouched but table gained the column (null)
    assert(rows == Seq((1, "a", None), (2, "b", None), (3, "c", Some(7.0))))

    // an OLD-schema source still merges into the widened table
    Merge.mergeInto(store, "t5", Seq((4, "d")).toDF("k", "v"),
      keys = Seq("k"), evolveSchema = true)
    assert(store.read("t5").count() == 4)
    assert(store.read("t5").filter($"k" === 4).select("score")
      .as[Option[Double]].head().isEmpty)

    // scd1 can update INTO a brand-new column in the same merge
    Merge.mergeInto(store, "t5",
      Seq((1, "a2", "gold")).toDF("k", "v", "tier"),
      keys = Seq("k"), updateCols = Seq("v", "tier"), evolveSchema = true)
    val r1 = store.read("t5").filter($"k" === 1)
      .select("v", "tier").as[(String, Option[String])].head()
    assert(r1 == (("a2", Some("gold"))))

    // same name, different type: loud failure, no silent coercion
    val e = intercept[IllegalArgumentException] {
      Merge.mergeInto(store, "t5", Seq((9, 123)).toDF("k", "v"),
        keys = Seq("k"), evolveSchema = true)
    }
    assert(e.getMessage.contains("type conflict"))
  }

  test("compact rewrites into requested file count, same data") {
    val store = freshStore()
    store.overwrite("t4", spark.range(1000).toDF("id").repartition(8))
    store.compact("t4", 1)
    assert(store.read("t4").count() == 1000)
    val files = new java.io.File(s"${store.root}/t4")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
  }
}
