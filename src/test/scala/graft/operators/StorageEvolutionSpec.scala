package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition evolution and string-statistics pruning on the store. */
class StorageEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("evolvePartitioning: new layout, identical content, old version still readable") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-evolve-").toString, retainVersions = 5)
    val df = (1L to 100L).map(i => (i, s"u${i % 4}", s"r${i % 3}"))
      .toDF("id", "user_band", "region")
    store.overwrite("t", df, partitionBy = Seq("user_band"))
    val v0 = store.currentVersion("t")
    assert(store.partitionColumns("t") == Seq("user_band"))

    store.evolvePartitioning("t", Seq("region"))
    assert(store.partitionColumns("t") == Seq("region"))
    // content identical under the new layout
    assert(store.read("t").orderBy("id").collect().toSeq ==
      df.select("id", "user_band", "region").orderBy("id").collect().toSeq)
    // the pre-evolution generation still reads with its own layout
    assert(store.read("t", v0).count() == 100)
    // partition-pruned paths exist under the new scheme
    val files = store.read("t").select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.forall(_.contains("region=")), files.mkString(","))
  }

  test("string stats prune files on a range-laid-out string column, results unchanged") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-strstats-").toString)
    // range layout on the string key → disjoint per-file ranges
    val df = ('a' to 'z').flatMap(c => (1 to 20).map(i => (s"$c$i", i.toLong)))
      .toDF("k", "v")
    store.overwrite("t", df.repartitionByRange(6, col("k")))
    store.analyzeStringColumn("t", "k")

    val total = store.read("t").select(input_file_name()).distinct().count()
    val scheduled = store.prunedStringFileCount("t", "k", "b", "c~")
    assert(scheduled < total, s"no pruning: $scheduled of $total files")

    val pruned = store.readPrunedString("t", "k", "b", "c~")
      .orderBy("k").collect().toSeq
    val plain = store.read("t").filter(col("k").between("b", "c~"))
      .orderBy("k").collect().toSeq
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("string stats: all-null files are kept, stats vanish on overwrite") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-strstats2-").toString)
    val df = Seq(("a", 1L), (null, 2L)).toDF("k", "v")
    store.overwrite("t", df.repartitionByRange(2, col("v")))
    store.analyzeStringColumn("t", "k")
    // range that matches nothing still schedules the all-null file
    assert(store.prunedStringFileCount("t", "k", "zz", "zzz") >= 1)
    // overwrite drops the stats file → prune falls back to a plain read
    store.overwrite("t", df)
    val out = store.readPrunedString("t", "k", "a", "a").collect()
    assert(out.length == 1)
    intercept[RuntimeException](store.prunedStringFileCount("t", "k", "a", "a"))
  }
}
