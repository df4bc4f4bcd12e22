package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private def freshStore(): TableStore = {
    val root = java.nio.file.Files.createTempDirectory("graft-annspec-").toString
    new TableStore(spark, root)
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) = df
    .select($"query_id".cast("long"), $"corpus_id".cast("long"), $"rank".cast("int"),
      round($"score", 9).cast("double"))
    .as[(Long, Long, Int, Double)].collect().sortBy(t => (t._1, t._3)).toSeq

  test("persisted search is bit-identical to the in-memory IVF path") {
    val store = freshStore()
    AnnIndex.build(store, "e", emb, numCells = 16)
    val reopened = AnnIndex.open(store, "e")
    val queries = emb.filter($"vec_id" < 10)
    val persisted = asTuples(AnnIndex.search(reopened, queries, k = 5, nprobe = 4))
    val cents = Similarity.centroids(emb, 16)
    val memory = asTuples(
      Similarity.ivfTopKWith(emb, queries, k = 5, cents, nprobe = 4))
    assert(persisted === memory)
    assert(persisted.nonEmpty)
  }

  test("postings land as Hive cell_id partitions and the search scan prunes to probed cells") {
    val store = freshStore()
    val h = AnnIndex.build(store, "e", emb, numCells = 16)
    // physical layout: one cell_id=N subdirectory per non-empty cell
    val dirs = new java.io.File(store.path(h.postingsTable)).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell_id=")), dirs.toString)
    // the serve path's postings scan carries the probed-cell partition
    // filter — only nprobe-ish directories are read, not the corpus
    val res = AnnIndex.search(h, emb.filter($"vec_id" === 3), k = 5, nprobe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("ann_postings") && l.contains("PartitionFilters"))
    assert(scanLine.exists(l =>
      l.substring(l.indexOf("PartitionFilters")).take(200).contains("cell_id")),
      s"postings scan not partition-pruned:\n$plan")
  }

  test("recall vs brute force matches the in-memory IVF recall (same tuning)") {
    val store = freshStore()
    val h = AnnIndex.build(store, "e", emb, numCells = 16)
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val approx = AnnIndex.search(h, queries, k = 5, nprobe = 4)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // identical tuning to SimilaritySpec's in-memory IVF recall floor
    assert(recall >= 0.6, s"persisted IVF recall $recall below floor")
  }

  test("append merges new vectors cell-aligned; search equals the one-shot index") {
    val n = emb.agg(max($"vec_id")).as[Long].head()
    val half = n / 2 // first half holds vec_id 0..15, so centroids match one-shot
    val store = freshStore()
    val h = AnnIndex.build(store, "e", emb.filter($"vec_id" <= half), numCells = 16)
    AnnIndex.append(h, emb.filter($"vec_id" > half))
    val oneShot = AnnIndex.build(freshStore(), "e", emb, numCells = 16)
    val queries = emb.filter($"vec_id" < 10)
    assert(asTuples(AnnIndex.search(AnnIndex.open(store, "e"), queries, k = 5, nprobe = 4)) ===
      asTuples(AnnIndex.search(oneShot, queries, k = 5, nprobe = 4)))
    // duplicate ids within a touched cell are refused, not silently doubled
    val e = intercept[IllegalArgumentException](
      AnnIndex.append(h, emb.filter($"vec_id" === 0)))
    assert(e.getMessage.contains("duplicate"))
  }

  test("quantized index: int8 postings shrink the payload ~4x at recall parity") {
    val storeF = freshStore(); val storeQ = freshStore()
    AnnIndex.build(storeF, "e", emb, numCells = 16)
    val hq = AnnIndex.buildQuantized(storeQ, "e", emb, numCells = 16)
    def bytes(store: TableStore, table: String): Long = {
      def size(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(size).sum else f.length()
      size(new java.io.File(store.path(table)))
    }
    val full = bytes(storeF, "e_ann_postings")
    val quant = bytes(storeQ, "e_ann_postings")
    assert(quant < full * 0.45, // parquet framing overhead eats some of the 4x
      s"quantized postings not smaller: $quant vs $full bytes")
    // recall of the quantized serve path vs exact brute force
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val approx = AnnIndex.searchQuantized(hq, queries, k = 5, nprobe = 4)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"quantized IVF recall $recall below the float floor")
  }

  test("append works on a quantized index too (batch quantized to match)") {
    val n = emb.agg(max($"vec_id")).as[Long].head()
    val half = n / 2
    val store = freshStore()
    val h = AnnIndex.buildQuantized(store, "e", emb.filter($"vec_id" <= half), numCells = 16)
    AnnIndex.append(h, emb.filter($"vec_id" > half))
    val oneShot = AnnIndex.buildQuantized(freshStore(), "e", emb, numCells = 16)
    val queries = emb.filter($"vec_id" < 10)
    assert(asTuples(AnnIndex.searchQuantized(AnnIndex.open(store, "e"), queries, k = 5, nprobe = 4)) ===
      asTuples(AnnIndex.searchQuantized(oneShot, queries, k = 5, nprobe = 4)))
  }

  test("open on a missing index fails loudly; rebuild overwrites in place") {
    val store = freshStore()
    intercept[IllegalArgumentException](AnnIndex.open(store, "nope"))
    AnnIndex.build(store, "e", emb.filter($"vec_id" < 50), numCells = 4)
    val v1 = AnnIndex.search(AnnIndex.open(store, "e"),
      emb.filter($"vec_id" === 1), k = 3, nprobe = 2).count()
    AnnIndex.build(store, "e", emb, numCells = 16) // rebuild, larger corpus
    val v2 = AnnIndex.search(AnnIndex.open(store, "e"),
      emb.filter($"vec_id" === 1), k = 3, nprobe = 2).count()
    assert(v1 === 3L && v2 === 3L)
  }

  test("serveStream: streamed query batches equal batch search, replays append nothing") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    AnnIndex.build(store, "e", emb, numCells = 16)
    val h = AnnIndex.open(store, "e")
    val qvecs = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = qvecs.partition(_._1 < 5)

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = AnnIndex.serveStream(
      h, mem.toDS().toDF("vec_id", "embedding"), k = 5, nprobe = 4,
      resultTable = "hits", appId = "serve-test")
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = asTuples(store.read("hits"))
    val batch = asTuples(AnnIndex.search(h, emb.filter($"vec_id" < 10), 5, 4))
    assert(streamed === batch)
    val before = store.read("hits").count()
    // ledger-visible replay: commitIfNew skips the body entirely
    var ran = false
    store.commitIfNew("hits", "serve-test", 0L) { ran = true }
    assert(!ran && store.read("hits").count() === before)
    // crash-window replay (write done, ledger move lost): the body is a
    // partition overwrite of the batch's own partition — re-running it
    // must leave the table row-identical, not doubled
    val batch0Hits = AnnIndex.search(h, emb.filter($"vec_id" < 5), 5, 4)
      .withColumn("batch_id", lit(0L))
    store.overwritePartitions("hits", batch0Hits, "batch_id", Seq(0L))
    assert(store.read("hits").count() === before)
    assert(asTuples(store.read("hits")) === batch)
  }

  /** Relative-path → size inventory of the postings table's data files —
    * the byte-identity probe for rebalance's copy-on-write claim.
    */
  private def inventory(store: TableStore, h: AnnIndex.Handle): Map[String, Long] = {
    val root = java.nio.file.Paths.get(store.path(h.postingsTable))
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.collection.JavaConverters._
      s.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
        .toMap
    } finally s.close()
  }

  test("rebalance splits only oversized cells; untouched partitions stay byte-identical") {
    val store = freshStore()
    AnnIndex.build(store, "e", emb, numCells = 8)
    val h = AnnIndex.open(store, "e")
    val n = emb.count()
    val sizes = h.postings.groupBy($"cell_id").count()
      .select($"cell_id".cast("int"), $"count")
      .as[(Int, Long)].collect().toMap
    val threshold = sizes.values.max - 1 // split exactly the largest cell(s)
    val splitCells = sizes.filter(_._2 > threshold).keySet
    assert(splitCells.nonEmpty)
    val splitIds = h.postings
      .filter($"cell_id".isin(splitCells.toSeq.map(Int.box): _*))
      .select($"vec_id".cast("long")).as[Long].collect().toSet
    val before = inventory(store, h)

    AnnIndex.rebalance(h, maxCellSize = threshold, subCells = 2)

    // postings conserved, split partitions physically gone
    assert(h.postings.count() === n)
    splitCells.foreach(c =>
      assert(!inventory(store, h).keys.exists(_.startsWith(s"cell_id=$c/")),
        s"split cell $c directory survived"))
    // destinations = cells the split vectors actually landed in; every
    // OTHER partition must be byte-for-byte the file set it was before
    val destCells = h.postings
      .filter($"vec_id".isin(splitIds.toSeq.map(Long.box): _*))
      .select($"cell_id".cast("int")).distinct().as[Int].collect().toSet
    val after = inventory(store, h)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .map(_.split('/').head.stripPrefix("cell_id=").toInt)
    assert(changed.subsetOf(splitCells ++ destCells),
      s"partitions $changed changed beyond split=$splitCells dest=$destCells")
    assert((before.keySet -- after.keySet).nonEmpty) // split files removed
    // at least one untouched partition kept its exact files (copy-on-write)
    val untouchedKept = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(untouchedKept.nonEmpty)

    // FULL-PROBE search over the rebalanced index is exactly brute force
    val nCells = h.centroids.count().toInt
    val served = asTuples(
      AnnIndex.search(h, emb.filter($"vec_id" < 8), k = 5, nprobe = nCells))
    val brute = asTuples(
      Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 8), k = 5))
    assert(served === brute)

    // every rebalanced posting sits under its NEAREST current centroid
    // for the moved set (the global-assignment invariant the reassign
    // step promises — moved vectors are never force-bucketed)
    val reassigned = Similarity.assignCells(
        h.postings.filter($"vec_id".isin(splitIds.toSeq.map(Long.box): _*))
          .drop("cell_id"),
        h.centroids)
      .select($"vec_id".cast("long"), $"cell_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    val actual = h.postings
      .filter($"vec_id".isin(splitIds.toSeq.map(Long.box): _*))
      .select($"vec_id".cast("long"), $"cell_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(actual === reassigned)
  }

  test("rebalance: no-op below threshold, loud refusal on a quantized index") {
    val store = freshStore()
    AnnIndex.build(store, "e", emb, numCells = 8)
    val h = AnnIndex.open(store, "e")
    val before = inventory(store, h)
    AnnIndex.rebalance(h, maxCellSize = emb.count() + 1)
    assert(inventory(store, h) === before) // nothing oversized, nothing touched
    AnnIndex.buildQuantized(store, "q", emb, numCells = 8)
    val hq = AnnIndex.open(store, "q")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.rebalance(hq, maxCellSize = 1)
    }
    assert(e.getMessage.contains("rebuild"))
  }
}
