package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.expressions.VectorExprs

/** Pins the persisted IVF-PQ lifecycle: packed-code equivalence to the
  * array form, build→open→search across handles, partition-pruned
  * postings scans, the O(touched cells) append contract, and reranked
  * recall.
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private def freshStore(): TableStore = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-pqidx-").toString)

  test("packed codes equal the array-form codes byte for byte") {
    Pq.register(spark)
    val cb = Pq.train(emb, m = 8, k = 16, iters = 2)
    val both = emb.select(
        call_function("pq_encode", $"embedding", lit(cb.flat), lit(8)).as("arr"),
        call_function("pq_encode_packed", $"embedding", lit(cb.flat), lit(8)).as("bin"))
      .collect()
    both.foreach { r =>
      val arr = r.getSeq[Int](0)
      val bin = r.getAs[Array[Byte]](1)
      assert(arr.map(_.toByte).toSeq == bin.toSeq)
    }
  }

  test("build → reopen → search equals searching the in-memory encode (bit-equal)") {
    val store = freshStore()
    PqIndex.build(store, "e", emb, numCells = 8, m = 8, k = 16, iters = 2)
    val h = PqIndex.open(store, "e")
    val queries = emb.filter($"vec_id" < 5)
    val persisted = PqIndex.search(h, queries, k = 5, nprobe = 8) // all cells
      .orderBy("query_id", "rank").collect().toSeq
    // nprobe = numCells probes everything → must equal the flat ADC scan
    val cb = h.pqCb
    val flat = Pq.adcTopK(Pq.encode(emb, cb), queries, cb, topK = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(persisted.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))) ==
      flat.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))))
  }

  test("postings are cell_id partitions and the search scan prunes to probed cells") {
    val store = freshStore()
    val h = PqIndex.build(store, "e", emb, numCells = 8, m = 8, k = 16, iters = 1)
    val dirs = new java.io.File(store.path(h.postingsTable)).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell_id=")), dirs.toString)
    val res = PqIndex.search(h, emb.filter($"vec_id" === 3), k = 5, nprobe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("pq_postings") && l.contains("PartitionFilters"))
    assert(scanLine.exists(l =>
      l.substring(l.indexOf("PartitionFilters")).take(200).contains("cell_id")),
      s"postings scan not partition-pruned:\n$plan")
  }

  test("append merges new vectors into touched cells only; duplicate ids refused") {
    val store = freshStore()
    val base = emb.filter($"vec_id" < 40)
    val batch = emb.filter($"vec_id" >= 40 && $"vec_id" < 50)
    val h = PqIndex.build(store, "e", base, numCells = 4, m = 8, k = 8, iters = 1)
    val before = store.currentVersion(h.postingsTable)
    PqIndex.append(h, batch)
    assert(store.read(h.postingsTable).count() == 50)
    assert(store.currentVersion(h.postingsTable) > before)
    // search after append sees the union corpus under the frozen quantizers
    val hits = PqIndex.search(h, emb.filter($"vec_id" === 45), k = 3, nprobe = 4)
    assert(hits.count() == 3)
    // duplicate ids must be refused loudly
    val e = intercept[IllegalArgumentException] { PqIndex.append(h, batch) }
    assert(e.getMessage.contains("duplicate"))
  }

  test("append-then-search equals one-shot build over the union (frozen quantizers)") {
    val storeA = freshStore(); val storeB = freshStore()
    val base = emb.filter($"vec_id" < 40)
    val batch = emb.filter($"vec_id" >= 40 && $"vec_id" < 50)
    val union = emb.filter($"vec_id" < 50)
    val hA = PqIndex.build(storeA, "e", base, numCells = 4, m = 8, k = 8, iters = 1)
    PqIndex.append(hA, batch)
    // one-shot over the union, with quantizers trained on the SAME base
    // sample (sampleCap bounds the id-ordered sample to the base rows)
    val hB = PqIndex.build(storeB, "e", union, numCells = 4, m = 8, k = 8,
      iters = 1, sampleCap = 40)
    val q = emb.filter($"vec_id" < 3)
    val a = PqIndex.search(hA, q, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    val b = PqIndex.search(hB, q, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("residual mode: flag round-trips, quantization error shrinks vs raw PQ") {
    val store = freshStore()
    val hRaw = PqIndex.build(store, "raw", emb, numCells = 8, m = 8, k = 16, iters = 2)
    val hRes = PqIndex.build(store, "res", emb, numCells = 8, m = 8, k = 16,
      iters = 2, residual = true)
    assert(!PqIndex.open(store, "raw").residual)
    assert(PqIndex.open(store, "res").residual)
    // reconstruction MSE: residual codebooks quantize the low-variance
    // residuals, so their error must undercut raw-vector PQ
    val vecs = emb.select($"vec_id".cast("long"), $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def mse(h: PqIndex.Handle): Double = {
      val coarse = h.coarseCb; val pq = h.pqCb
      vecs.valuesIterator.map { v =>
        val cell = coarse.encodeOne(v)(0)
        val base = if (h.residual)
          Array.tabulate(h.dim)(i => h.coarse(cell * h.dim + i))
        else new Array[Double](h.dim)
        val target = Array.tabulate(h.dim)(i => v(i) - base(i))
        val codes = pq.encodeOne(target)
        (0 until h.m).map { s =>
          val cb = (s * h.k + codes(s)) * h.subDim
          (0 until h.subDim).map { t =>
            val d = target(s * h.subDim + t) - h.codebook(cb + t); d * d
          }.sum
        }.sum
      }.sum / vecs.size
    }
    assert(mse(hRes) < mse(hRaw),
      f"residual MSE ${mse(hRes)}%.4f not below raw MSE ${mse(hRaw)}%.4f")
  }

  test("residual build refuses a sample too small to rotate past the coarse seeds") {
    val store = freshStore()
    // sampleCap = numCells + k - 1: the rotation would wrap back into
    // the all-zero coarse-seed residuals and silently collapse the
    // codebook — must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      PqIndex.build(store, "tiny", emb, numCells = 8, m = 8, k = 16,
        iters = 1, residual = true, sampleCap = 8 + 16 - 1)
    }
    assert(e.getMessage.contains("numCells+k"))
    // exactly numCells + k is the minimum and must succeed
    PqIndex.build(store, "min", emb, numCells = 8, m = 8, k = 16,
      iters = 1, residual = true, sampleCap = 8 + 16)
  }

  test("searchBulk is bit-equal to the LUT-collect search, raw and residual modes") {
    val store = freshStore()
    for ((name, residual) <- Seq(("bulkraw", false), ("bulkres", true))) {
      PqIndex.build(store, name, emb, numCells = 8, m = 8, k = 16,
        iters = 2, residual = residual)
      val h = PqIndex.open(store, name)
      val queries = emb.filter($"vec_id" < 64)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
      val collectPath = PqIndex.search(h, queries, k = 5, nprobe = 3)
        .orderBy("query_id", "rank").collect().map(key).toSeq
      val joinPath = PqIndex.searchBulk(h, queries, k = 5, nprobe = 3)
        .orderBy("query_id", "rank").collect().map(key).toSeq
      assert(joinPath == collectPath, s"mode=$name")
    }
  }

  test("searchBulk accepts batches past the 4096-query collect ceiling, no driver collect") {
    val store = freshStore()
    PqIndex.build(store, "big", emb, numCells = 8, m = 8, k = 16, iters = 1)
    val h = PqIndex.open(store, "big")
    // replicate the embeddings into a >4096-query batch with distinct ids
    val n = emb.count()
    val reps = (4096 / n + 2).toInt
    val queries = emb.crossJoin(spark.range(reps).toDF("__rep"))
      .withColumn("vec_id", $"vec_id" + $"__rep" * n)
      .drop("__rep")
    assert(queries.count() > 4096)
    intercept[IllegalArgumentException] {
      PqIndex.search(h, queries, k = 3, nprobe = 2) // collect path refuses
    }
    val out = PqIndex.searchBulk(h, queries, k = 3, nprobe = 2)
    // every query gets k hits (corpus >> k even after self-exclusion)
    val counts = out.groupBy("query_id").count().select("count")
      .distinct().as[Long].collect().toSeq
    assert(counts == Seq(3L), s"per-query result counts: $counts")
    assert(out.count() == queries.count() * 3)
    // replicas of the same vector (different id) score identical lists
    val base = out.filter($"query_id" === 1).select("corpus_id", "rank", "adc")
      .orderBy("rank").collect().toSeq
    val replica = out.filter($"query_id" === n + 1).select("corpus_id", "rank", "adc")
      .orderBy("rank").collect().toSeq
    assert(base.nonEmpty)
    // the replica probes the same cells and scores the same LUT; only
    // self-exclusion differs (id 1 excludes itself, n+1 does not), so
    // compare after dropping corpus ids equal to either query id
    val b = base.filterNot(r => r.getLong(0) == 1 || r.getLong(0) == n + 1).map(r => (r.getLong(0), r.getDouble(2)))
    val rr = replica.filterNot(r => r.getLong(0) == 1 || r.getLong(0) == n + 1).map(r => (r.getLong(0), r.getDouble(2)))
    assert(b.take(2) == rr.take(2), s"replica drift: $b vs $rr")
  }

  test("residual search beats raw-PQ recall at the same code budget") {
    VectorExprs.register(spark)
    val unit = emb.select($"vec_id", VectorExprs.vecUnit($"embedding").as("embedding"))
    val store = freshStore()
    val hRaw = PqIndex.build(store, "raw", unit, numCells = 4, m = 8, k = 16, iters = 3)
    val hRes = PqIndex.build(store, "res", unit, numCells = 4, m = 8, k = 16,
      iters = 3, residual = true)
    val queries = unit.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(unit, queries, 10)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
    def recall(h: PqIndex.Handle): Double = {
      val got = PqIndex.search(h, queries, k = 10, nprobe = 4)
        .select($"query_id", $"corpus_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val (rRaw, rRes) = (recall(hRaw), recall(hRes))
    // nprobe = numCells: both see every candidate, only the code
    // precision differs — residual coding must not lose recall, and on
    // this corpus it measurably gains (~0.1); allow equality for safety
    assert(rRes >= rRaw, f"residual recall $rRes%.2f < raw $rRaw%.2f")
    assert(rRes >= 0.3, f"residual recall $rRes%.2f below pinned floor")
  }

  test("serveStream: streamed query batches equal batch search, replays append nothing") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    PqIndex.build(store, "e", emb, numCells = 8, m = 8, k = 16, iters = 1)
    val h = PqIndex.open(store, "e")
    val qvecs = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = qvecs.partition(_._1 < 5)
    def asTuples(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"corpus_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = PqIndex.serveStream(
      h, mem.toDS().toDF("vec_id", "embedding"), k = 5, nprobe = 4,
      resultTable = "hits", appId = "pq-serve-test")
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = asTuples(store.read("hits"))
    val batch = asTuples(PqIndex.search(h, emb.filter($"vec_id" < 10), 5, 4))
    assert(streamed === batch)
    // ledger-visible replay: commitIfNew skips the body entirely
    val before = store.read("hits").count()
    var ran = false
    store.commitIfNew("hits", "pq-serve-test", 0L) { ran = true }
    assert(!ran && store.read("hits").count() === before)
  }

  test("reranked search recovers exact ordering within the probed candidates") {
    VectorExprs.register(spark)
    val store = freshStore()
    val unit = emb.select($"vec_id", VectorExprs.vecUnit($"embedding").as("embedding"))
    val h = PqIndex.build(store, "e", unit, numCells = 4, m = 16, k = 16, iters = 3)
    val queries = unit.filter($"vec_id" < 5)
    val rr = PqIndex.searchReranked(h, unit, queries, k = 5, nprobe = 4, shortlist = 25)
    val rows = rr.orderBy("query_id", "rank").collect()
    assert(rows.length == 25) // 5 queries × k=5
    // reranked distances are the TRUE L2² — monotone non-decreasing in rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted, s"rerank distances not monotone: $ds")
    }
  }
}
