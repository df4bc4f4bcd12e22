package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.operators.Dedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus with genuine near-dup structure: template families whose
    * members differ by one token, plus unique filler docs.
    */
  private def corpus: Seq[(Long, String)] = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val families = (0 until 8).map { f =>
      val base = (0 until 9).map(i => words((f + i) % words.size)).mkString(" ")
      (0 until 3).map(v => s"$base family$f variant$v")
    }
    val fam = families.flatten.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val filler = (100L until 130L).map(i =>
      (i, s"unique document $i with ${words((i % 12).toInt)} content " +
        s"number${i * 7} number${i * 13} number${i * 29}"))
    fam ++ filler
  }

  private def runStream(
      batches: Seq[Seq[(Long, String)]], threshold: Double,
      numHashes: Int = 32, bands: Int = 16): Seq[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs the multi-column-family RocksDB provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val pairs = StreamingDedup.nearDupPairs(
        mem.toDS().toDF("doc_id", "text"),
        numHashes = numHashes, bands = bands, threshold = threshold)
      val name = s"sdedup${System.nanoTime()}"
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Double)].collect().toSeq
      } finally q.stop()
    } finally before.fold(spark.conf.unset(providerKey))(
      spark.conf.set(providerKey, _))
  }

  test("streamed pairs equal the batch minHashNearDups pairs (3 micro-batches)") {
    val docs = corpus
    val batch = Dedup.minHashNearDups(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSeq
    assert(batch.nonEmpty, "test corpus must contain near-dups")
    // split so family members land in DIFFERENT micro-batches
    val slices = docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val streamed = runStream(slices, threshold = 0.6)
    assert(streamed.map(p => (p._1, p._2)).distinct.size === streamed.size,
      "a pair was emitted more than once")
    assert(streamed.map(p => (p._1, p._2)).sorted ===
      batch.map(p => (p._1, p._2)).sorted)
    // jaccard values agree too
    val bj = batch.map(p => (p._1, p._2) -> p._3).toMap
    streamed.foreach { p =>
      assert(math.abs(bj((p._1, p._2)) - p._3) < 1e-12)
    }
  }

  test("identical docs (sharing every band) still emit exactly one pair") {
    val docs = Seq(
      (1L, "the exact same sentence about dedup"),
      (2L, "the exact same sentence about dedup"),
      (3L, "completely different filler text entirely"))
    val streamed = runStream(Seq(docs), threshold = 0.9)
    assert(streamed.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(streamed.head._3 === 1.0)
  }

  test("replayed doc ids neither re-pair nor double-emit") {
    val d1 = Seq((1L, "shared tokens one two three four five"))
    val d2 = Seq(
      (1L, "shared tokens one two three four five"), // replay of doc 1
      (2L, "shared tokens one two three four five six"))
    val streamed = runStream(Seq(d1, d2), threshold = 0.5)
    assert(streamed.map(p => (p._1, p._2)) === Seq((1L, 2L)))
  }

  test("within-batch and cross-batch pairs are both found") {
    val b1 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta common"),
      (11L, "alpha beta gamma delta epsilon zeta commonx"))
    val b2 = Seq(
      (12L, "alpha beta gamma delta epsilon zeta commony"))
    val streamed = runStream(Seq(b1, b2), threshold = 0.5)
    assert(streamed.map(p => (p._1, p._2)).sorted ===
      Seq((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("empty and whitespace-only docs are excluded from every bucket") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, ""), (4L, "real content here"))
    val streamed = runStream(Seq(docs), threshold = 0.1)
    assert(streamed.isEmpty)
  }
}
