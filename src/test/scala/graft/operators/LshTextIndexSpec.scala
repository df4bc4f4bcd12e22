package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class LshTextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")

  private def freshStore(): TableStore = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-lshspec-").toString)

  private def pairs(df: org.apache.spark.sql.DataFrame) = df
    .select($"new_id", $"indexed_id", round($"jaccard", 9))
    .as[(Long, Long, Double)].collect().sortBy(t => (t._1, t._2)).toSeq

  test("probe equals the cross-slice pairs of a joint minHashNearDups run") {
    val a = docs.filter($"doc_id" % 5 === 0)
    val b = docs.filter($"doc_id" % 5 === 1)
    val store = freshStore()
    LshTextIndex.build(store, "c", a, numHashes = 32, bands = 16)
    val probed = pairs(LshTextIndex.probe(LshTextIndex.open(store, "c"), b,
      threshold = 0.9, estMargin = 0.35))
    // ground truth: run the in-memory pipeline over the UNION and keep
    // only (batch, indexed) cross pairs, in probe's column orientation
    val joint = Dedup.minHashNearDups(a.unionByName(b), "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.9, estMargin = 0.35)
    val cross = joint.filter(($"id1" % 5 === 1) =!= ($"id2" % 5 === 1))
      .select(
        when($"id1" % 5 === 1, $"id1").otherwise($"id2").as("new_id"),
        when($"id1" % 5 === 1, $"id2").otherwise($"id1").as("indexed_id"),
        $"jaccard")
    assert(probed === pairs(cross))
    assert(probed.nonEmpty) // the slice actually holds near-dups
  }

  test("append folds a batch in; the next probe sees it; duplicate ids refuse") {
    val a = docs.filter($"doc_id" % 5 === 0)
    val b = docs.filter($"doc_id" % 5 === 1)
    val c = docs.filter($"doc_id" % 5 === 2)
    val store = freshStore()
    val h = LshTextIndex.build(store, "c", a, numHashes = 32, bands = 16)
    LshTextIndex.append(h, b)
    val probed = LshTextIndex.probe(LshTextIndex.open(store, "c"), c,
      threshold = 0.9, estMargin = 0.35)
    // after the append, probes match against BOTH slices
    val matchedSlices = probed
      .select(($"indexed_id" % 5).cast("int")).distinct()
      .as[Int].collect().toSet
    assert(matchedSlices === Set(0, 1), s"got $matchedSlices")
    val e = intercept[IllegalArgumentException](LshTextIndex.append(h, b))
    assert(e.getMessage.contains("duplicate"))
  }

  test("a partial (crashed) append is invisible to probes and retryable without duplicates") {
    val a = docs.filter($"doc_id" % 5 === 0)
    val b = docs.filter($"doc_id" % 5 === 1)
    val store = freshStore()
    val h = LshTextIndex.build(store, "c", a, numHashes = 32, bands = 16)
    // simulate a crash after the FIRST table swap of append: buckets
    // updated, sigs/toks not (the write order append() documents)
    val sigsB = Dedup.signatureFromUnits(
      b.select($"doc_id", org.apache.spark.sql.functions.array_sort(
        graft.functions.TextFunctions.distinctTokens(org.apache.spark.sql.functions.lower($"text"))).as("toks")), 32)
    store.overwrite(h.bucketsTable,
      h.buckets.unionByName(Dedup.bandBuckets(sigsB, 32, 16)))
    // half-appended batch: probes of slice c still behave as if b were absent
    val c = docs.filter($"doc_id" % 5 === 2)
    val before = LshTextIndex.probe(h, c, threshold = 0.9, estMargin = 0.35)
    assert(before.filter(($"indexed_id" % 5) === 1).count() === 0)
    // retry lands cleanly: no duplicate bucket rows, probe sees slice b
    LshTextIndex.append(h, b)
    val dupBuckets = h.buckets.groupBy("doc_id", "band_idx", "band_hash")
      .count().filter($"count" > 1)
    assert(dupBuckets.count() === 0, "retry duplicated bucket rows")
    val after = LshTextIndex.probe(h, c, threshold = 0.9, estMargin = 0.35)
    assert(after.filter(($"indexed_id" % 5) === 1).count() > 0)
  }

  test("open restores the tuning from meta; mismatched banding cannot happen silently") {
    val store = freshStore()
    LshTextIndex.build(store, "c", docs.limit(50), numHashes = 16, bands = 8)
    val h = LshTextIndex.open(store, "c")
    assert(h.numHashes === 16 && h.bands === 8)
    intercept[Exception](LshTextIndex.open(store, "missing"))
  }
}
