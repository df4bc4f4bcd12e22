package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Regression pins for the review fixes in Retrieval.bm25 and
  * BloomPrune.prune.
  */
class RetrievalBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: empty corpus returns empty scores; blank docs carry dl 0") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Retrieval.bm25(empty, "doc_id", "text", Seq("term")).count() === 0L)
    // blank docs carry dl = 0 (not the phantom token's 1): closed-form
    // check with one real doc + one blank — avgdl must be 1.5, not 2.0
    val rows = Seq((1L, "alpha beta gamma"), (10L, ""))
    val got = Retrieval.bm25(rows.toDF("doc_id", "text"), "doc_id", "text",
        Seq("alpha"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val idf = math.log((2.0 - 1 + 0.5) / (1 + 0.5) + 1)
    val k1 = 1.2; val b = 0.75
    val expected = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 3.0 / 1.5))
    assert(math.abs(got(1L) - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6,
      s"got ${got(1L)}, expected ~$expected (phantom-dl avgdl would differ)")
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25(rows.toDF("doc_id", "text"), "doc_id", "text", Seq.empty))
    assert(e.getMessage.contains("query term"))
  }

  test("bloom prune keeps its no-false-negative contract for STRING keys") {
    val fact = Seq(("CUST-1", 10.0), ("CUST-2", 20.0), ("CUST-9", 90.0))
      .toDF("k", "v")
    val dim = Seq("CUST-1", "CUST-9").toDF("k")
    // the old cast("long") nulled every string key and dropped ALL rows
    val kept = BloomPrune.prune(fact, "k", dim, "k")
      .select("k").as[String].collect().toSet
    assert(Set("CUST-1", "CUST-9").subsetOf(kept),
      s"bloom pruned away true matches: $kept")
    val joined = BloomPrune.prune(fact, "k", dim, "k").join(dim, Seq("k"))
    assert(joined.count() === fact.join(dim, Seq("k")).count())
  }

  test("bloom prune refuses cross-class key types (mixed encodings drop matches)") {
    // string dim key vs integral fact key: dim would build with
    // xxhash64("5") while the fact probes with cast(5L) — silently
    // dropping nearly every matching row; must refuse loudly instead
    val fact = Seq((1L, 10.0), (5L, 50.0)).toDF("k", "v")
    val dimStr = Seq("1", "5").toDF("k")
    val e = intercept[IllegalArgumentException](
      BloomPrune.prune(fact, "k", dimStr, "k"))
    assert(e.getMessage.contains("key types"))
    // mixed integral widths are fine: cast(long) is value-preserving
    val dimInt = Seq(1, 5).toDF("k")
    assert(BloomPrune.prune(fact, "k", dimInt, "k").count() === 2)
    // same non-integral type on both sides stays supported (hash both)
    val factStr = Seq(("1", 1.0), ("7", 7.0)).toDF("k", "v")
    assert(BloomPrune.prune(factStr, "k", dimStr, "k")
      .select("k").as[String].collect().toSet.contains("1"))
  }

  // ---------------------------------------------- feature hashing
  test("hashedFeatures: signed counts, dense layout, blank docs zero") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "ALPHA beta"),    // case-folds to doc-1 tokens
      (3L, "   "),           // whitespace-only → zero vector
      (4L, "gamma")
    ).toDF("doc_id", "text")
    val out = Retrieval.hashedFeatures(docs, "doc_id", "text", dim = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getInt(2), r.getLong(3))).toMap
    // every vector is dense with exactly dim entries
    assert(out.values.forall(_._1.length == 16))
    // blank doc: all-zero vector, nnz 0, l1 0
    assert(out(3L)._1.forall(_ == 0L) && out(3L)._2 == 0 && out(3L)._3 == 0L)
    // same tokens → same buckets: doc 2's vector is doc 1's minus one alpha
    def bucket(tok: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 8), 16) % 16).toInt
    }
    def sign(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
    }
    assert(out(1L)._1(bucket("alpha")) == 2 * sign("alpha") +
      (if (bucket("beta") == bucket("alpha")) sign("beta") else 0L))
    assert(out(4L)._1(bucket("gamma")) == sign("gamma"))
    assert(out(4L)._2 == 1 && out(4L)._3 == 1L)
  }

  test("hashedFeatures is partitioning-invariant and dimension-bounded") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val a = Retrieval.hashedFeatures(docs, "doc_id", "text", 32)
      .orderBy("doc_id").collect().toSeq
    val b = Retrieval.hashedFeatures(docs.repartition(7), "doc_id", "text", 32)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.forall(_.getSeq[Long](1).length == 32))
    intercept[IllegalArgumentException] {
      Retrieval.hashedFeatures(docs, "doc_id", "text", 0)
    }
  }
}
