package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val embs = Tables.load(spark, sf, "embeddings")

  // ------------------------------------------------------ decontamination
  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val training = Seq(
      (1L, "a b c d e f"),   // contains benchmark 3-gram "b c d"
      (2L, "x y z w q r"),   // clean
      (3L, "c d e x y z"),   // contains "c d e"
      (4L, "a b")            // shorter than n: zero n-grams, clean
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, "b c d e")).toDF("doc_id", "text")
    val out = Curation.decontaminate(training, benchmark, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (2L, true))   // "b c d" and "c d e"
    assert(out(2L) == (0L, false))
    assert(out(3L) == (1L, true))   // "c d e"
    assert(out(4L) == (0L, false))
    assert(out.size == 4, "audit output covers every training doc")
  }

  test("decontaminate broadcasts the benchmark n-gram set") {
    val plan = Curation.decontaminate(
      docs.filter($"doc_id" % 17 =!= 3), docs.filter($"doc_id" % 17 === 3),
      "doc_id", "text", n = 8).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast, got:\n$plan")
  }

  // ------------------------------------------------------------ chunking
  test("chunk covers every token, respects overlap, and reassembles the doc") {
    val df = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Curation.chunk(df, "doc_id", "text", chunkSize = 32, overlap = 8)
      .orderBy("chunk_idx").collect()
    // L=100, stride=24: chunks at 0,24,48,72 -> 4 chunks; last = tokens 73..100 (28)
    assert(chunks.length == 4)
    assert(chunks.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(chunks.map(_.getInt(2)).toSeq == Seq(32, 32, 32, 28))
    val toks = chunks.map(_.getString(3).split(" ").toSeq)
    assert(toks(0).head == "t1" && toks(0).last == "t32")
    assert(toks(1).head == "t25", "second chunk starts overlap tokens back")
    assert(toks(3).last == "t100", "last chunk reaches the final token")
    // de-overlapped reassembly reproduces the document exactly
    val reassembled = toks.head ++ toks.tail.flatMap(_.drop(8))
    assert(reassembled == (1 to 100).map(i => s"t$i"))
  }

  test("chunk emits one whole chunk for short docs and none for blank docs") {
    val df = Seq((1L, "a b c"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val chunks = Curation.chunk(df, "doc_id", "text", 32, 8).collect()
    assert(chunks.length == 1)
    assert(chunks.head.getLong(0) == 1L && chunks.head.getInt(2) == 3)
    assert(chunks.head.getString(3) == "a b c")
  }

  test("chunk boundary: L == chunkSize yields 1 chunk, L == chunkSize+1 yields 2") {
    def n(len: Int): Long = Curation.chunk(
      Seq((1L, (1 to len).map("t" + _).mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", 32, 8).count()
    assert(n(32) == 1L)
    assert(n(33) == 2L)
  }

  // ----------------------------------------------------- repetition stats
  test("repetition stats match hand-computed values") {
    val df = Seq(
      (1L, "a a a a b"),          // top a=4/5, bigrams: aa aa aa ab -> 2 distinct of 4
      (2L, "a b c d e f g h i j") // all distinct; top frac 0.1 under the 0.14 default
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 5)
    assert(math.abs(r1.getDouble(2) - 0.8) < 1e-9)        // top_tok_frac
    assert(math.abs(r1.getDouble(3) - 0.5) < 1e-9)        // dup_bigram_frac
    assert(math.abs(r1.getDouble(4) - 0.4) < 1e-9)        // distinct_frac
    assert(r1.getBoolean(5), "heavily repetitive doc is flagged")
    val r2 = out(2L)
    assert(math.abs(r2.getDouble(2) - 0.1) < 1e-9)
    assert(r2.getDouble(3) == 0.0)
    assert(r2.getDouble(4) == 1.0)
    assert(!r2.getBoolean(5))
  }

  test("repetition stats are map-only (no shuffle in the plan)") {
    val plan = Curation.repetitionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetition stats must be a pure scan pass, got:\n$plan")
  }

  // ------------------------------------------------------- semantic dedup
  test("semantic dedup keeps min-id survivor per cosine component, singletons intact") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.01f), 0),   // dup of 1
      (3L, Array(0.0f, 1.0f), 1),      // singleton
      (4L, Array(0.01f, 0.999f), 1)    // dup of 3
    ).toDF("vec_id", "embedding", "label")
    val kept = Curation.semanticDedupExact(vecs, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("cell-bucketed semantic dedup has removal precision 1.0 vs exact (real corpus)") {
    val half = embs.filter($"vec_id" % 2 === 0)
    val all = half.select("vec_id").as[Long].collect().toSet
    val keptExact = Curation.semanticDedupExact(half, 0.45)
      .select("vec_id").as[Long].collect().toSet
    val keptBucketed = Curation.semanticDedupCellBucketed(half, 0.45, numCells = 10)
      .select("vec_id").as[Long].collect().toSet
    val removedExact = all -- keptExact
    val removedBucketed = all -- keptBucketed
    assert(removedExact.nonEmpty, "test corpus must contain semantic dups")
    assert(removedBucketed.subsetOf(removedExact),
      "bucketed pairs are a subset of exact pairs, so every bucketed removal " +
        "must also be an exact removal")
  }

  test("cell-bucketed semantic dedup finds most planted in-cluster dups") {
    // 10 well-separated clusters in 16 dims, 20 members each, plus a
    // near-identical twin for the first 2 members of every cluster; the
    // twins are the semantic dups the bucketing must keep finding.
    val rnd = new scala.util.Random(42)
    def noisy(center: Array[Float], eps: Float): Array[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * eps)
    val centers = Array.tabulate(10) { c =>
      Array.tabulate(16)(d => if (d == c % 16 || d == (c + 7) % 16) 1.0f else 0.05f)
    }
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Int)]()
    var id = 0L
    for (c <- 0 until 10; m <- 0 until 20) {
      val v = noisy(centers(c), 0.3f)
      rows += ((id, v, c)); id += 1
      if (m < 2) { rows += ((id, noisy(v, 0.01f), c)); id += 1 }
    }
    val df = rows.toSeq.toDF("vec_id", "embedding", "label")
    val all = rows.map(_._1).toSet
    val keptExact = Curation.semanticDedupExact(df, 0.995)
      .select("vec_id").as[Long].collect().toSet
    val keptBucketed = Curation.semanticDedupCellBucketed(df, 0.995, numCells = 10)
      .select("vec_id").as[Long].collect().toSet
    val removedExact = all -- keptExact
    val removedBucketed = all -- keptBucketed
    assert(removedExact.size >= 15, s"planted dups not detected: ${removedExact.size}")
    assert(removedBucketed.subsetOf(removedExact), "removal precision must stay 1.0")
    assert(removedBucketed.size * 10 >= removedExact.size * 6,
      s"bucketed recall too low: ${removedBucketed.size}/${removedExact.size}")
  }

  test("boilerplate lines dropped everywhere, docs reassembled in order") {
    import spark.implicits._
    // "cookie banner" appears in 3 docs (>= minDocs 3); unique lines survive
    val docs = Seq(
      (1L, "cookie banner\nreal content one\nmore one"),
      (2L, "cookie banner\nreal content two"),
      (3L, "intro three\ncookie banner\noutro three"),
      (4L, "only unique content")
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_lines_kept", "n_lines_dropped")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "real content one\nmore one", 2L, 1L),
      (2L, "real content two", 1L, 1L),
      (3L, "intro three\noutro three", 2L, 1L),
      (4L, "only unique content", 1L, 0L)))
  }

  test("boilerplate: all-boilerplate and null-text docs yield empty text") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("spam\nspam")), // both lines boilerplate ("spam" in 3 docs)
      (2L, Some("spam\nkeep me")),
      (3L, Some("spam")),
      (4L, None)
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "text", "n_lines_kept")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "", 0L), (2L, "keep me", 1L), (3L, "", 0L), (4L, "", 0L)))
  }

  test("boilerplate count is per distinct doc, not per occurrence") {
    import spark.implicits._
    // "dup" appears twice in ONE doc — only 1 distinct doc, below minDocs 2
    val docs = Seq(
      (1L, "dup\ndup\nunique"),
      (2L, "other")
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
      .filter($"doc_id" === 1L)
      .select("text").as[String].head()
    assert(out === "dup\ndup\nunique")
  }

  // ---------------------------------------------------- duplicated spans
  test("duplicatedSpans flags exactly the cross-document windows") {
    // docs 1 and 2 share the 4-token run "p q r s" (one 4-gram); doc 3 is
    // disjoint; doc 4 is shorter than n and must report zero spans.
    val d = Seq(
      (1L, "a b p q r s c d"),   // 5 spans, 1 duplicated (p q r s)
      (2L, "p q r s x y z"),     // 4 spans, 1 duplicated
      (3L, "m n o t u v w"),     // 4 spans, 0 duplicated
      (4L, "a b c")              // < n tokens: 0 spans
    ).toDF("doc_id", "text")
    val out = Curation.duplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(1L) == (5L, 1L, Some(0.2)))
    assert(out(2L) == (4L, 1L, Some(0.25)))
    assert(out(3L) == (4L, 0L, Some(0.0)))
    assert(out(4L) == (0L, 0L, None))
  }

  test("duplicatedSpans: repeats WITHIN one doc don't count without a second doc") {
    val d = Seq(
      (1L, "a b c d a b c d"),  // "a b c d" twice, but only in doc 1
      (2L, "e f g h i")
    ).toDF("doc_id", "text")
    val out = Curation.duplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 0L)
  }

  test("duplicatedSpans is case-insensitive and layout-invariant") {
    val d = Seq(
      (1L, "The Quick Brown Fox jumps"),
      (2L, "the quick brown fox sleeps")
    ).toDF("doc_id", "text")
    val a = Curation.duplicatedSpans(d, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.duplicatedSpans(d.repartition(13), "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(2)) == Seq(1L, 1L)) // "the quick brown fox"
  }

  // ------------------------------------------ duplicated-span removal
  test("removeDuplicatedSpans cuts the shared window and keeps the rest") {
    val d = Seq(
      (1L, "a b p q r s c d"),   // "p q r s" shared with doc 2 → cut
      (2L, "p q r s x y z"),
      (3L, "m n o t u v w")      // untouched
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ("a b c d", 8, 4))
    assert(out(2L) == ("x y z", 7, 4))
    assert(out(3L) == ("m n o t u v w", 7, 0))
  }

  test("removeDuplicatedSpans merges OVERLAPPING duplicated windows into one span") {
    // docs 1 and 2 share the 5-token run "p q r s t": two overlapping
    // 4-grams ("p q r s", "q r s t") whose covered positions must merge
    // to ONE maximal 5-token cut, not 8 tokens.
    val d = Seq(
      (1L, "a p q r s t b"),
      (2L, "p q r s t z w")
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(3))).toMap
    assert(out(1L) == (("a b", 5)))
    assert(out(2L) == (("z w", 5)))
  }

  test("removeDuplicatedSpans matches case-insensitively, rebuilds original case") {
    val d = Seq(
      (1L, "KEEP The Quick Brown Fox END"),
      (2L, "the quick brown fox sleeps")
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "KEEP END")      // original case survives around the cut
    assert(out(2L) == "sleeps")
  }

  test("removeDuplicatedSpans: clean corpus is whitespace-normalized identity") {
    val d = Seq(
      (1L, "  alpha   beta\tgamma  "),
      (2L, "delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(3))).toMap
    assert(out(1L) == (("alpha beta gamma", 0)))
    assert(out(2L) == (("delta epsilon zeta eta", 0)))
  }

  test("removeDuplicatedSpans keepFirst: exactly one copy of the span survives") {
    val d = Seq(
      (1L, "a b p q r s c d"),   // first occurrence of "p q r s" → kept
      (2L, "p q r s x y z"),     // later occurrence → cut
      (3L, "w p q r s v e f")    // later occurrence → cut
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text",
        n = 4, keepFirst = true)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(3))).toMap
    assert(out(1L) == (("a b p q r s c d", 0)))  // survivor untouched
    assert(out(2L) == (("x y z", 4)))
    assert(out(3L) == (("w v e f", 4)))
    // default mode cuts ALL occurrences including the first
    val all = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "a b c d")
  }

  test("removeDuplicatedSpans keepFirst: winner chosen by (doc, pos) order within one doc too") {
    // the duplicated window appears twice in doc 1; only position 1 wins
    val d = Seq(
      (1L, "p q r s m p q r s"),
      (2L, "z p q r s w")
    ).toDF("doc_id", "text")
    val out = Curation.removeDuplicatedSpans(d, "doc_id", "text",
        n = 4, keepFirst = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "p q r s m")  // first occurrence kept, second cut
    assert(out(2L) == "z w")
  }

  test("removeDuplicatedSpans is partitioning-invariant") {
    val d = Seq(
      (1L, "a b p q r s c d"),
      (2L, "p q r s x y z"),
      (3L, "m n o t u v w")
    ).toDF("doc_id", "text")
    val a = Curation.removeDuplicatedSpans(d, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.removeDuplicatedSpans(d.repartition(13), "doc_id", "text", n = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
