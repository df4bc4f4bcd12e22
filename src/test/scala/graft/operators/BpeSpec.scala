package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.BpeEncode

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the classic merges on a hand corpus") {
    // "aaab" x3 + "aab": pair (a,a) dominates, then (aa,a) vs (aa,b)...
    // hand-trace: counts — words: aaab:3 aab:1
    //   iter1 pairs: (a,a): 3*2+1 = 7, (a,b): 3+1 = 4 → merge (a,a)
    //   iter2 words: [aa,a,b]x3, [aa,b]: pairs (aa,a):3 (a,b):3 (aa,b):1
    //     → tie 3 vs 3, lexicographic "a b" < "aa a" → merge (a,b)
    //   iter3 words: [aa,ab]x3, [aa,b]: pairs (aa,ab):3 (aa,b):1 → (aa,ab)
    val docs = Seq("aaab aaab", "aaab aab").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 3, minPairCount = 1)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("encodeWord applies merges greedily by rank") {
    val rank = Map(("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2)
    assert(BpeEncode.encodeWord(rank, "aaab").toSeq === Seq("aaab"))
    assert(BpeEncode.encodeWord(rank, "aab").toSeq === Seq("aa", "b"))
    assert(BpeEncode.encodeWord(rank, "ab").toSeq === Seq("ab"))
    assert(BpeEncode.encodeWord(rank, "ba").toSeq === Seq("b", "a"))
    assert(BpeEncode.encodeWord(rank, "").toSeq === Seq.empty)
    // rank order matters: (a,a) merges before (a,b) even when (a,b)
    // appears first in the word
    assert(BpeEncode.encodeWord(rank, "abaa").toSeq === Seq("ab", "aa"))
  }

  test("expression encodes a column and reconstruction is lossless") {
    val docs = Seq("aaab aab", "ab ba", "", "aaab").toDF("text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    BpeEncode.register(spark)
    val out = docs.select(
      col("text"),
      Bpe.encode(col("text"), merges).as("toks"))
    // concatenating tokens per word reconstructs the original words
    val rebuilt = out.select(
      regexp_replace(col("text"), "\\s+", "").as("orig"),
      array_join(col("toks"), "").as("joined"))
    assert(rebuilt.filter(trim(col("orig")) =!= col("joined")).count() === 0)
    // spot-check the tokenization
    val toks = out.filter(col("text") === "aaab aab")
      .select("toks").as[Seq[String]].head()
    assert(toks === Seq("aaab", "aa", "b"))
  }

  test("batched training equals the sequential merge list, merge for merge") {
    // real text (gate corpus slice): shared symbols force early batch
    // stops, created-pair bounds gate the rest — the prefix-only
    // acceptance must still reproduce sequential output exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sequential = Bpe.train(docs, "text", numMerges = 30, batchSize = 1)
    val batched = Bpe.train(docs, "text", numMerges = 30, batchSize = 16)
    assert(sequential.size === 30)
    assert(batched === sequential)
    // and on the adversarial hand corpus where every pair interacts
    val hand = Seq("aaab aaab", "aaab aab").toDF("text")
    assert(Bpe.train(hand, "text", 3, minPairCount = 1, batchSize = 8) ===
      Bpe.train(hand, "text", 3, minPairCount = 1, batchSize = 1))
  }

  test("train is deterministic across layouts") {
    val docs = (1 to 50).map(i => s"spark scan spark merge batch b$i").toDF("text")
    val m1 = Bpe.train(docs.repartition(2), "text", 5)
    val m2 = Bpe.train(docs.repartition(11), "text", 5)
    assert(m1 === m2)
  }

  test("null and whitespace-only text encode to empty arrays") {
    BpeEncode.register(spark)
    val docs = Seq(Some("   "), None, Some("ab")).toDF("text")
    val n = docs.select(Bpe.encode(col("text"), Seq(("a", "b"))).as("toks"))
      .select(coalesce(size(col("toks")), lit(-1)).as("n"))
      .as[Int].collect().toSeq
    assert(n === Seq(0, -1, 1)) // null text → null array (size -1)
  }

  test("encode normalizes like train: capitalized text merges identically") {
    val docs = Seq.fill(20)("the cat sat on the mat").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val toks = Seq("The Cat", "the cat").toDF("t")
      .select(Bpe.encode(col("t"), merges).as("toks"))
      .as[Seq[String]].collect()
    assert(toks(0) === toks(1), "fit/transform normalization asymmetry")
  }

  test("train refuses batchSize < 1 instead of looping forever") {
    val docs = Seq("aa bb").toDF("text")
    val e = intercept[IllegalArgumentException](
      Bpe.train(docs, "text", numMerges = 2, batchSize = 0))
    assert(e.getMessage.contains("batchSize"))
  }
}
