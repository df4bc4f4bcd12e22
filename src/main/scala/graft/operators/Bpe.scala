package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BpeEncode
import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING, distributed — the "fit" half
  * of the tokenizer whose "transform" half is
  * [[graft.expressions.BpeEncode]].
  *
  * Scale shape: the corpus is scanned ONCE to build the word-frequency
  * table (one groupBy on the word — the only corpus-sized shuffle).
  * Every merge iteration after that runs over the VOCABULARY (distinct
  * words + counts), which is corpus-small and independent of corpus
  * size: 100 TB of text and 100 MB of text have vocabularies within an
  * order of magnitude, so the iterative part costs the same at any
  * scale. Each iteration is one explode + one aggregate over the vocab
  * plus a single-row argmax collect — the textbook Sennrich et al. BPE
  * algorithm with the word-level counting factored out, which is
  * exactly how production tokenizer trainers make BPE tractable.
  *
  * Per-iteration the symbol arrays are rewritten with a pure
  * `aggregate()` lambda (left-to-right non-overlapping merge — no UDF)
  * and re-checkpointed so the plan stays flat across iterations.
  */
object Bpe {

  /** Adjacent symbol pairs of `syms` as "a b" strings (empty below 2
    * symbols — guarded so `sequence()` never sees start > stop).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** One exhaustive left-to-right merge of adjacent (a, b) → "ab". */
  private def mergeAdjacent(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) >= 1 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges from the corpus. Merges are returned in
    * rank order (apply order). Deterministic: pair-count ties break on
    * the pair string, so training is layout- and partitioning-invariant.
    */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    // corpus → vocabulary: the one corpus-sized pass
    var vocab = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // split(w, "") keeps a trailing "" with Spark's limit=-1 semantics;
      // drop it or it becomes a phantom symbol in every word
      .select(array_remove(split(col("w"), ""), "").as("syms"), col("cnt"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = vocab
        .select(explode(adjacentPairs(col("syms"))).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("n"))
        .filter(col("n") >= minPairCount)
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val parts = top(0).getString(0).split(' ')
        val (a, b) = (parts(0), parts(1))
        merges += ((a, b))
        vocab = vocab
          .select(mergeAdjacent(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(true)
        i += 1
      }
    }
    merges.result()
  }

  /** Tokenize `text` with trained merges (see [[BpeEncode]]). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    BpeEncode.encode(text, merges)
}
