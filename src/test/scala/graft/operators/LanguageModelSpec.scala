package graft.operators

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM: hand-computed smoothed score, short docs score NULL") {
    // corpus: "a b a b" and "a b c". Bigrams: (a,b)x3, (b,a)x1, (b,c)x1.
    // c(a)=3, c(b)=2; vocab = {a, b, c, solo} -> V=4: the blank doc's
    // phantom "" token is EXCLUDED from the vocabulary (it is a split
    // artifact, not a word — the oracle filters it identically).
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val got = LanguageModel.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    def p(c: Long, cw: Long) = math.log((c + 1.0) / (cw + 4.0))
    // doc 1: ln P(b|a)*2 + ln P(a|b), with P(b|a)=(3+1)/(3+5), P(a|b)=(1+1)/(2+5)
    val d1 = (p(3, 3) * 2 + p(1, 2)) / 3
    val d2 = (p(3, 3) + p(1, 2)) / 2 // ln P(b|a) + ln P(c|b); P(c|b)=(1+1)/(2+5)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2.get - d1) < 1.1e-6)
    assert(math.abs(got(2L)._2.get - d2) < 1.1e-6)
    // one token / blank: no bigrams, NULL score
    assert(got(3L) == ((0L, None)))
    assert(got(4L) == ((0L, None)))
  }

  test("repetitive gibberish scores above fluent-but-rare, rare words score lowest") {
    // in-corpus likelihood: a doc made of the corpus's dominant bigram
    // scores higher than one of hapax bigrams
    val common = (1 to 50).map(i => (i.toLong, "the cat sat on the mat"))
    val rare = Seq((100L, "zx qv wk jn px"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val scores = LanguageModel.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(100L))
  }
}
