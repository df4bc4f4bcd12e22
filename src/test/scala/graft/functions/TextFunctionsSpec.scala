package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counting: whitespace and BPE-ish") {
    val r = Seq("the quick brown fox", "hello, world! a.b", "", "   ", null: String)
      .toDF("t")
      .select(tokenCount($"t").as("n"), bpeIshTokenCount($"t").as("b"))
      .collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(4, 3, 0, 0, 0))
    // "hello, world! a.b" -> hello , world ! a . b = 7
    assert(r(1).getInt(1) == 7)
  }

  test("lang id picks the language with most marker hits, und when none") {
    val r = Seq(
      "the cat and the dog is in that house with it",
      "el perro de la casa que los gatos por una con",
      "der hund ist nicht mit das und ein für auf",
      "xyzzy plugh qwerty")
      .toDF("t").select(langId($"t").as("l")).as[String].collect().toSeq
    assert(r == Seq("en", "es", "de", "und"))
  }

  test("quality components bounded and sane") {
    val r = Seq("The quick brown fox jumps over the lazy dog.", "!!! ??? ...")
      .toDF("t")
      .select(
        alphaRatio($"t").as("a"),
        punctRatio($"t").as("p"),
        stopwordRatio($"t").as("s"),
        meanTokenLength($"t").as("m"),
        qualityScore($"t").as("q"))
      .collect()
    val prose = r(0)
    val junk = r(1)
    assert(prose.getDouble(0) > 0.7 && junk.getDouble(0) == 0.0)
    assert(junk.getDouble(1) > 0.7 && prose.getDouble(1) < 0.1)
    assert(prose.getDouble(4) > junk.getDouble(4))
    r.foreach { row =>
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    }
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val r = Seq("Hello   World", "hello world", "hello  world!", "hello world")
      .toDF("t").select(fingerprint($"t").as("f")).as[String].collect()
    assert(r(0) == r(1) && r(1) == r(3))
    assert(r(2) != r(0))
  }

  test("redact masks emails and long digit runs, leaves short numbers and prose") {
    import spark.implicits._
    val r = Seq(
      "mail me at jane.doe+x@corp.example.org or call 5551234567",
      "order 12345 shipped in 2024",   // short digits stay
      "two ids 11223344 and 99887766")
      .toDF("t")
      .select(redact($"t").as("r"), redactionCount($"t").as("n"))
      .collect()
    assert(r(0).getString(0) == "mail me at <EMAIL> or call <NUM>")
    assert(r(0).getInt(1) == 2)
    assert(r(1).getString(0) == "order 12345 shipped in 2024")
    assert(r(1).getInt(1) == 0)
    assert(r(2).getString(0) == "two ids <NUM> and <NUM>")
  }

  test("shingles produce distinct n-grams") {
    val r = Seq("abcde").toDF("t")
      .select(shingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(r == Seq("abc", "bcd", "cde"))
  }

  test("wordNgrams: native kernel equals the composable transform/slice form") {
    // the form wordNgrams used before the native WordNgrams expression
    def composable(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(trim(lower(text)), "\\s+")
      when(size(toks) >= n,
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    val docs = (Seq("the quick brown fox", "one", "", "  spaced   out  text ",
      null: String, "a b c d e f g") ++
      (1 to 50).map(i => s"doc $i word salad with reuse the quick the quick"))
      .toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = docs.select(wordNgrams($"t", n).as("g")).as[Seq[String]].collect().toSeq
      val composed = docs.select(composable($"t", n).as("g")).as[Seq[String]].collect().toSeq
      assert(native === composed, s"n=$n")
    }
    // null text -> empty array, matching the old when/otherwise guard
    assert(Seq(null: String).toDF("t")
      .select(wordNgrams($"t", 2).as("g")).as[Seq[String]].head() === Seq.empty)
  }

  test("tabs/newlines at document edges produce no phantom empty tokens") {
    // Spark trim strips only spaces and split keeps edge empties —
    // "hello\n" used to tokenize as ["hello", ""]
    val df = Seq("hello\n", "\tworld here", "\n", "a b\r\n").toDF("t")
      .select($"t", tokenCount($"t").as("n"), tokens($"t").as("toks"))
    val got = df.select($"t", $"n", $"toks").as[(String, Int, Seq[String])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("hello\n") === ((1, Seq("hello"))))
    assert(got("\tworld here") === ((2, Seq("world", "here"))))
    assert(got("\n")._1 === 0)
    assert(got("a b\r\n") === ((2, Seq("a", "b"))))
  }

  test("fingerprint: a doc and its newline-terminated twin dedup to the same key") {
    val fps = Seq("hello world", "hello world\n", "\thello   world ")
      .toDF("t").select(fingerprint($"t")).as[String].collect()
    assert(fps.distinct.length === 1)
    assert(Seq("hello world", "hello words").toDF("t")
      .select(fingerprint($"t")).as[String].collect().distinct.length === 2)
  }

  test("shingles: null, whitespace-only, and shorter-than-n docs yield EMPTY") {
    val df = Seq(Some("abcd"), Some("ab"), Some("   "), None).toDF("t")
      .select($"t", shingles($"t", 3).as("s"))
    val got = df.as[(Option[String], Seq[String])].collect().toMap
    assert(got(Some("abcd")) === Seq("abc", "bcd"))
    assert(got(Some("ab")) === Seq.empty)   // no truncated shingle
    assert(got(Some("   ")) === Seq.empty)  // no [" "] flood unit
    assert(got(None) === Seq.empty)         // no [null] flood unit
  }

  test("empty and null documents score quality 0, below any real content") {
    val scores = Seq(Some(""), None, Some("   \n"), Some("!!!???"), Some("7"))
      .toDF("t").select(qualityScore($"t")).as[Double].collect()
    assert(scores(0) === 0.0 && scores(1) === 0.0 && scores(2) === 0.0)
    // even pure punctuation/digit docs (no alpha, no stopwords) are
    // nonzero via the length term — strictly above empties
    assert(scores(3) > 0.0 && scores(4) > 0.0)
  }

  test("meanTokenLength: array_join form equals the per-token sum") {
    val df = Seq("a bb ccc", "single", "x\ty zz\n").toDF("t")
    val got = df.select(meanTokenLength($"t")).as[Double].collect()
    assert(got(0) === 2.0)
    assert(got(1) === 6.0)
    assert(got(2) === (1 + 1 + 2) / 3.0)
  }
}
