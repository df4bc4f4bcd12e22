package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[UnicodeNormalize]]: canonical composition/decomposition,
  * compatibility folding, idempotence, non-BMP passthrough, null
  * passthrough, and analysis-time form validation. All non-ASCII is
  * written as \u escapes — composed vs decomposed is the POINT here,
  * and literal glyphs in source are ambiguous to the eye.
  */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteComposed = "\u00e9"   // one code point
  private val eAcuteDecomposed = "e\u0301" // e + combining acute
  private val aRingComposed = "\u00c5"
  private val aRingDecomposed = "A\u030a"

  private def norm(s: String, form: String): String = {
    graft.GraftFunctions.registerAll(spark)
    Seq(s).toDF("t")
      .select(call_function("unicode_normalize", $"t", lit(form)))
      .as[String].head()
  }

  test("NFC composes combining sequences; NFD decomposes them") {
    assert(norm(eAcuteDecomposed, "NFC") == eAcuteComposed)
    assert(norm(aRingDecomposed, "NFC") == aRingComposed)
    assert(norm(eAcuteComposed, "NFD") == eAcuteDecomposed)
    // already-composed text is unchanged (and takes the fast path)
    assert(norm(s"$eAcuteComposed plain ascii", "NFC") ==
      s"$eAcuteComposed plain ascii")
  }

  test("NFKC folds compatibility characters the way LLM pipelines expect") {
    assert(norm("\ufb01le", "NFKC") == "file") // fi ligature
    assert(norm("\u2460", "NFKC") == "1")      // circled one
    assert(norm("\u3000", "NFKC") == " ")      // ideographic space
    // NFC must NOT touch compatibility forms
    assert(norm("\ufb01le", "NFC") == "\ufb01le")
  }

  test("idempotent, null-safe, non-BMP safe") {
    val s = s"caf$eAcuteDecomposed \ud83d\ude00 $aRingDecomposed"
    assert(norm(norm(s, "NFC"), "NFC") == norm(s, "NFC"))
    assert(norm("\ud83d\ude00", "NFC") == "\ud83d\ude00") // emoji untouched
    graft.GraftFunctions.registerAll(spark)
    val out = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(call_function("unicode_normalize", $"t", lit("NFC")))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("dedup convergence: decomposed and composed twins fingerprint equal after NFC") {
    graft.GraftFunctions.registerAll(spark)
    val docs = Seq(
      (1L, s"r${eAcuteComposed}sum$eAcuteComposed text"),
      (2L, s"r${eAcuteDecomposed}sum$eAcuteDecomposed text")
    ).toDF("doc_id", "text")
    val fps = docs.orderBy("doc_id").select(
      md5(call_function("unicode_normalize", $"text", lit("NFC"))).as("fp"))
      .as[String].collect()
    assert(fps(0) == fps(1), "NFC must make the twins byte-identical")
    val raw = docs.orderBy("doc_id").select(md5($"text").as("fp"))
      .as[String].collect()
    assert(raw(0) != raw(1),
      "without NFC the twins are distinct — the bug this op removes")
  }

  test("unknown form fails at analysis time, not per task") {
    graft.GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("unicode_normalize", $"t", lit("NFX"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("nfx") ||
      e.getMessage.toLowerCase.contains("normalization"))
  }

  test("foldable NULL form is a clean type-check failure, not an NPE") {
    graft.GraftFunctions.registerAll(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("unicode_normalize", $"t",
          lit(null).cast("string"))).collect()
    }
    assert(!e.isInstanceOf[NullPointerException])
    assert(e.getMessage.toLowerCase.contains("non-null"))
  }
}
