package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the three fuzzy-string comparators to DuckDB 1.0.0's natives
  * (`jaro_similarity`, `jaro_winkler_similarity`, `damerau_levenshtein`)
  * — the values below are DuckDB's own outputs, captured verbatim. The
  * suite covers the conventions the oracle actually exercises plus the
  * ones it can't reach on ASCII data:
  *  - empty strings score 0.0 (not 1.0), and DL of "" is the other length
  *  - integer (floor) halving of the transposition disagreement count
  *    (the round-4 oracle mismatch: fractional halving shifts odd counts)
  *  - UNRESTRICTED Damerau (ca→abc = 2, where OSA gives 3)
  *  - UTF-8 BYTE iteration: DuckDB compares code units, so a 4-byte
  *    emoji counts as 4 — jaro("x😀","x😁") = 4-of-5 byte matches, and
  *    damerau("😀ab","ab😀") = 4, not the per-character 2
  *  - the 0.7 Winkler boost threshold and the ≤4 common-prefix cap
  */
class FuzzyStringsSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  // (a, b, jaro, jaro_winkler, damerau) — DuckDB 1.0.0 outputs
  private val pinned = Seq(
    ("", "", 0.0, 0.0, 0),
    ("a", "", 0.0, 0.0, 1),
    ("", "b", 0.0, 0.0, 1),
    ("a", "a", 1.0, 1.0, 0),
    ("ab", "ba", 0.0, 0.0, 1),
    ("martha", "marhta", 0.9444444444444445, 0.9611111111111111, 1),
    ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332, 4),
    ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964, 2),
    ("dwayne", "duane", 0.8222222222222223, 0.8400000000000001, 2),
    ("ca", "abc", 0.0, 0.0, 2),
    ("abc", "ca", 0.0, 0.0, 2),
    ("kitten", "sitting", 0.746031746031746, 0.746031746031746, 3),
    ("flaw", "lawn", 0.8333333333333334, 0.8333333333333334, 2),
    ("Customer#000000001", "Customer#000000010", 0.9814814814814815, 0.9888888888888889, 1),
    ("Customer#000013500", "Customer#000013501", 0.9629629629629629, 0.9777777777777777, 1),
    ("jon smith", "john smyth", 0.8962962962962964, 0.9170370370370371, 2),
    ("ACME corp", "ACME  corp", 0.9666666666666667, 0.98, 1),
    ("aaaaab", "baaaaa", 0.888888888888889, 0.888888888888889, 2),
    ("xyxyxyxy", "yxyxyxyx", 0.8333333333333334, 0.8333333333333334, 2),
    ("pneumonoultramicroscopic", "pneumonoultramicroscopy", 0.9577294685990339, 0.9746376811594203, 2),
    ("😀ab", "ab😀", 0.7777777777777777, 0.7777777777777777, 4),
    ("x😀", "x😁", 0.8666666666666667, 0.92, 1),
    ("😀", "😀", 1.0, 1.0, 0),
    ("abcdefgh", "abcdefgh", 1.0, 1.0, 0),
    ("abcdefgh", "hgfedcba", 0.5, 0.5, 7),
    ("supercalifragilistic", "supercalifragilystic", 0.9491228070175438, 0.9694736842105263, 1))

  test("jaro matches DuckDB bit-for-bit on the pinned vectors") {
    for ((a, b, j, _, _) <- pinned) {
      assert(FuzzyStringAlgos.jaro(u(a), u(b)) === j, s"jaro($a, $b)")
      assert(FuzzyStringAlgos.jaro(u(b), u(a)) === j, s"jaro($b, $a) symmetry")
    }
  }

  test("jaro_winkler matches DuckDB bit-for-bit on the pinned vectors") {
    for ((a, b, _, jw, _) <- pinned) {
      assert(FuzzyStringAlgos.jaroWinkler(u(a), u(b)) === jw, s"jw($a, $b)")
      assert(FuzzyStringAlgos.jaroWinkler(u(b), u(a)) === jw, s"jw($b, $a)")
    }
  }

  test("damerau_levenshtein matches DuckDB on the pinned vectors") {
    for ((a, b, _, _, dl) <- pinned) {
      assert(FuzzyStringAlgos.damerauLevenshtein(u(a), u(b)) === dl,
        s"dl($a, $b)")
      assert(FuzzyStringAlgos.damerauLevenshtein(u(b), u(a)) === dl,
        s"dl($b, $a) symmetry")
    }
  }

  test("registered SQL functions evaluate through codegen") {
    FuzzyStrings.register(spark)
    val df = spark.sql(
      "SELECT jaro_sim('martha', 'marhta') AS j, " +
        "jaro_winkler_sim('dixon', 'dicksonx') AS jw, " +
        "damerau_levenshtein('ca', 'abc') AS dl")
    val r = df.head()
    assert(r.getDouble(0) === 0.9444444444444445)
    assert(r.getDouble(1) === 0.8133333333333332)
    assert(r.getInt(2) === 2)
  }
}
