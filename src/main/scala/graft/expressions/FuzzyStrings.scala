package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fuzzy-string-matching expressions: Jaro, Jaro-Winkler, and
  * unrestricted Damerau-Levenshtein.
  *
  * Spark ships `levenshtein` and `soundex` but none of the three
  * similarity measures record-linkage actually standardizes on
  * (Fellegi-Sunter name comparators, dedup blocking verification). A
  * Scala UDF would box both strings and fall out of whole-stage codegen;
  * these are proper Catalyst expressions whose generated code is a
  * single static call into a tight primitive-array routine — the same
  * shape as Spark's own `levenshtein` (a static `UTF8String` method
  * call), so the expression stays inside the WholeStageCodegen span.
  *
  * Semantics are pinned to the DuckDB natives the driver oracle runs
  * (`jaro_similarity`, `jaro_winkler_similarity`,
  * `damerau_levenshtein`), including the quirk that two empty strings
  * score 0.0, not 1.0, and that `damerau_levenshtein` is the
  * UNRESTRICTED variant (transposed blocks may be edited again:
  * ca→abc = 2, where the common OSA restriction gives 3).
  */
object FuzzyStrings {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftFunctions.registerIfAbsent(reg, 
      "jaro_sim", exprs => JaroSimilarity(exprs(0), exprs(1)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "jaro_winkler_sim", exprs => JaroWinklerSimilarity(exprs(0), exprs(1)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "damerau_levenshtein", exprs => DamerauLevenshtein(exprs(0), exprs(1)), "built-in")
  }

  def jaroSim(a: Column, b: Column): Column = call_function("jaro_sim", a, b)
  def jaroWinklerSim(a: Column, b: Column): Column =
    call_function("jaro_winkler_sim", a, b)
  def damerauLevenshtein(a: Column, b: Column): Column =
    call_function("damerau_levenshtein", a, b)
}

/** The algorithms, as static methods over char arrays so both the
  * interpreted `nullSafeEval` and the generated code share one
  * JIT-compiled body.
  */
object FuzzyStringAlgos {

  /** Lengths/comparisons are over UTF-8 BYTES — pinned empirically to
    * DuckDB 1.0.0, whose jaro/jaro_winkler/damerau_levenshtein natives
    * compare UTF-8 code units, not code points (verified: a 4-byte
    * emoji counts as 4 units in all three: jaro("x😀","x😁") = 0.8667 =
    * 4-of-5 byte matches, and damerau("😀ab","ab😀") = 4, not the
    * 2 a per-character walk gives). ASCII is unaffected either way,
    * and byte iteration also skips the String decode entirely.
    */

  /** Jaro similarity. Match window = max(|a|,|b|)/2 - 1 (floor, min 0);
    * empty input on either side scores 0.0 (DuckDB convention).
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatched = new Array[Boolean](n)
    val tMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatched(j) && s(i) == t(j)) {
          sMatched(i) = true; tMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars in order, count position disagreements
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatched(i)) {
        while (!tMatched(k)) k += 1
        if (s(i) != t(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    // DuckDB floors the half-transposition count (integer division), and
    // the oracle pins to DuckDB — fractional halving diverges on odd
    // disagreement counts (~0.0056 per pair on short names).
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - transpositions / 2) / mm) / 3.0
  }

  /** Winkler boost: + l·p·(1-jaro) for common prefix l ≤ 4, p = 0.1,
    * applied only when jaro exceeds the 0.7 boost threshold.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s = a.getBytes
    val t = b.getBytes
    val max = math.min(4, math.min(s.length, t.length))
    var l = 0
    while (l < max && s(l) == t(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein via the Lowrance-Wagner DP with a
    * last-occurrence dictionary. O(n·m) time, O(n·m) space — fine for
    * the name/title-length strings record linkage runs it on.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s = a.getBytes
    val t = b.getBytes
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2) with the -1 sentinel row/col of the L-W scheme
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last-occurrence dictionary over the 256 byte values — a flat array
    val last = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val i1 = last(t(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      last(s(i - 1) & 0xff) = i
      i += 1
    }
    d(n + 1)(m + 1)
  }
}

// No implicit-cast contract (AbstractDataType is private[sql] in Spark
// 4.x, so an ImplicitCastInputTypes mixin can't be declared outside
// that package) — but wrong types must still fail at ANALYSIS, not as
// a codegen compile error + ClassCastException mid-job.

private[expressions] trait StringPairCheck { self: BinaryExpression =>
  def fnName: String
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$fnName expects (STRING, STRING), got (${l.sql}, ${r.sql})")
    }
}

case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with StringPairCheck {
  override def fnName: String = "jaro_sim"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyStringAlgos.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.FuzzyStringAlgos.jaro($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with StringPairCheck {
  override def fnName: String = "jaro_winkler_sim"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyStringAlgos.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.FuzzyStringAlgos.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with StringPairCheck {
  override def fnName: String = "damerau_levenshtein"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzyStringAlgos.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.FuzzyStringAlgos.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
