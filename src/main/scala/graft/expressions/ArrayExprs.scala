package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native set-arithmetic over SORTED string arrays.
  *
  * Why custom: `size(array_intersect(a, b))` — the inner loop of every
  * exact-jaccard verification join — builds a hash set AND materializes
  * the intersection array per pair, only for `size` to throw the
  * elements away. On a dedup verify stage the pair stream is millions of
  * rows deep, so the per-pair allocation is the stage. With both inputs
  * sorted (one `array_sort` per DOCUMENT at tokenize time, amortized
  * over every pair the doc appears in), the intersection SIZE is a
  * two-pointer merge: zero allocation, straight-line codegen.
  */
object ArrayExprs {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftFunctions.registerIfAbsent(reg, 
      "sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "word_ngrams",
      exprs => WordNgrams(exprs(0), ArrayExprs.extractN(exprs(1))), "built-in")
  }

  /** n must be a foldable int literal (the window size shapes codegen). */
  private[graft] def extractN(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"word_ngrams n must be an int literal, got ${e.sql}")
    e.eval().asInstanceOf[Int]
  }

  /** Count of common elements of two string arrays that are each
    * DISTINCT and SORTED ascending (Spark's `array_sort` order —
    * UTF8String binary order, nulls last). Callers own the
    * precondition; [[graft.operators.Dedup]] sorts once per document.
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)
}

/** Two-pointer intersection count over sorted-distinct `array<string>`
  * inputs. Null ELEMENTS (sorted last by array_sort) terminate the
  * merge — a null token never matches anything. Null ARRAYS are null.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects (array<string>, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val ra = b.asInstanceOf[ArrayData]
    val (n, m) = (la.numElements(), ra.numElements())
    var i = 0
    var j = 0
    var count = 0
    while (i < n && j < m && !la.isNullAt(i) && !ra.isNullAt(j)) {
      val c = la.getUTF8String(i).compareTo(ra.getUTF8String(j))
      if (c == 0) { count += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n && $j < $m && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $cnt++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Sliding word n-grams over a token array, joined with single spaces —
  * natively, because the composable form (`transform(sequence(...),
  * i -> concat_ws(" ", slice(toks, i, n)))`) runs the higher-order
  * lambda INTERPRETED per window: measured 3.1 s warm for a 250k-bigram
  * corpus pass vs 0.19 s for tokenization itself; the windows, not the
  * data, were the workload (same lesson as [[SortedIntersectSize]]).
  * One static kernel call per row, zero lambda dispatch.
  *
  * Semantics pinned equal to the composable form in TextFunctionsSpec:
  * fewer than n tokens → empty array; null ELEMENTS are skipped by the
  * join exactly like `concat_ws`.
  */
case class WordNgrams(child: Expression, n: Int) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n-gram size must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WordNgrams.ngrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordNgrams.ngrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val SEP = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static kernel (called from generated code and interpreted eval). */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](t - n + 1)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i <= t - n) {
        var k = 0
        while (k < n) {
          parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
          k += 1
        }
        // UTF8String.concatWs skips nulls — identical to concat_ws
        out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(SEP, parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}
