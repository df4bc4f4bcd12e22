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
    reg.createOrReplaceTempFunction(
      "sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
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
