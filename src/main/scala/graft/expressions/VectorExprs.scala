package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` /
  * `array<double>` columns.
  *
  * Why custom: the composable form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,x) => acc+x)`
  * builds an intermediate array and evaluates both lambdas interpretively
  * per element (higher-order functions don't participate in whole-stage
  * codegen). [[VectorDot]] generates a primitive `while` loop instead —
  * no allocation, no boxing — which is what an n²-pair similarity join
  * spends ~all its time in at scale.
  */
object VectorExprs {

  /** Register SQL-callable names (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_norm", exprs => VectorNorm(exprs.head), "built-in")
  }

  /** Column-API entry points; callers must have invoked [[register]] on
    * the owning session (query builders do).
    */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vecNorm(a: Column): Column = call_function("vec_norm", a)

  /** Cosine with a zero-norm guard: 0/0 would be NaN, and Spark orders
    * NaN ABOVE every real double — an all-zero embedding (padding or a
    * failed embed) would otherwise top every descending similarity
    * ranking. Zero-norm pairs score 0.0 instead.
    */
  def vecCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val denom = vecNorm(a) * vecNorm(b)
    when(denom === 0.0, lit(0.0)).otherwise(vecDot(a, b) / denom)
  }
}

trait VectorExprHelpers { self: Expression =>
  protected def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkArrayOfNumeric(e: Expression, side: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$side must be array<float> or array<double>, got ${other.sql}")
    }

  /** primitive accessor call for the element type (codegen). */
  protected def getter(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  protected def readElem(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** dot(a, b) in double precision; null if either side is null. Lengths
  * must match (analysis can't check data, so the shorter length wins
  * defensively, mirroring zip_with-without-padding on equal-length
  * embeddings).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorExprHelpers {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(left, "left") match {
      case TypeCheckResult.TypeCheckSuccess => checkArrayOfNumeric(right, "right")
      case f => f
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left), elementType(right))
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0 — reading them via getDouble would
      // return unspecified garbage, not propagate null
      if (!la.isNullAt(i) && !ra.isNullAt(i))
        acc += readElem(lt, la, i) * readElem(rt, ra, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${getter(elementType(left), a, i)} * ${getter(elementType(right), b, i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a vector in double precision. */
case class VectorNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with VectorExprHelpers {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(child, "input")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dt = elementType(child)
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = readElem(dt, arr, i)
        acc += v * v
      }
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = ${getter(elementType(child), a, i)};
         |    $acc += $v * $v;
         |  }
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}
