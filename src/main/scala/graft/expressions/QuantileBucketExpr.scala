package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** quantile_bucket(v): index of `v` among precomputed quantile
  * boundaries — the rank-based scaling primitive behind
  * [[graft.operators.ZOrder.clusterByRank]]. The boundary array is baked
  * into the expression (hundreds of doubles), so evaluation is one
  * binary search per row, map-only, inside whole-stage codegen.
  */
object QuantileBucketExpr {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "quantile_bucket",
      exprs => QuantileBucket(exprs(0), extractBounds(exprs(1)).toSeq),
      "built-in")

  /** Column API: `bucketOf(v, boundaries)` ∈ [0, boundaries.length]. */
  def bucketOf(v: Column, boundaries: Array[Double]): Column =
    call_function("quantile_bucket", v, lit(boundaries))

  private[graft] def extractBounds(e: Expression): Array[Double] = e match {
    case Literal(arr: ArrayData, ArrayType(DoubleType, _)) => arr.toDoubleArray()
    // SQL callers write array(1.0, 4.0, ...) — a foldable CreateArray,
    // not yet a Literal when the function builder runs (constant folding
    // comes later in analysis)
    case other if other.foldable && (other.dataType match {
        case ArrayType(DoubleType, _) => true; case _ => false }) =>
      other.eval().asInstanceOf[ArrayData].toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"quantile_bucket boundaries must be a literal array<double>, got $other")
  }

  /** Shared by interpreted eval and generated code: number of boundaries
    * <= v (binary search; duplicate boundaries from heavy-hitter
    * quantiles resolve to the rightmost, keeping buckets contiguous).
    */
  def bucket(bounds: Array[Double], v: Double): Long = {
    // NaN sorts GREATEST in Spark: every `bounds(mid) <= NaN` compare
    // is false, which would drop NaN rows into bucket 0 with the
    // SMALLEST values — the exact opposite region
    if (v.isNaN) return bounds.length.toLong
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

// boundaries ride as a Seq: a case-class Array field compares by
// REFERENCE, so two identical quantile_bucket(...) calls would fail
// semanticEquals (GROUP BY resolution, subexpression elimination)
case class QuantileBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  private lazy val boundsArr: Array[Double] = boundaries.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects DOUBLE input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    QuantileBucketExpr.bucket(boundsArr, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("bounds", boundsArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.QuantileBucketExpr.bucket($bounds, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileBucket =
    copy(child = newChild)
}
