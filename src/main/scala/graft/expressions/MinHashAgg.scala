package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** MinHash signature as a single custom aggregate.
  *
  * Why custom: the composable form is k independent `min((a_i*x+b_i) mod
  * p)` aggregate columns, which makes Catalyst generate one accumulator
  * and one code path per hash — a very large generated class whose
  * Janino compilation dominates the operator's wall time (profiled:
  * compilation+planning ≈ 4× the actual data pass at sf0.1). This
  * [[TypedImperativeAggregate]] keeps the whole signature in ONE
  * long-array buffer updated in a tight loop: one partial-agg pass, one
  * merge (element-wise min), tiny generated code.
  *
  * h_i(x) = (a_i·x + b_i) mod (2^31-1) over the token hash (reduced into
  * [0, p) with floorMod, so negative 64-bit hashes are handled), seeds
  * derived deterministically from seed 42 so signatures are reproducible
  * across runs.
  */
object MinHashAgg {
  val Prime: Long = (1L << 31) - 1

  def coefficients(k: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(k)((math.abs(rnd.nextLong()) % (Prime - 1) + 1,
      math.abs(rnd.nextLong()) % Prime))
  }

  /** Flattened [a0,b0,a1,b1,...] layout for the scalar kernel. */
  def flatCoefficients(k: Int): Array[Long] =
    coefficients(k).flatMap { case (a, b) => Array(a, b) }

  def register(spark: SparkSession): Unit = {
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "minhash_sig",
      exprs => MinHashAggregate(exprs(0), exprs(1)),
      "built-in")
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "minhash_sig_arr",
      exprs => MinHashArraySignature(exprs(0), exprs(1)),
      "built-in")
  }

  /** minhash_sig(tokenHash, k) → array<bigint> of length k. */
  def minhashSig(tokenHash: Column, k: Int): Column =
    call_function("minhash_sig", tokenHash, org.apache.spark.sql.functions.lit(k))

  /** minhash_sig_arr(tokens, k) — the whole signature from a token array
    * in one map-side pass (no explode, no shuffle).
    */
  def minhashSigArr(tokens: Column, k: Int): Column =
    call_function("minhash_sig_arr", tokens, org.apache.spark.sql.functions.lit(k))

  /** Shared kernel: bit-identical to feeding
    * `abs(xxhash64(token))` rows through [[MinHashAggregate]] —
    * equivalence spec-pinned in DedupSpec.
    */
  def signatureOf(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      flat: Array[Long], k: Int): GenericArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val th = math.abs(
          org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(toks.getUTF8String(t), StringType, 42L))
        val x = java.lang.Math.floorMod(th, Prime)
        var i = 0
        while (i < k) {
          val h = (flat(2 * i) * x + flat(2 * i + 1)) % Prime
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    var i = 0
    while (i < k) { if (sig(i) == Long.MaxValue) sig(i) = 0L; i += 1 }
    new GenericArrayData(sig)
  }
}

/** Scalar MinHash: `minhash_sig_arr(tokens, k)` → `array<bigint>`. The
  * aggregate form shuffles one exploded row per (doc, token); this
  * computes the identical signature inside the scan projection — zero
  * shuffle, and the per-token inner loop is the same tight k-step mix.
  * Null token arrays yield null (the explode form simply dropped those
  * docs — callers filter).
  */
case class MinHashArraySignature(toks: Expression, kExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = toks
  override def right: Expression = kExpr

  private lazy val k: Int = {
    val v = kExpr match {
      case Literal(value: Int, IntegerType) => value
      case other => Option(other.eval()).map(_.asInstanceOf[Int]).getOrElse(0)
    }
    require(v > 0, s"minhash_sig_arr k must be a positive integer literal, got $v")
    v
  }
  @transient private lazy val flat: Array[Long] = MinHashAgg.flatCoefficients(k)

  override def nullable: Boolean = toks.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (toks.dataType, kExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if kExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, kt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig_arr expects (ARRAY<STRING>, foldable INT), got (${c.sql}, ${kt.sql})")
    }

  override def nullSafeEval(t: Any, kv: Any): Any =
    MinHashAgg.signatureOf(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], flat, k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val flatRef = ctx.addReferenceObj("minhashCoeffs", flat, "long[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expressions.MinHashAgg.signatureOf($t, $flatRef, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashArraySignature =
    copy(toks = newLeft, kExpr = newRight)
}

case class MinHashAggregate(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val k: Int = {
    val v = kExpr match {
      case Literal(value: Int, IntegerType) => value
      case other => Option(other.eval()).map(_.asInstanceOf[Int]).getOrElse(0)
    }
    require(v > 0, s"minhash_sig k must be a positive integer literal, got $v")
    v
  }
  private lazy val coeffs = MinHashAgg.coefficients(k)

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // SQL callers get an analysis-time type error, not a mid-job
  // ClassCastException from the blind Long cast in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, kt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects (BIGINT, INT), got (${c.sql}, ${kt.sql})")
    }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // floorMod keeps x in [0, p) for negative hashes too — a negative x
      // would always win the min and bias every signature toward the
      // negative half of the hash space
      val x = java.lang.Math.floorMod(v.asInstanceOf[Long], MinHashAgg.Prime)
      var i = 0
      while (i < k) {
        val h = (coeffs(i)._1 * x + coeffs(i)._2) % MinHashAgg.Prime
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(v => if (v == Long.MaxValue) 0L else v))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAggregate =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
