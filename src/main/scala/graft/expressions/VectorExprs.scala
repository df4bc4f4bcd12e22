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
    graft.GraftFunctions.registerIfAbsent(reg, 
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "vec_norm", exprs => VectorNorm(exprs.head), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "vec_unit", exprs => VectorNormalize(exprs.head), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "vec_q8", exprs => VectorQuantize(exprs.head), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "vec_dot_q8", exprs => VectorDotQ8(exprs(0), exprs(1)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "lsh_sig", exprs => LshSignature(exprs(0), exprs(1), exprs(2)), "built-in")
    graft.GraftFunctions.registerIfAbsent(reg, 
      "nearest_cell", exprs => NearestCell(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  /** Column-API entry points; callers must have invoked [[register]] on
    * the owning session (query builders do).
    */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vecNorm(a: Column): Column = call_function("vec_norm", a)

  /** Unit-normalize to `array<double>`; zero vectors stay zero. A
    * native expression rather than transform+aggregate lambdas because
    * Catalyst's CollapseProject happily inlines a projected normalize
    * into a join condition / join output — at which point an interpreted
    * higher-order normalize is re-evaluated PER PAIR, not per row
    * (measured: ~1.5 s of a 1.9 s n² near-dup join at 250 vectors).
    * Compiled, the worst-case re-evaluation is a primitive loop.
    */
  def vecUnit(a: Column): Column = call_function("vec_unit", a)

  /** Symmetric int8 quantization: `array<float|double>` → compact binary
    * `[8-byte max_abs][1 byte per element]` — 4× less storage/bandwidth
    * than float32, the standard memory-bound ANN trade.
    */
  def vecQ8(v: Column): Column = call_function("vec_q8", v)

  /** Approximate dot product of two [[vecQ8]]-quantized vectors. */
  def vecDotQ8(a: Column, b: Column): Column = call_function("vec_dot_q8", a, b)

  /** All random-hyperplane LSH table signatures in one pass:
    * `lsh_sig(vec, flatPlanes, bitsPerTable)` → `array<long>` with one
    * packed sign-bit bucket per table. `flatPlanes` is the plane-major
    * flattened hyperplane matrix (a foldable literal — codegen embeds it
    * ONCE as a reference object, never as N inline array literals, which
    * is the difference between a 200-byte loop and a megamethod janino
    * spends seconds on). Note signs are scale-invariant, so the input
    * vector needs no normalization.
    */
  def lshSig(vec: Column, flatPlanes: Column, bitsPerTable: Column): Column =
    call_function("lsh_sig", vec, flatPlanes, bitsPerTable)

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

/** vec_unit: unit-normalize an array<float|double> to array<double>.
  * Null elements contribute 0 to the norm and normalize to 0.0 (same
  * contribution they'd make to any downstream [[VectorDot]]); a
  * zero-norm vector returns all zeros rather than NaN (Spark sorts NaN
  * above every real double — an all-zero embedding would otherwise top
  * every descending similarity ranking).
  */
case class VectorNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with VectorExprHelpers {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(child, "input")

  private def kernel: String =
    if (elementType(child) == FloatType) "normalizeFloat" else "normalizeDouble"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (elementType(child) == FloatType) VectorQuant.normalizeFloat(arr)
    else VectorQuant.normalizeDouble(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.VectorQuant.$kernel($a);")

  override protected def withNewChildInternal(newChild: Expression): VectorNormalize =
    copy(child = newChild)
}

/** lsh_sig(vec, flatPlanes, bitsPerTable): every LSH table's packed
  * sign-bit bucket in one pass over the hyperplane matrix.
  *
  * `planes` must be a foldable array<double> literal (the plane-major
  * flattened matrix, length = numPlanes × dim) and `bits` a foldable int
  * literal; both are evaluated once at plan time and handed to codegen
  * as a single reference object — the generated code is one tight
  * dot-product loop, independent of numPlanes.
  */
case class LshSignature(vec: Expression, planes: Expression, bits: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = planes
  override def third: Expression = bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(vec, "vec") match {
      case TypeCheckResult.TypeCheckSuccess =>
        if (!planes.foldable || planes.dataType != ArrayType(DoubleType, false) &&
            planes.dataType != ArrayType(DoubleType, true))
          TypeCheckResult.TypeCheckFailure(
            "planes must be a foldable array<double> literal")
        else if (!bits.foldable || bits.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure("bits must be a foldable int literal")
        else TypeCheckResult.TypeCheckSuccess
      case f => f
    }

  @transient private lazy val flatPlanes: Array[Double] =
    planes.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val bitsPerTable: Int =
    bits.eval(null).asInstanceOf[Int]

  private def isFloat: Boolean = elementType(vec) == FloatType

  override def nullSafeEval(v: Any, p: Any, b: Any): Any =
    VectorQuant.lshSig(v.asInstanceOf[ArrayData], flatPlanes, bitsPerTable, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flatPlanes, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.VectorQuant.lshSig(
         |  $v, $planesRef, $bitsPerTable, $isFloat);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshSignature =
    copy(vec = f, planes = s, bits = t)
}

/** Nearest-centroid assignment in ONE matrix pass: `cents` is the
  * cell-major flattened centroid matrix (ordered by ascending cell id),
  * `ids` the parallel cell-id array — both foldable literals, installed
  * as codegen reference objects, so the generated code is one tight
  * loop over all cells independent of their count. Replaces the
  * corpus×cells cross join + argmin aggregate with a map-only
  * projection: per row, dot/norm arithmetic is IDENTICAL to
  * [[VectorDot]]/[[VectorNorm]] composition (sequential index order,
  * zero for null elements, cos = 0 when either norm is 0), and ties
  * keep the smallest cell id — bit-equal to the relational argmin it
  * replaces.
  */
case class NearestCell(vec: Expression, cents: Expression, ids: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = ids

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(vec, "vec") match {
      case TypeCheckResult.TypeCheckSuccess =>
        if (!cents.foldable ||
            (cents.dataType != ArrayType(DoubleType, false) &&
              cents.dataType != ArrayType(DoubleType, true)))
          TypeCheckResult.TypeCheckFailure(
            "cents must be a foldable array<double> literal")
        else if (!ids.foldable ||
            (ids.dataType != ArrayType(IntegerType, false) &&
              ids.dataType != ArrayType(IntegerType, true)))
          TypeCheckResult.TypeCheckFailure(
            "ids must be a foldable array<int> literal")
        else TypeCheckResult.TypeCheckSuccess
      case f => f
    }

  @transient private lazy val flatCents: Array[Double] =
    cents.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val cellIds: Array[Int] =
    ids.eval(null).asInstanceOf[ArrayData].toIntArray()
  @transient private lazy val centNorms: Array[Double] =
    VectorQuant.rowNorms(flatCents, cellIds.length)

  private def isFloat: Boolean = elementType(vec) == FloatType

  override def nullSafeEval(v: Any, c: Any, i: Any): Any =
    VectorQuant.nearestCell(
      v.asInstanceOf[ArrayData], flatCents, centNorms, cellIds, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("nearestCents", flatCents, "double[]")
    val normsRef = ctx.addReferenceObj("nearestNorms", centNorms, "double[]")
    val idsRef = ctx.addReferenceObj("nearestIds", cellIds, "int[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.VectorQuant.nearestCell(
         |  $v, $centsRef, $normsRef, $idsRef, $isFloat);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCell =
    copy(vec = f, cents = s, ids = t)
}

/** Static quantization kernels shared by interpreted eval AND generated
  * code (the codegen emits a single static call — identical arithmetic on
  * both paths by construction, pinned in QuantizeSpec anyway).
  *
  * Layout: [8-byte IEEE double max_abs][n bytes, q_i = round(x_i·127/max_abs)].
  * Symmetric per-vector scaling: dequant x̂_i = q_i·max_abs/127, so the
  * per-element error is ≤ max_abs/254. An all-zero vector stores
  * max_abs = 0 and dots to 0 (never NaN).
  */
object VectorQuant {
  def quantizeFloat(v: ArrayData): Array[Byte] = quantizeImpl(v, isFloat = true)
  def quantizeDouble(v: ArrayData): Array[Byte] = quantizeImpl(v, isFloat = false)

  def normalizeFloat(v: ArrayData): ArrayData = normalizeImpl(v, isFloat = true)
  def normalizeDouble(v: ArrayData): ArrayData = normalizeImpl(v, isFloat = false)

  /** Per-row L2 norms of a row-major flattened matrix — the same
    * sequential sum-of-squares as [[VectorNorm]]'s loop, so precomputed
    * centroid norms are bit-equal to per-pair `vec_norm(centroid)`.
    */
  def rowNorms(flat: Array[Double], rows: Int): Array[Double] = {
    val dim = if (rows == 0) 0 else flat.length / rows
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val off = r * dim
      var acc = 0.0
      var i = 0
      while (i < dim) { val x = flat(off + i); acc += x * x; i += 1 }
      out(r) = math.sqrt(acc)
      r += 1
    }
    out
  }

  /** Argmax-cosine cell for one vector against the flattened centroid
    * matrix. Arithmetic mirrors `vec_dot / (vec_norm * vec_norm)` with
    * the same zero-denominator → 0 convention; `ids` is scanned in
    * ascending-cell order with a STRICT improvement test, so ties keep
    * the smallest cell id — exactly the relational
    * `min_by(cell_id, (−cos, cell_id))`.
    */
  def nearestCell(v: ArrayData, flat: Array[Double], norms: Array[Double],
      ids: Array[Int], isFloat: Boolean): Int = {
    val cells = ids.length
    if (cells == 0) return -1
    // a ragged/mis-sized centroid matrix would floor dim and walk every
    // cell's offsets misaligned — wrong-but-plausible assignments with
    // no error (a silent IVF recall collapse); refuse instead
    require(flat.length % cells == 0,
      s"centroid matrix of ${flat.length} values is not a multiple of $cells cells")
    val dim = flat.length / cells
    val n = Math.min(v.numElements(), dim)
    var nv = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        nv += x * x
      }
      i += 1
    }
    nv = math.sqrt(nv)
    var bestId = ids(0)
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cells) {
      val off = c * dim
      var dot = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          dot += x * flat(off + j)
        }
        j += 1
      }
      val denom = nv * norms(c)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      if (cos > bestCos) { bestCos = cos; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** All LSH sign-bit buckets in one pass: `flat` is the plane-major
    * flattened hyperplane matrix; plane p spans
    * `flat[p*dim .. p*dim+dim)`, its sign bit lands in table `p/bits`
    * at position `p%bits`. Null elements contribute 0 (their
    * [[VectorDot]] convention).
    */
  def lshSig(v: ArrayData, flat: Array[Double], bits: Int, isFloat: Boolean): ArrayData = {
    require(bits >= 1, s"bits per table must be >= 1, got $bits")
    val dim = v.numElements()
    // the plane matrix is numPlanes×dim flattened FOR THIS dim: a
    // vector whose length disagrees floors numPlanes, reads every
    // plane misaligned, and writes out(p/bits) one slot past the array
    // for the tail planes (a data-dependent AIOOBE) — refuse instead
    require(dim == 0 || flat.length % dim == 0,
      s"vector of $dim dims does not divide the ${flat.length}-value plane matrix")
    val numPlanes = if (dim == 0) 0 else flat.length / dim
    require(numPlanes % bits == 0 || numPlanes == 0,
      s"$numPlanes planes do not fill whole $bits-bit tables")
    val out = new Array[Long](numPlanes / bits)
    var p = 0
    while (p < numPlanes) {
      val off = p * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (!v.isNullAt(i)) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          acc += x * flat(off + i)
        }
        i += 1
      }
      if (acc > 0) out(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def normalizeImpl(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    def elem(i: Int): Double =
      if (v.isNullAt(i)) 0.0
      else if (isFloat) v.getFloat(i).toDouble
      else v.getDouble(i)
    var acc = 0.0
    var i = 0
    while (i < n) { val x = elem(i); acc += x * x; i += 1 }
    val norm = math.sqrt(acc)
    val out = new Array[Double](n)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) = elem(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def quantizeImpl(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    def elem(i: Int): Double =
      if (v.isNullAt(i)) 0.0
      else if (isFloat) v.getFloat(i).toDouble
      else v.getDouble(i)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(elem(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val out = java.nio.ByteBuffer.allocate(8 + n)
    out.putDouble(maxAbs)
    val s = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    i = 0
    while (i < n) {
      out.put(math.round(elem(i) * s).toByte)
      i += 1
    }
    out.array()
  }

  def dotQ8(a: Array[Byte], b: Array[Byte]): Double = {
    val ma = java.nio.ByteBuffer.wrap(a).getDouble
    val mb = java.nio.ByteBuffer.wrap(b).getDouble
    if (ma == 0.0 || mb == 0.0) return 0.0
    val n = math.min(a.length, b.length) - 8
    var acc = 0L
    var i = 8
    while (i < 8 + n) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc * (ma / 127.0) * (mb / 127.0)
  }
}

/** vec_q8: quantize a float/double array to the int8 binary layout. */
case class VectorQuantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with VectorExprHelpers {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfNumeric(child, "input")

  private def kernel: String =
    if (elementType(child) == FloatType) "quantizeFloat" else "quantizeDouble"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (elementType(child) == FloatType) VectorQuant.quantizeFloat(arr)
    else VectorQuant.quantizeDouble(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.VectorQuant.$kernel($a);")

  override protected def withNewChildInternal(newChild: Expression): VectorQuantize =
    copy(child = newChild)
}

/** vec_dot_q8: approximate dot of two quantized vectors — an int
  * multiply-accumulate loop (SIMD-friendly) with one double rescale at
  * the end.
  */
case class VectorDotQ8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_q8 expects (BINARY, BINARY), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorQuant.dotQ8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorQuant.dotQ8($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotQ8 =
    copy(left = newLeft, right = newRight)
}
