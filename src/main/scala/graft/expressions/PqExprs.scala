package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search"): [[PqEncode]] maps a D-dim vector to m
  * sub-codebook indices (argmin L2 per subspace), [[PqAdc]] computes the
  * asymmetric distance — the sum of per-subspace query→centroid lookup
  * entries — against a per-query LUT column.
  *
  * Why native: encoding visits m·k·(D/m) = k·D doubles per vector and
  * ADC is the inner loop of every PQ scan; as higher-order-function
  * lambdas both would evaluate interpretively per element (and per PAIR
  * once CollapseProject inlines them into the scoring join — the
  * [[VectorExprs.vecUnit]] lesson). Here both are primitive loops inside
  * whole-stage codegen, with the codebook installed once as a codegen
  * reference object.
  *
  * Static kernels shared by interpreted eval AND generated code —
  * identical arithmetic on both paths by construction.
  */
object PqExprs {

  // element-kind codes for the shared kernels (codegen inlines one)
  final val KindDouble = 0
  final val KindFloat = 1
  final val KindLong = 2
  final val KindInt = 3

  def kindOf(dt: DataType): Int = dt match {
    case DoubleType => KindDouble
    case FloatType => KindFloat
    case LongType => KindLong
    case IntegerType => KindInt
    case other => throw new IllegalArgumentException(s"unsupported element type $other")
  }

  /** null elements read as 0.0 — the [[VectorDot]] convention. */
  private def elem(vec: ArrayData, kind: Int, i: Int): Double =
    if (vec.isNullAt(i)) 0.0
    else kind match {
      case KindDouble => vec.getDouble(i)
      case KindFloat => vec.getFloat(i).toDouble
      case KindLong => vec.getLong(i).toDouble
      case _ => vec.getInt(i).toDouble
    }

  /** m sub-codebook indices for one vector. `cents` is laid out
    * `(s*k + j)*subDim + t`; ties keep the smallest j (strict-less
    * argmin), matching the relational ROW_NUMBER(ORDER BY dist, j) form.
    */
  def pqEncode(vec: ArrayData, kind: Int, cents: Array[Double], m: Int): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || d % m != 0)
      throw new IllegalArgumentException(
        s"vector dim $d not divisible into m=$m subspaces")
    if (cents.length % d != 0 || cents.length == 0)
      throw new IllegalArgumentException(
        s"codebook length ${cents.length} is not k*dim for dim $d")
    val k = cents.length / d
    val sub = d / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val base = (s * k + j) * sub
        var acc = 0.0
        var t = 0
        while (t < sub) {
          val diff = elem(vec, kind, s * sub + t) - cents(base + t)
          acc += diff * diff
          t += 1
        }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Packed byte-code variant of [[pqEncode]]: one unsigned byte per
    * subspace (requires k ≤ 256) — the honest m-bytes-per-vector PQ
    * payload for persisted indexes.
    */
  def pqEncodePacked(vec: ArrayData, kind: Int, cents: Array[Double], m: Int): Array[Byte] = {
    val codes = pqEncode(vec, kind, cents, m)
    val d = vec.numElements()
    val k = cents.length / d
    if (k > 256)
      throw new IllegalArgumentException(s"packed PQ codes need k <= 256, got $k")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) { out(s) = codes.getInt(s).toByte; s += 1 }
    out
  }

  /** Residual IVFPQ encode (the classical faiss IVFPQ formulation):
    * find the nearest coarse centroid (argmin L2 over
    * `coarse.length / dim` full-vector cells), subtract it, and PQ-encode
    * the RESIDUAL with `cents`. Residuals have far less variance than
    * raw vectors, so the same code budget quantizes them much more
    * tightly. Returns the packed byte codes; the cell id itself comes
    * from the m=1 [[pqEncode]] over `coarse` (identical argmin by
    * construction — same kernel semantics, strict-less / lowest-j).
    */
  def pqEncodeResidualPacked(vec: ArrayData, kind: Int,
      coarse: Array[Double], cents: Array[Double], m: Int): Array[Byte] = {
    val d = vec.numElements()
    if (d == 0 || d % m != 0)
      throw new IllegalArgumentException(
        s"vector dim $d not divisible into m=$m subspaces")
    if (coarse.length % d != 0 || coarse.length == 0)
      throw new IllegalArgumentException(
        s"coarse codebook length ${coarse.length} is not numCells*dim for dim $d")
    val numCells = coarse.length / d
    var cell = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < numCells) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        val diff = elem(vec, kind, i) - coarse(c * d + i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; cell = c }
      c += 1
    }
    val resid = new Array[Double](d)
    var i = 0
    while (i < d) {
      resid(i) = elem(vec, kind, i) - coarse(cell * d + i)
      i += 1
    }
    pqEncodePacked(new GenericArrayData(resid), KindDouble, cents, m)
  }

  /** [[pqAdc]] over a packed byte code. */
  def pqAdcPacked(code: Array[Byte], lut: ArrayData): Double = {
    val m = code.length
    if (m == 0) throw new IllegalArgumentException("empty PQ code")
    val n = lut.numElements()
    if (n == 0 || n % m != 0)
      throw new IllegalArgumentException(
        s"LUT length $n is not a multiple of code length $m")
    val k = n / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val j = code(s) & 0xff
      if (j >= k)
        throw new IllegalArgumentException(s"PQ code $j out of range [0,$k)")
      val idx = s * k + j
      if (lut.isNullAt(idx))
        throw new IllegalArgumentException(s"null LUT entry at $idx")
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  /** Asymmetric distance: Σ_s lut[s*k + code[s]] with k = |lut| / |code|.
    * Malformed codes fail loudly — a silent 0/null here would quietly
    * corrupt every ranking downstream.
    */
  def pqAdc(code: ArrayData, lut: ArrayData): Double = {
    val m = code.numElements()
    if (m == 0) throw new IllegalArgumentException("empty PQ code")
    val n = lut.numElements()
    if (n == 0 || n % m != 0)
      throw new IllegalArgumentException(
        s"LUT length $n is not a multiple of code length $m")
    val k = n / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (code.isNullAt(s))
        throw new IllegalArgumentException(s"null PQ code element at $s")
      val j = code.getInt(s)
      if (j < 0 || j >= k)
        throw new IllegalArgumentException(s"PQ code $j out of range [0,$k)")
      val idx = s * k + j
      if (lut.isNullAt(idx))
        throw new IllegalArgumentException(s"null LUT entry at $idx")
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  // ---- bulk-serve kernels (query-side, one eval per query×probe row) --

  /** The `nprobe` nearest coarse cells of a query by L2², ties to the
    * lower cell id — ARITHMETIC-IDENTICAL to the driver-side
    * `Codebook.lutFor` + `sortBy((dist, cell))` probe selection in
    * [[graft.operators.PqIndex.search]] (same accumulation order), so
    * the join-form bulk serve probes exactly the cells the LUT-collect
    * path probes.
    */
  def probeCells(vec: ArrayData, kind: Int, coarse: Array[Double],
      nprobe: Int): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || coarse.length % d != 0)
      throw new IllegalArgumentException(
        s"query dim $d does not divide the coarse codebook (${coarse.length})")
    val numCells = coarse.length / d
    if (nprobe < 1 || nprobe > numCells)
      throw new IllegalArgumentException(s"nprobe $nprobe outside 1..$numCells")
    val dist = new Array[Double](numCells)
    var j = 0
    while (j < numCells) {
      var acc = 0.0
      var t = 0
      while (t < d) {
        val diff = elem(vec, kind, t) - coarse(j * d + t)
        acc += diff * diff
        t += 1
      }
      dist(j) = acc
      j += 1
    }
    // partial selection sort on (dist, id): numCells is index-tuning
    // sized (16..4096), nprobe a handful — O(nprobe·numCells) beats a
    // full sort and keeps the tie rule explicit
    val idx = Array.tabulate(numCells)(identity)
    var s = 0
    while (s < nprobe) {
      var best = s
      var i = s + 1
      while (i < numCells) {
        if (dist(idx(i)) < dist(idx(best)) ||
            (dist(idx(i)) == dist(idx(best)) && idx(i) < idx(best))) best = i
        i += 1
      }
      val tmp = idx(s); idx(s) = idx(best); idx(best) = tmp
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(idx, nprobe))
  }

  /** Query residual against one coarse cell: r_t = q_t − c_{cell,t}. */
  def cellResidual(vec: ArrayData, kind: Int, coarse: Array[Double],
      cell: Int): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || coarse.length % d != 0)
      throw new IllegalArgumentException(
        s"query dim $d does not divide the coarse codebook (${coarse.length})")
    val numCells = coarse.length / d
    if (cell < 0 || cell >= numCells)
      throw new IllegalArgumentException(s"cell $cell outside 0..${numCells - 1}")
    val r = new Array[Double](d)
    var t = 0
    while (t < d) {
      r(t) = elem(vec, kind, t) - coarse(cell * d + t)
      t += 1
    }
    new GenericArrayData(r)
  }

  /** Per-query ADC LUT: lut[s*k + j] = ‖q_s − c_{s,j}‖², mirroring
    * `Codebook.lutFor` loop-for-loop (same FP accumulation order — the
    * bulk serve must be BIT-equal to the collect path).
    */
  def queryLut(vec: ArrayData, kind: Int, cents: Array[Double],
      m: Int): ArrayData = {
    val d = vec.numElements()
    if (d == 0 || d % m != 0)
      throw new IllegalArgumentException(
        s"query dim $d not divisible into m=$m subspaces")
    val subDim = d / m
    if (cents.length % (m * subDim) != 0)
      throw new IllegalArgumentException(
        s"codebook length ${cents.length} does not fit m=$m subDim=$subDim")
    val k = cents.length / (m * subDim)
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var acc = 0.0
        var t = 0
        while (t < subDim) {
          val diff = elem(vec, kind, s * subDim + t) - cents(base + t)
          acc += diff * diff
          t += 1
        }
        lut(s * k + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }
}

/** pq_encode(vec, flatCodebook, m) → array<int> of m sub-indices.
  * The codebook is a foldable literal (installed once as a codegen
  * reference object, the [[NearestCell]] pattern); `m` a foldable int.
  */
case class PqEncode(vec: Expression, cents: Expression, m: Expression)
    extends TernaryExpression with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = m

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (!cents.foldable ||
          (cents.dataType != ArrayType(DoubleType, false) &&
            cents.dataType != ArrayType(DoubleType, true)))
        TypeCheckResult.TypeCheckFailure(
          "codebook must be a foldable array<double> literal")
      else if (!m.foldable || m.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure("m must be a foldable int literal")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec must be an array of float/double/int/long, got ${other.sql}")
  }

  @transient private lazy val flatCents: Array[Double] =
    cents.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val mVal: Int = m.eval(null).asInstanceOf[Int]

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, c: Any, mm: Any): Any =
    PqExprs.pqEncode(v.asInstanceOf[ArrayData], kind, flatCents, mVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", flatCents, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.PqExprs.pqEncode(
         |  $v, $kind, $centsRef, $mVal);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncode =
    copy(vec = f, cents = s, m = t)
}

/** pq_encode_packed(vec, flatCodebook, m) → binary of m unsigned-byte
  * sub-indices (k ≤ 256) — the persisted-index payload form.
  */
case class PqEncodePacked(vec: Expression, cents: Expression, m: Expression)
    extends TernaryExpression with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = m

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    PqEncode(vec, cents, m).checkInputDataTypes()

  @transient private lazy val flatCents: Array[Double] =
    cents.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val mVal: Int = m.eval(null).asInstanceOf[Int]

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, c: Any, mm: Any): Any =
    PqExprs.pqEncodePacked(v.asInstanceOf[ArrayData], kind, flatCents, mVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", flatCents, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.PqExprs.pqEncodePacked(
         |  $v, $kind, $centsRef, $mVal);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncodePacked =
    copy(vec = f, cents = s, m = t)
}

/** pq_encode_residual(vec, coarseCodebook, pqCodebook, m) → binary
  * packed codes of the residual to the nearest coarse centroid (faiss
  * IVFPQ). Both codebooks are foldable literals.
  */
case class PqEncodeResidual(vec: Expression, coarse: Expression,
    cents: Expression, m: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = coarse
  override def third: Expression = cents
  override def fourth: Expression = m

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      def foldableDoubles(e: Expression, name: String): TypeCheckResult =
        if (!e.foldable ||
            (e.dataType != ArrayType(DoubleType, false) &&
              e.dataType != ArrayType(DoubleType, true)))
          TypeCheckResult.TypeCheckFailure(
            s"$name must be a foldable array<double> literal")
        else TypeCheckResult.TypeCheckSuccess
      foldableDoubles(coarse, "coarse codebook") match {
        case TypeCheckResult.TypeCheckSuccess =>
          foldableDoubles(cents, "pq codebook") match {
            case TypeCheckResult.TypeCheckSuccess =>
              if (!m.foldable || m.dataType != IntegerType)
                TypeCheckResult.TypeCheckFailure("m must be a foldable int literal")
              else TypeCheckResult.TypeCheckSuccess
            case f => f
          }
        case f => f
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec must be an array of float/double/int/long, got ${other.sql}")
  }

  @transient private lazy val coarseFlat: Array[Double] =
    coarse.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val flatCents: Array[Double] =
    cents.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val mVal: Int = m.eval(null).asInstanceOf[Int]

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, co: Any, ce: Any, mm: Any): Any =
    PqExprs.pqEncodeResidualPacked(
      v.asInstanceOf[ArrayData], kind, coarseFlat, flatCents, mVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("pqCoarse", coarseFlat, "double[]")
    val centsRef = ctx.addReferenceObj("pqCents", flatCents, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _, _) =>
      s"""${ev.value} = graft.expressions.PqExprs.pqEncodeResidualPacked(
         |  $v, $kind, $coarseRef, $centsRef, $mVal);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqEncodeResidual =
    copy(vec = f, coarse = s, cents = t, m = q)
}

/** pq_adc(code, lut) → double asymmetric distance. `code` is either the
  * array<int> form or the packed binary form; `lut` a regular column
  * (one per query row, from a broadcast join), not a literal.
  */
case class PqAdc(code: Expression, lut: Expression)
    extends BinaryExpression with VectorExprHelpers {

  override def left: Expression = code
  override def right: Expression = lut

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, lut.dataType) match {
      case (ArrayType(IntegerType, _) | BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, l) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int> | binary, array<double>), got (${c.sql}, ${l.sql})")
    }

  private def packed: Boolean = code.dataType == BinaryType

  override def nullSafeEval(c: Any, l: Any): Any =
    if (packed) PqExprs.pqAdcPacked(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData])
    else PqExprs.pqAdc(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      if (packed) s"${ev.value} = graft.expressions.PqExprs.pqAdcPacked($c, $l);"
      else s"${ev.value} = graft.expressions.PqExprs.pqAdc($c, $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(code = newLeft, lut = newRight)
}

/** pq_probe_cells(vec, flatCoarse, nprobe) → array<int> of the nprobe
  * nearest coarse cells (L2², ties to the lower id) — the query-side
  * probe selection of the join-form bulk serve, running distributed
  * instead of in a driver loop.
  */
case class PqProbeCells(vec: Expression, coarse: Expression, nprobe: Expression)
    extends TernaryExpression with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = coarse
  override def third: Expression = nprobe

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (!coarse.foldable ||
          (coarse.dataType != ArrayType(DoubleType, false) &&
            coarse.dataType != ArrayType(DoubleType, true)))
        TypeCheckResult.TypeCheckFailure(
          "coarse codebook must be a foldable array<double> literal")
      else if (!nprobe.foldable || nprobe.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure("nprobe must be a foldable int literal")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec must be an array of float/double/int/long, got ${other.sql}")
  }

  @transient private lazy val flatCoarse: Array[Double] =
    coarse.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val nprobeVal: Int = nprobe.eval(null).asInstanceOf[Int]

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, c: Any, n: Any): Any =
    PqExprs.probeCells(v.asInstanceOf[ArrayData], kind, flatCoarse, nprobeVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("pqCoarse", flatCoarse, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.PqExprs.probeCells(
         |  $v, $kind, $coarseRef, $nprobeVal);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqProbeCells =
    copy(vec = f, coarse = s, nprobe = t)
}

/** pq_cell_residual(vec, flatCoarse, cellId) → array<double> — the
  * query residual against a PROBED cell (cellId is a live column, one
  * row per (query, probe)); composes with [[PqQueryLut]] for the
  * residual-mode bulk serve.
  */
case class PqCellResidual(vec: Expression, coarse: Expression, cell: Expression)
    extends TernaryExpression with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = coarse
  override def third: Expression = cell

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (!coarse.foldable ||
          (coarse.dataType != ArrayType(DoubleType, false) &&
            coarse.dataType != ArrayType(DoubleType, true)))
        TypeCheckResult.TypeCheckFailure(
          "coarse codebook must be a foldable array<double> literal")
      else if (cell.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(s"cell must be int, got ${cell.dataType.sql}")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec must be an array of float/double/int/long, got ${other.sql}")
  }

  @transient private lazy val flatCoarse: Array[Double] =
    coarse.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, c: Any, ce: Any): Any =
    PqExprs.cellResidual(v.asInstanceOf[ArrayData], kind, flatCoarse,
      ce.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("pqCoarse", flatCoarse, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, ce) =>
      s"""${ev.value} = graft.expressions.PqExprs.cellResidual(
         |  $v, $kind, $coarseRef, $ce);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqCellResidual =
    copy(vec = f, coarse = s, cell = t)
}

/** pq_query_lut(vec, flatCodebook, m) → array<double> ADC LUT — the
  * query-side table [[PqAdc]] scores postings against, computed
  * DISTRIBUTED so serve batches need no driver collect (the 4096-query
  * LUT-broadcast ceiling of the collect path does not apply).
  */
case class PqQueryLut(vec: Expression, cents: Expression, m: Expression)
    extends TernaryExpression with VectorExprHelpers {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = m

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      if (!cents.foldable ||
          (cents.dataType != ArrayType(DoubleType, false) &&
            cents.dataType != ArrayType(DoubleType, true)))
        TypeCheckResult.TypeCheckFailure(
          "codebook must be a foldable array<double> literal")
      else if (!m.foldable || m.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure("m must be a foldable int literal")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec must be an array of float/double/int/long, got ${other.sql}")
  }

  @transient private lazy val flatCents: Array[Double] =
    cents.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val mVal: Int = m.eval(null).asInstanceOf[Int]

  private def kind: Int =
    PqExprs.kindOf(vec.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(v: Any, c: Any, mm: Any): Any =
    PqExprs.queryLut(v.asInstanceOf[ArrayData], kind, flatCents, mVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", flatCents, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"""${ev.value} = graft.expressions.PqExprs.queryLut(
         |  $v, $kind, $centsRef, $mVal);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqQueryLut =
    copy(vec = f, cents = s, m = t)
}
