package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bloom-filter build + probe for semi-join pruning (SCALE.md: runtime
  * filter pushdown — the pattern behind Spark's own
  * InjectRuntimeFilter, exposed as a first-class operator so a pipeline
  * can build the filter ONCE on a dimension and prune any number of
  * fact scans with it).
  *
  * Layout (BinaryType): [int numHashes][long numBits][long words...].
  * k hash probes use splitmix64 double hashing — no per-probe
  * rehashing of the key.
  */
object BloomFilter {

  /** Optimal parameters for `n` expected items at false-positive rate
    * `p`: m = -n·ln p / (ln 2)², k = (m/n)·ln 2.
    */
  /** Largest supported filter: the word array must serialize into one
    * ByteBuffer whose size is computed as `8 * numWords` in Int — an
    * unclamped m near 2e9 items overflowed that product NEGATIVE and
    * crashed allocate() mid-shuffle. 2^34 bits = 2 GiB of filter; past
    * that, partition the key space and build one filter per shard.
    */
  private val MaxBits = 1L << 34

  def parameters(n: Long, p: Double): (Long, Int) = {
    require(n > 0 && p > 0 && p < 1, s"invalid bloom parameters n=$n p=$p")
    val ln2 = math.log(2)
    val m = math.max(64L, math.ceil(-n * math.log(p) / (ln2 * ln2)).toLong)
    require(m <= MaxBits,
      s"bloom filter needs $m bits for n=$n p=$p — beyond the $MaxBits-bit " +
        "bound; shard the build or relax fpp")
    val k = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (m, k)
  }

  // splitmix64 finalizer — well-mixed 64-bit hash, cheap and allocation-free
  private[expressions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Allocation-free double-hashing set — the same unrolled `h1 += h2`
    * walk [[mightContain]] uses (the old Range-iterator form allocated
    * an iterator + k boxed longs PER INPUT ROW on the build pass, the
    * exact overhead these expressions exist to avoid).
    */
  private[expressions] def set(words: Array[Long], numBits: Long, k: Int, key: Long): Unit = {
    var h1 = mix(key)
    val h2 = mix(h1) | 1L // odd => full-period double hashing
    var i = 0
    while (i < k) {
      val b = java.lang.Long.remainderUnsigned(h1, numBits)
      words((b >>> 6).toInt) |= (1L << (b & 63))
      h1 += h2
      i += 1
    }
  }

  /** Static probe used by both interpreted eval and generated code. */
  def mightContain(bytes: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val numBits = bb.getLong
    val base = bb.position()
    var h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val b = java.lang.Long.remainderUnsigned(h1, numBits)
      val word = bb.getLong(base + 8 * (b >>> 6).toInt)
      if ((word & (1L << (b & 63))) == 0) return false
      h1 += h2
      i += 1
    }
    true
  }

  def register(spark: SparkSession): Unit = {
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "bloom_build",
      exprs => BloomBuildAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** bloom_build(key, expectedItems, fpp) → binary bloom filter. */
  def bloomBuild(key: Column, expectedItems: Long, fpp: Double): Column =
    call_function("bloom_build", key,
      org.apache.spark.sql.functions.lit(expectedItems),
      org.apache.spark.sql.functions.lit(fpp))

  /** bloom_might_contain(key, filter) → boolean (no false negatives). */
  def bloomMightContain(key: Column, filter: Column): Column =
    call_function("bloom_might_contain", key, filter)
}

/** Builds the bloom filter bit array as ONE long-array buffer with
  * element-wise OR merge — same TypedImperativeAggregate shape as
  * [[MinHashAggregate]], and the same reason: partial aggregation makes
  * the build a single map-side pass with tiny shuffled state.
  */
case class BloomBuildAggregate(
    child: Expression,
    nExpr: Expression,
    fppExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val (numBits: Long, numHashes: Int) = {
    val n = nExpr match {
      case Literal(v: Long, LongType) => v
      case other => Option(other.eval()).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
    val p = fppExpr match {
      case Literal(v: Double, DoubleType) => v
      case other => Option(other.eval()).map(_.asInstanceOf[Double]).getOrElse(0.0)
    }
    BloomFilter.parameters(n, p)
  }
  private lazy val numWords: Int = ((numBits + 63) >>> 6).toInt

  override def children: Seq[Expression] = Seq(child, nExpr, fppExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, nExpr.dataType, fppExpr.dataType) match {
      // foldable: a column-valued n/fpp would fail executor-side with
      // an unbound-reference NPE mid-job instead of at analysis
      case (LongType, LongType, DoubleType)
          if nExpr.foldable && fppExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, LongType, DoubleType) => TypeCheckResult.TypeCheckFailure(
        "bloom_build's expectedItems and fpp must be literals")
      case (c, n, p) => TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects (BIGINT, BIGINT, DOUBLE), got (${c.sql}, ${n.sql}, ${p.sql})")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomFilter.set(buffer, numBits, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * buffer.length)
    bb.putInt(numHashes)
    bb.putLong(numBits)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAggregate =
    copy(child = newChildren(0), nExpr = newChildren(1), fppExpr = newChildren(2))
}

/** Probe expression: stays in whole-stage codegen (the generated code
  * calls the static probe — the fact-scan hot path never leaves
  * compiled code).
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (BIGINT, BINARY), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(key: Any, filter: Any): Any =
    BloomFilter.mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (keyEv, filterEv) =>
      s"${ev.value} = graft.expressions.BloomFilter.mightContain($filterEv, $keyEv);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
