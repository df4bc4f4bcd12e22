package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch: keep the `k` smallest distinct
  * 63-bit hashes of a key stream; the k-th smallest order statistic
  * estimates the distinct count as `(k-1) / u_k` where `u_k` is the k-th
  * value normalized to [0, 1) (Bar-Yossef et al., "Counting Distinct
  * Elements in a Data Stream"; Beyer et al.'s unbiased (k-1) form).
  *
  * Why next to HLL (`approx_count_distinct`): a KMV sketch is a SAMPLE of
  * the key space, so two sketches support SET ALGEBRA — union, intersection
  * and Jaccard estimates ([[KmvSketch.unionEstimate]] /
  * [[KmvSketch.jaccardEstimate]]) — which HLL registers cannot express
  * (HLL gives union only; intersection via inclusion-exclusion explodes
  * the error). That is exactly the "how much do these two corpora /
  * partitions overlap" question a curation pipeline asks before merging
  * sources.
  *
  * Hashes are `xxhash64 >>> 1` — uniform on [0, 2^63), non-negative — so
  * SIGNED ordering equals unsigned ordering and the sketch arrays compose
  * with codegen'd native array functions (`array_sort`, `array_union`,
  * `array_intersect`) with no custom comparator.
  *
  * Scale: the buffer is a bounded TreeSet (≤ k longs), update is
  * O(log k) only while the value beats the current k-th minimum (O(1)
  * reject otherwise), merge is a bounded set union — a classic mergeable
  * summary, so partial aggregation runs map-side and the shuffle carries
  * ≤ k longs per group per partition regardless of input size.
  */
object KmvSketch {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "kmv_sketch",
      exprs => KmvSketchAggregate(exprs(0), exprs(1)),
      "built-in")

  /** kmv_sketch over any key column → struct<estimate: double,
    * sketch: array<bigint>> (sketch ascending; estimate exact when the
    * observed distinct count is below k). Nulls are excluded BEFORE
    * hashing — `xxhash64(null)` yields the seed, not null, so an
    * unguarded hash would count null as a phantom distinct value.
    */
  def kmvSketch(key: Column, k: Int): Column =
    call_function("kmv_sketch",
      when(key.isNotNull, shiftrightunsigned(xxhash64(key), 1)), lit(k))

  private val Norm: Double = Math.pow(2.0, 63)

  /** Distinct-count estimate of A ∪ B from two k-sized sketch arrays:
    * the k smallest of the merged hash sets form a valid KMV sketch of
    * the union (native array ops only — stays inside codegen).
    */
  def unionEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    when(size(merged) < k, size(merged).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Norm) /
        element_at(merged, k).cast("double"))
  }

  /** Jaccard estimate |A∩B| / |A∪B|: fraction of the union sketch's
    * members present in BOTH input sketches (Beyer et al.'s resemblance
    * estimator over the combined k-sample).
    */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val merged = slice(array_sort(array_union(a, b)), 1, k)
    size(array_intersect(array_intersect(merged, a), b)).cast("double") /
      size(merged).cast("double")
  }

  /** Intersection-size estimate: jaccard × union estimate. */
  def intersectEstimate(a: Column, b: Column, k: Int): Column =
    jaccardEstimate(a, b, k) * unionEstimate(a, b, k)
}

case class KmvSketchAggregate(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => other.eval().asInstanceOf[Int]
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("sketch", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      // foldable + k >= 2 at ANALYSIS: a column-valued k would NPE on
      // the executor, k <= 0 crashes boundedAdd's last() on an empty
      // TreeSet, and k = 1 estimates (k-1)/u_k = 0 always
      case (LongType, IntegerType) if !kExpr.foldable =>
        TypeCheckResult.TypeCheckFailure("kmv_sketch's k must be a literal")
      case (LongType, IntegerType)
          if Option(kExpr.eval()).forall(_.asInstanceOf[Int] < 2) =>
        TypeCheckResult.TypeCheckFailure("kmv_sketch's k must be >= 2")
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (c, kk) => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects (BIGINT hash, INT k), got (${c.sql}, ${kk.sql})")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def boundedAdd(
      buffer: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buffer.size < k) { buffer.add(h); () }
    else if (h < buffer.last()) {
      if (buffer.add(h)) buffer.pollLast()
      ()
    }
  }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) boundedAdd(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) boundedAdd(b1, it.next())
    b1
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    val estimate =
      if (arr.length < k) arr.length.toDouble
      else (k - 1).toDouble * Math.pow(2.0, 63) / arr(k - 1).toDouble
    InternalRow(estimate, new GenericArrayData(arr))
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => s.add(bb.getLong))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAggregate =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
