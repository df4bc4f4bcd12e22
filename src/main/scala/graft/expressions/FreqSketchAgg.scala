package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Misra–Gries frequency sketch over BIGINT keys: at most `k` counters
  * per aggregation buffer, single pass, mergeable — the bounded-memory
  * heavy-hitter detector (top domains, boilerplate templates, hot join
  * keys) for streams/corpora whose key cardinality dwarfs memory.
  *
  * Guarantees (spec-pinned): every key with true count > n/(k+1) SURVIVES
  * into the sketch, and each reported count is a LOWER bound within
  * n/(k+1) of truth. Merge = add counts, then decrement by the (k+1)-th
  * largest and drop non-positives (Agarwal et al.'s mergeable-summaries
  * construction), preserving both bounds.
  *
  * Completes the sketch family next to HLL (approx distinct), MinHash
  * (jaccard), SimHash (hamming), and bloom (membership): frequency.
  */
object FreqSketchAgg {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "freq_sketch",
      exprs => FreqSketchAggregate(exprs(0), exprs(1)),
      "built-in")

  /** freq_sketch(key, k) → array<struct<key:bigint, count_lower:bigint>>
    * sorted by descending lower-bound count.
    */
  def freqSketch(key: Column, k: Int): Column =
    call_function("freq_sketch", key, org.apache.spark.sql.functions.lit(k))
}

case class FreqSketchAggregate(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) => v
    case other => other.eval().asInstanceOf[Int]
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(containsNull = false,
    elementType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("count_lower", LongType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      // foldable + k >= 1 at ANALYSIS: a column-valued k would NPE on
      // the executor; k <= 0 silently returns an empty sketch
      case (LongType, IntegerType) if !kExpr.foldable =>
        TypeCheckResult.TypeCheckFailure("freq_sketch's k must be a literal")
      case (LongType, IntegerType)
          if Option(kExpr.eval()).forall(_.asInstanceOf[Int] < 1) =>
        TypeCheckResult.TypeCheckFailure("freq_sketch's k must be >= 1")
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (c, kk) => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch expects (BIGINT, INT), got (${c.sql}, ${kk.sql})")
    }

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(
      buffer: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (buffer.containsKey(key)) buffer.put(key, buffer.get(key) + 1)
      else if (buffer.size < k) buffer.put(key, 1L)
      else decrementAll(buffer, 1L)
    }
    buffer
  }

  /** Classic MG step: a miss with a full table decrements every counter
    * (dropping zeros) instead of evicting — O(k), amortized constant.
    */
  private def decrementAll(buffer: java.util.HashMap[Long, Long], by: Long): Unit = {
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def merge(
      b1: java.util.HashMap[Long, Long],
      b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b2.forEach((key, cnt) => b1.merge(key, cnt, (a, b) => a + b))
    if (b1.size > k) {
      // decrement by the (k+1)-th largest count so at most k survive
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(counts.length - k - 1))
    }
    b1
  }

  override def eval(buffer: java.util.HashMap[Long, Long]): Any = {
    val entries = buffer.entrySet().toArray(
      new Array[java.util.Map.Entry[Long, Long]](buffer.size))
    // descending count, key asc for determinism given identical counts
    java.util.Arrays.sort(entries, new java.util.Comparator[java.util.Map.Entry[Long, Long]] {
      override def compare(a: java.util.Map.Entry[Long, Long],
          b: java.util.Map.Entry[Long, Long]): Int = {
        val c = java.lang.Long.compare(b.getValue, a.getValue)
        if (c != 0) c else java.lang.Long.compare(a.getKey, b.getKey)
      }
    })
    new GenericArrayData(entries.map(e =>
      InternalRow(e.getKey.longValue(), e.getValue.longValue())): Array[Any])
  }

  override def serialize(buffer: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    buffer.forEach((key, cnt) => { bb.putLong(key); bb.putLong(cnt) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Long](n * 2)
    (0 until n).foreach(_ => m.put(bb.getLong, bb.getLong))
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAggregate =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
