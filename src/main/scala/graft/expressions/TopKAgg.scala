package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded-heap top-k-by-score aggregate.
  *
  * Why custom: the composable top-k form (`row_number() OVER (PARTITION
  * BY query ORDER BY score DESC)` then `rank <= k`) funnels EVERY scored
  * row of a group through the single reducer that sorts that group —
  * for similarity search that is the whole corpus per query. As a
  * [[TypedImperativeAggregate]] the top-k runs with partial aggregation:
  * map tasks maintain k-element heaps, only k-sized buffers cross the
  * wire per (group × map task), and the final merge is k·log k. The
  * shuffle volume drops from |corpus| rows per query to k rows per map
  * partition per query.
  *
  * `topk_by(score, id, k)` → `array<struct<corpus_id: bigint, score:
  * double>>` sorted by (score desc, id asc) — the id tiebreak keeps
  * results deterministic under any partitioning.
  */
object TopKAgg {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "topk_by",
      exprs => TopKAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")

  /** topk_by(score, id, k) → array<struct<corpus_id, score>> (desc). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score, id, org.apache.spark.sql.functions.lit(k))
}

case class TopKAggregate(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val k: Int = {
    val v = kExpr match {
      case Literal(value: Int, IntegerType) => value
      case other => Option(other.eval()).map(_.asInstanceOf[Int]).getOrElse(0)
    }
    require(v > 0, s"topk_by k must be a positive integer literal, got $v")
    v
  }

  // dequeue yields the WORST element (lowest score; ties: highest id),
  // so a full heap evicts correctly in O(log k)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("corpus_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType, kExpr.dataType) match {
      case (DoubleType, LongType, IntegerType) if kExpr.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (DoubleType, LongType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "topk_by's k must be a literal") // column k would fail mid-job
      case (s, i, kt) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_by expects (DOUBLE, BIGINT, INT), got (${s.sql}, ${i.sql}, ${kt.sql})")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      buffer: mutable.PriorityQueue[(Double, Long)],
      score: Double, id: Long): Unit = {
    if (buffer.size < k) {
      buffer.enqueue((score, id))
    } else {
      val (worstScore, worstId) = buffer.head
      if (score > worstScore || (score == worstScore && id < worstId)) {
        buffer.dequeue()
        buffer.enqueue((score, id))
      }
    }
  }

  override def update(
      buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // NaN scores are unrankable AND poisonous: under the total Double
    // ordering NaN sorts above every real, so one NaN at the heap's
    // head makes both eviction comparisons false forever — the
    // aggregate would silently return the first-k arrival order
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      offer(buffer, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => offer(b1, s, i) }
    b1
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buffer.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val pq = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
    while (bb.remaining() >= 16) {
      val s = bb.getDouble
      val i = bb.getLong
      pq.enqueue((s, i))
    }
    pq
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
