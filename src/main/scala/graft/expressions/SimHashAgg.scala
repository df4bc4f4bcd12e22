package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** 64-bit SimHash signature as a single custom aggregate: the composable
  * form is 64 conditional-sum columns (one per bit), which — like the
  * pre-[[MinHashAggregate]] minhash — costs more in generated-class
  * compilation than in data. Here the bit votes live in one long[64]
  * buffer updated in a tight loop; eval folds the vote signs into the
  * signature.
  */
object SimHashAgg {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "simhash_sig",
      exprs => SimHashAggregate(exprs.head),
      "built-in")

  /** simhash_sig(tokenHash64) → bigint signature. */
  def simhashSig(tokenHash: Column): Column =
    call_function("simhash_sig", tokenHash)
}

case class SimHashAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects BIGINT, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        buffer(k) += (if (((h >>> k) & 1L) == 1L) 1L else -1L)
        k += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < 64) { b1(k) += b2(k); k += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (buffer(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAggregate =
    copy(child = newChildren.head)
}
