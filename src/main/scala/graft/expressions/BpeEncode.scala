package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** bpe_encode(text): byte-pair-encoding tokenization with a FIXED merge
  * table learned by [[graft.operators.Bpe.train]] — the apply half of a
  * tokenizer, run corpus-wide as a scan-speed projection.
  *
  * The merge list is baked into the expression as a reference object
  * (same pattern as [[QuantileBucketExpr]]'s boundary array): training
  * produces at most vocab-size merges (KBs), so shipping them inside the
  * serialized expression costs nothing and every executor tokenizes
  * with zero extra I/O or shuffle.
  *
  * Evaluation is the classic greedy BPE loop — split a word into
  * single-character symbols, repeatedly merge the adjacent pair with the
  * LOWEST merge rank (all its non-overlapping occurrences, left to
  * right) until no adjacent pair is in the table. Per-row work is
  * iterative and data-dependent, so this is a deliberate
  * [[CodegenFallback]]: the loop is plain JVM code either way, and a
  * per-task memoization cache (word → tokens; natural-language corpora
  * repeat words heavily) does more for throughput than codegen would.
  */
object BpeEncode {

  def register(spark: SparkSession): Unit =
    graft.GraftFunctions.registerIfAbsent(spark.sessionState.functionRegistry, 
      "bpe_encode",
      exprs => BpeEncodeExpr(exprs(0), extractMerges(exprs(1)).toSeq),
      "built-in")

  /** Column API: tokenize `text` with the trained merge list. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text,
      lit(merges.map { case (a, b) => s"$a $b" }.toArray))

  private[graft] def extractMerges(e: Expression): Array[(String, String)] = {
    def fromArrayData(arr: ArrayData): Array[(String, String)] =
      arr.toArray[UTF8String](StringType).map { s =>
        val parts = s.toString.split(' ')
        (parts(0), parts(1))
      }
    e match {
      case Literal(arr: ArrayData, ArrayType(StringType, _)) => fromArrayData(arr)
      // SQL callers pass array('a b', ...) — foldable but not yet folded
      // to a Literal when the function builder runs
      case other if other.foldable && (other.dataType match {
          case ArrayType(StringType, _) => true; case _ => false }) =>
        fromArrayData(other.eval().asInstanceOf[ArrayData])
      case other => throw new IllegalArgumentException(
        s"bpe_encode merges must be a literal array<string>, got $other")
    }
  }

  /** Greedy rank-ordered BPE of one word. Shared by eval and tests.
    * Splits by CODE POINT, matching the trainer's split(w, "") code-
    * point semantics — toCharArray would shear an astral-plane char
    * (emoji) into two lone surrogates that no trained merge matches
    * and that serialize as replacement bytes.
    */
  def encodeWord(rank: Map[(String, String), Int], word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        out += word.substring(i, i + n)
        i += n
      }
      out.toArray
    }
    var done = false
    while (!done && syms.length >= 2) {
      // best-ranked adjacent pair present in the table
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge every non-overlapping occurrence, left to right
        val target = best
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == target) {
            out += syms(j) + syms(j + 1)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
    }
    syms
  }
}

// merges ride as a Seq: a case-class Array field compares by
// REFERENCE, breaking semanticEquals between identical calls
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects STRING input, got ${other.sql}")
  }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  // per-task word memo: tokenizing "the" once per partition, not once
  // per occurrence. Bounded so a high-cardinality column can't leak.
  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, Array[UTF8String]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Array[UTF8String]]): Boolean =
        size() > 65536
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = mutable.ArrayBuffer.empty[UTF8String]
    val words = text.trim.split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        var toks = memo.get(w)
        if (toks == null) {
          toks = BpeEncode.encodeWord(rank, w).map(UTF8String.fromString)
          memo.put(w, toks)
        }
        out ++= toks
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
