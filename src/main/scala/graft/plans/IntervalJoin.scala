package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Interval-join planner strategy — the custom-physical-operator rung of
  * the extension ladder (Expression → Rule → Strategy+SparkPlan).
  *
  * Vanilla Spark plans a pure range predicate
  * `r.lo <= l.v AND l.v <= r.hi` as BroadcastNestedLoopJoin: every
  * (left, right) pair is compared — O(|L|·|R|). This strategy recognizes
  * the shape on integral columns, collects the (small, stats-bounded)
  * interval side once, builds a sorted-by-lo array augmented with a
  * max-hi segment tree, and probes it per left row: O(log n + matches)
  * per probe instead of O(n) — the interval-join optimization databases
  * (and Databricks' range-join hint) implement natively.
  *
  * Scope guards: inner join, condition is EXACTLY the two inclusive
  * range conjuncts (an extra equi-key means the equi-join bucketed
  * rewrite in [[graft.operators.RangeJoin]] is the better plan — its
  * shuffle distributes, this broadcast doesn't), point and bounds are
  * integral types (exact ordering, no float-boundary surprises), and
  * the interval side's stats fit the broadcast threshold. Anything else
  * falls through to the default planner untouched.
  *
  * Activate per session via `spark.experimental.extraStrategies` or
  * globally through [[GraftExtensions]].
  */
object IntervalJoinStrategy extends SparkStrategy {

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** (point, lo, hi, loStrict, hiStrict) if `cond` is a two-sided
    * integral range of a left-side point against right-side bounds.
    */
  private def extract(
      cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean, Boolean)] = {
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    // normalize each conjunct to (point, bound, isLower, isStrict);
    // strict bounds shift to inclusive at build time (integral ±1)
    def asBound(c: Expression): Option[(Expression, Expression, Boolean, Boolean)] =
      c match {
        case GreaterThanOrEqual(v, b) if fromLeft(v) && fromRight(b) => Some((v, b, true, false))
        case LessThanOrEqual(b, v) if fromLeft(v) && fromRight(b) => Some((v, b, true, false))
        case GreaterThan(v, b) if fromLeft(v) && fromRight(b) => Some((v, b, true, true))
        case LessThan(b, v) if fromLeft(v) && fromRight(b) => Some((v, b, true, true))
        case LessThanOrEqual(v, b) if fromLeft(v) && fromRight(b) => Some((v, b, false, false))
        case GreaterThanOrEqual(b, v) if fromLeft(v) && fromRight(b) => Some((v, b, false, false))
        case LessThan(v, b) if fromLeft(v) && fromRight(b) => Some((v, b, false, true))
        case GreaterThan(b, v) if fromLeft(v) && fromRight(b) => Some((v, b, false, true))
        case _ => None
      }
    cond match {
      case And(c1, c2) =>
        (asBound(c1), asBound(c2)) match {
          case (Some((v1, lo, true, ls)), Some((v2, hi, false, hs)))
              if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(integral) =>
            Some((v1, lo, hi, ls, hs))
          case (Some((v1, hi, false, hs)), Some((v2, lo, true, ls)))
              if v1.semanticEquals(v2) && Seq(v1, lo, hi).forall(integral) =>
            Some((v1, lo, hi, ls, hs))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, Inner, Some(cond), _) =>
      val threshold = math.max(SQLConf.get.autoBroadcastJoinThreshold, 10L << 20)
      extract(cond, left, right) match {
        case Some((v, lo, hi, ls, hs)) if right.stats.sizeInBytes <= threshold =>
          IntervalJoinExec(planLater(left), planLater(right), v, lo, hi, ls, hs) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Broadcast interval join: the right (interval) side is collected,
  * sorted by lo, and indexed by a max-hi segment tree; each left row
  * stabs the index. Matches `lo <= v AND v <= hi` with inclusive bounds;
  * rows with null point or null bounds never match (inner-join
  * semantics of a null predicate).
  */
case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    v: Expression,
    lo: Expression,
    hi: Expression,
    loStrict: Boolean = false,
    hiStrict: Boolean = false)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of build-side intervals"))

  private def toLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    // driver-side build (stats-guarded by the strategy): evaluate bounds,
    // drop null intervals, sort by lo
    val collected = right.executeCollect()
    // strict bounds shift to inclusive in the Long domain; a strict
    // bound at the domain edge (lo = MaxValue / hi = MinValue) can never
    // match, as can any interval that inverts after the shift
    val triples = collected.flatMap { r =>
      val l = loB.eval(r)
      val h = hiB.eval(r)
      if (l == null || h == null) None
      else {
        val l0 = toLong(l)
        val h0 = toLong(h)
        if ((loStrict && l0 == Long.MaxValue) || (hiStrict && h0 == Long.MinValue)) None
        else {
          val la = if (loStrict) l0 + 1 else l0
          val ha = if (hiStrict) h0 - 1 else h0
          if (la > ha) None else Some((la, ha, r))
        }
      }
    }.sortBy(_._1)
    val n = triples.length
    val loArr = Array.tabulate(n)(i => triples(i)._1)
    val hiArr = Array.tabulate(n)(i => triples(i)._2)
    val rows = Array.tabulate(n)(i => triples(i)._3)
    // segment tree over hiArr maxima: size = next power of two
    val size = if (n == 0) 1 else Integer.highestOneBit(math.max(1, n * 2 - 1))
    val tree = Array.fill(2 * size)(Long.MinValue)
    var i = 0
    while (i < n) { tree(size + i) = hiArr(i); i += 1 }
    i = size - 1
    while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i -= 1 }
    metrics("numIntervals").add(n)
    val numOutputRows = metrics("numOutputRows")
    val bc = sparkContext.broadcast((loArr, tree, rows, size))

    left.execute().mapPartitions { iter =>
      val (bLo, bTree, bRows, bSize) = bc.value
      val vB = BindReferences.bindReference(v, left.output)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)
      iter.flatMap { lrow =>
        val pv = vB.eval(lrow)
        if (pv == null || bLo.length == 0) Iterator.empty
        else {
          val q = toLong(pv)
          // k = first index with lo > q (binary search upper bound)
          var a = 0
          var b = bLo.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (bLo(m) <= q) a = m + 1 else b = m
          }
          val k = a
          if (k == 0) Iterator.empty
          else {
            // collect indices in [0, k) with hi >= q by descending the
            // max-hi tree, pruning subtrees whose max < q
            val out = Array.newBuilder[Int]
            def visit(node: Int, lop: Int, hip: Int): Unit = {
              if (lop >= k || bTree(node) < q) return
              if (node >= bSize) { out += (node - bSize); return }
              val mid = (lop + hip) >>> 1
              visit(2 * node, lop, mid)
              visit(2 * node + 1, mid, hip)
            }
            visit(1, 0, bSize)
            out.result().iterator.map { idx =>
              numOutputRows += 1
              proj(joined(lrow, bRows(idx)))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
