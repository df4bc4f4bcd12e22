package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed [[Aggregator]]s — the THIRD extension point the
  * engine exposes (after inlined SQL functions and native Catalyst
  * expressions): type-safe custom aggregation for users who need
  * arbitrary JVM logic in an aggregate.
  *
  * Position in the hierarchy (and why it is last): an Aggregator runs
  * as a JVM black box — no codegen, serialization at the
  * partial/merge boundary — so the engine's own operators use
  * TypedImperativeAggregate / native expressions instead. But partial
  * aggregation STILL applies (reduce runs map-side, merge combines
  * partials), so a user Aggregator scales like any two-phase agg:
  * shuffle volume is one buffer per group per partition, never raw rows.
  */
object TypedAggs {

  /** Exact weighted mean in integer arithmetic: Σ(v·w) and Σw carried
    * as Longs (exact, order-free), divided once at finish.
    */
  final case class WSum(num: Long, den: Long)

  object WeightedMeanCents extends Aggregator[(Long, Long), WSum, Double] {
    override def zero: WSum = WSum(0L, 0L)
    override def reduce(b: WSum, a: (Long, Long)): WSum =
      WSum(b.num + a._1 * a._2, b.den + a._2)
    override def merge(x: WSum, y: WSum): WSum =
      WSum(x.num + y.num, x.den + y.den)
    override def finish(r: WSum): Double =
      if (r.den == 0) 0.0 else r.num.toDouble / r.den
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
