package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` to
  * HyperLogLog++ when `spark.graft.approxDistinct.enabled=true`.
  *
  * The at-scale rationale: exact count-distinct plans a two-phase Expand
  * + double shuffle; HLL++ is a single-pass partial aggregate with a
  * fixed-size sketch buffer — at 100 TB the difference is a full extra
  * shuffle of the distinct keys. Dashboards that tolerate ±5% opt in per
  * session (or per query via the SQL conf) without rewriting any SQL —
  * the rule keeps the query surface unchanged.
  *
  * Deliberately conservative: only single-argument, unfiltered
  * COUNT(DISTINCT) is rewritten; multi-column distinct and FILTER
  * clauses keep exact semantics.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").toBoolean
  private def rsd: Double =
    SQLConf.get.getConfString(RsdKey, "0.05").toDouble

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    // transformWithSubqueries so COUNT(DISTINCT) nested in scalar/IN
    // subqueries is rewritten too, not just top-level aggregates
    else plan.transformWithSubqueries {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child, rsd),
              isDistinct = false)
        }
    }
}

/** Entry point for `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Injects the optimizer rule, the interval-join physical strategy, AND
  * the engine's full SQL-function surface ([[graft.GraftFunctions]]) —
  * a user who only sets the config runs `spark.sql("SELECT
  * vec_dot(...)" )` with no Scala imports.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ApproxDistinctRule)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    graft.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.GraftFunctions", name),
        builder))
    }
  }
}
