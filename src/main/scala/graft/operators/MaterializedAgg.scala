package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized GROUP BY aggregate from a
  * row-level change feed — the lakehouse pattern that turns "recompute
  * the gold table nightly" into "apply the delta": COUNT and SUM are
  * abelian, so an insert contributes +x and a delete −x, and the
  * maintained state is exact for ANY interleaving of changes.
  *
  * Cost shape at 100 TB: [[applyDelta]] aggregates the CHANGES (one
  * shuffle over the delta, usually orders of magnitude smaller than the
  * table) and full-outer-joins the per-key delta into the state — both
  * keyed on the group columns, never a scan of the base table. Paired
  * with [[TableStore.changes]] (log-less CDF) or any CDC source with
  * insert/delete tags.
  *
  * Contract: `sums` columns must be non-null in changed rows (SUM's
  * null-skipping is not incrementally decomposable — a group whose last
  * non-null value departs cannot be told apart from one that never had
  * any without a per-group non-null count; pipelines needing that add
  * `count(col)` as another maintained aggregate). Groups whose
  * maintained count reaches 0 drop out, matching a full recompute.
  */
object MaterializedAgg {

  private def cntCol = "__mv_count"
  private def sumCol(c: String) = s"sum_$c"

  /** Full computation of the maintained aggregate — the bootstrap, and
    * the recompute [[applyDelta]] must stay bit-equal to.
    */
  def compute(df: DataFrame, keys: Seq[String], sums: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(cntCol),
        sums.map(c => sum(col(c)).as(sumCol(c))): _*)

  /** Apply a change feed (rows tagged `insert` / `delete` in
    * `changeTypeCol`, the [[TableStore.changes]] schema) to a
    * materialized state produced by [[compute]] / a prior applyDelta.
    */
  def applyDelta(state: DataFrame, changes: DataFrame,
      keys: Seq[String], sums: Seq[String],
      changeTypeCol: String = "_change_type"): DataFrame = {
    val sign = when(col(changeTypeCol) === "insert", lit(1L))
      .when(col(changeTypeCol) === "delete", lit(-1L))
    val signed = changes.withColumn("__sign",
      coalesce(sign, raise_error(concat(lit("unknown change type: "),
        col(changeTypeCol)))))
    val delta = signed.groupBy(keys.map(col): _*)
      .agg(sum(col("__sign")).as("__d_cnt"),
        sums.map(c => sum(col(c) * col("__sign")).as(s"__d_$c")): _*)
    state.join(delta, keys, "full_outer")
      .select(
        keys.map(col) ++
          Seq((coalesce(col(cntCol), lit(0L)) + coalesce(col("__d_cnt"), lit(0L)))
            .as(cntCol)) ++
          sums.map { c =>
            // sum types widen under the *sign multiply (decimal scale,
            // int→long); cast the delta back onto the state's type so
            // maintained output keeps the compute() schema
            val stateType = state.schema(sumCol(c)).dataType
            (coalesce(col(sumCol(c)), lit(0).cast(stateType)) +
              coalesce(col(s"__d_$c").cast(stateType), lit(0).cast(stateType)))
              .cast(stateType).as(sumCol(c))
          }: _*)
      .filter(col(cntCol) > 0)
  }
}
