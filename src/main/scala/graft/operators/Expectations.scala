package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Delta Live Tables
  * `expect` / `expect_or_drop` analog for this engine: named boolean
  * conditions over a frame, with per-row quarantine and in-flight
  * metrics.
  *
  * Scale design: everything is ONE map-side pass. The failed-expectation
  * list is a codegen'd array of CASE WHENs (no UDF, no second scan), the
  * valid/quarantine split reuses it, and counters ride on Spark's
  * `observe` API — metrics accumulate inside whatever action runs anyway
  * instead of a separate aggregation job per expectation (the way a
  * naive `df.filter(cond).count()` per rule would re-scan the table N
  * times at 100 TB).
  *
  * Null semantics follow DLT: a NULL condition is a violation (the row
  * is not provably valid).
  */
object Expectations {

  final case class Expectation(name: String, condition: Column)

  def expect(name: String, condition: Column): Expectation =
    Expectation(name, condition)

  /** Add `failed_expectations: array<string>` — the (sorted) names of
    * every violated expectation, empty for fully-valid rows.
    */
  def annotate(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "at least one expectation required")
    // stacked annotation would silently OVERWRITE (and valid() would
    // then drop) an upstream violation record — refuse instead
    require(!df.columns.contains("failed_expectations"),
      "input already carries failed_expectations — merge or rename the " +
        "upstream annotation before re-annotating")
    val failed = exps.map(e =>
      when(coalesce(e.condition, lit(false)), lit(null).cast("string"))
        .otherwise(lit(e.name)))
    df.withColumn("failed_expectations",
      array_sort(filter(array(failed: _*), c => c.isNotNull)))
  }

  /** Rows passing EVERY expectation (annotation column dropped). */
  def valid(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    annotate(df, exps)
      .filter(size(col("failed_expectations")) === 0)
      .drop("failed_expectations")

  /** Rows violating at least one expectation, with the violated names
    * attached — the quarantine feed.
    */
  def quarantine(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    annotate(df, exps).filter(size(col("failed_expectations")) > 0)

  /** Attach observe()-based metrics: total rows plus one violation
    * counter per expectation, collected during the caller's next action
    * on the returned frame — zero extra jobs. Read them from the
    * returned [[Observation]] after acting.
    */
  def observed(df: DataFrame, exps: Seq[Expectation],
      name: String = "expectations"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      exps.map(e => count_if(!coalesce(e.condition, lit(false)))
        .as(s"failed_${e.name}"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
