package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.IronmanExprs

/** Typed DataFrame builders for the dashboard views (SURVEY §7.1 step 5:
  * "the 15 dashboard queries as both SQL strings and typed DataFrame
  * builders"). The SQL definitions in [[Views]] are the contract; these
  * builders express the same plans through the Column API — equivalence
  * is asserted in TypedViewsSpec. Representative set: a plain
  * conditional-agg view, a windowed share-of-total view, and a
  * dim-joined view.
  */
object TypedViews {

  private def finisherFlagSum: Column =
    sum(when(col("is_finisher"), 1).otherwise(0))

  /** vw_athletes_by_year (05_dashboard_queries.ipynb:108-160). */
  def athletesByYear(fact: DataFrame): DataFrame =
    fact.groupBy(col("year"), col("source_gender").as("gender"))
      .agg(
        count(lit(1)).as("total_athletes"),
        finisherFlagSum.as("finishers"),
        sum(when(col("is_dnf"), 1).otherwise(0)).as("dnf"),
        sum(when(col("is_dns"), 1).otherwise(0)).as("dns"),
        round(finisherFlagSum * 100.0 / count(lit(1)), 1).as("finish_rate_pct"))
      .orderBy(col("year"), col("gender"))

  /** vw_gender_distribution (05:220-273) — agg then window share. */
  def genderDistribution(fact: DataFrame): DataFrame = {
    val agged = fact.groupBy(col("year"), col("source_gender"))
      .agg(count(lit(1)).as("athletes"))
    val w = Window.partitionBy(col("year"))
    agged
      .select(
        col("year"),
        IronmanExprs.genderLabelPassthrough(col("source_gender")).as("gender"),
        col("athletes"),
        round(col("athletes") * 100.0 / sum(col("athletes")).over(w), 1)
          .as("percentage"))
      .orderBy(col("year"), col("source_gender"))
  }

  /** vw_pro_vs_age_group (05:746-800) — dim join + conditional aggs. */
  def proVsAgeGroup(fact: DataFrame, dimDivisions: DataFrame): DataFrame = {
    val d = dimDivisions.select(col("division_key"), col("is_professional"))
    fact.join(broadcast(d), Seq("division_key"), "left")
      .filter(col("is_professional").isNotNull)
      .groupBy(col("year"), col("is_professional"))
      .agg(
        count(lit(1)).as("athletes"),
        finisherFlagSum.as("finishers"),
        round(finisherFlagSum * 100.0 / count(lit(1)), 1).as("finish_rate_pct"),
        round(avg(when(col("is_finisher"), col("finish_time_seconds"))) / 3600, 2)
          .as("avg_finish_hours"),
        round(min(when(col("is_finisher"), col("finish_time_seconds"))) / 3600, 2)
          .as("fastest_hours"))
      .select(
        col("year"),
        when(col("is_professional"), "Professional").otherwise("Age Group")
          .as("category"),
        col("athletes"), col("finishers"), col("finish_rate_pct"),
        col("avg_finish_hours"), col("fastest_hours"))
      .orderBy(col("year"), col("category"))
  }
}
