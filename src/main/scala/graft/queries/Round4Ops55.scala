package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TypedAggs

/** Round-4 batch 55: the typed Aggregator user-extension point. */
object Round4Ops55 {

  /** Custom typed Aggregator (quantity-weighted mean price in exact
    * integer arithmetic) registered as a UDAF and driven through
    * groupBy — proving the user-facing Aggregator API against the
    * relational oracle. Two-phase aggregation still applies (partials
    * map-side), so the extension point scales like a built-in agg; the
    * engine's OWN operators stay on codegen'd expressions, as
    * documented in [[TypedAggs]].
    */
  val a42_typed_aggregator = OpQuery(
    "a42_typed_aggregator",
    """SELECT l_returnflag,
      |       CAST(ROUND(CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |                  / SUM(CAST(l_quantity AS BIGINT)), 4) AS DOUBLE) AS weighted_mean_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val wmean = udaf(TypedAggs.WeightedMeanCents)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice")).cast("long").as("v"),
        col("l_quantity").cast("long").as("w"))
    li.groupBy("l_returnflag")
      .agg(round(wmean(col("v"), col("w")), 4).as("weighted_mean_price"))
      .orderBy("l_returnflag")
  }

  val all: Seq[OpQuery] = Seq(a42_typed_aggregator)
}
