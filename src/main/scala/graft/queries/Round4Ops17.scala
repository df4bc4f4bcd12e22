package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 17: boolean aggregates and the Spark-4 VARIANT type. */
object Round4Ops17 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Boolean aggregate family: every / any / count_if per group —
    * assertion-style aggregates (DuckDB twins bool_and / bool_or /
    * count_if).
    */
  val a23_bool_aggs = OpQuery(
    "a23_bool_aggs",
    """SELECT l_returnflag,
      |       bool_and(l_quantity > 0) AS all_positive_qty,
      |       bool_or(l_discount > 0.09) AS any_deep_discount,
      |       CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        every(col("l_quantity") > 0).as("all_positive_qty"),
        some(col("l_discount") > 0.09).as("any_deep_discount"),
        count_if(col("l_tax") === 0).as("n_tax_free"))
      .orderBy(col("l_returnflag"))
  }

  /** Spark-4 VARIANT: semi-structured payloads parsed once into the
    * binary variant encoding, fields extracted with typed paths —
    * the open-format answer to schema-on-read JSON columns. The oracle
    * extracts the same paths with DuckDB's JSON functions.
    */
  val p12_variant = OpQuery(
    "p12_variant",
    """SELECT CAST(json_extract(props, '$.k') AS INT) % 7 AS k_mod,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
      |       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_mod""".stripMargin) { (spark, dir) =>
    t(spark, dir, "events")
      .select(parse_json(col("props")).as("v"))
      .select(expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy((col("k") % 7).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("k_mod"))
  }

  val all: Seq[OpQuery] = Seq(a23_bool_aggs, p12_variant)
}
