package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated synthetic tables (see TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. All
  * queries in [[SparkEntry.queries]] resolve their inputs through here so
  * the scale factor is a pure parameter.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself, so SQL text
    * identical to the DuckDB oracle runs on Spark too.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
