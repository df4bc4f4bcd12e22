package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** S13 — JDBC extract parity. In the reference this step runs OUTSIDE
  * Spark (Airflow task `extract_postgres_to_adls`, ironman_dag.py:60-88:
  * `SELECT * FROM "<year>_<gender>"` against Postgres, landed as CSV);
  * the Spark-native equivalent is `spark.read.jdbc` with a partitioned
  * range scan, so the extract itself distributes: each task issues its
  * own bounded `WHERE key BETWEEN lo AND hi` query instead of one
  * driver-side cursor streaming the whole table.
  *
  * The gate stands up an embedded Derby database (the JDBC engine that
  * ships with Spark), loads the customer slice into it over JDBC, reads
  * it back partitioned, and oracle-compares against the same parquet
  * slice — proving the round trip loses/changes nothing.
  */
object JdbcQueries {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  val s13_jdbc_extract = OpQuery(
    "s13_jdbc_extract",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val db = graft.queries.GateScratch.dir("graft-jdbc-").resolve("extractdb")
    val url = s"jdbc:derby:$db;create=true"
    val src = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    src.write.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "customers")
      .mode("overwrite").save()
    // partition bounds: one 2-value aggregate to the driver (same shape
    // as Spark's own JDBC partitioning requires)
    val bounds = src.agg(min("c_custkey"), max("c_custkey")).head()
    spark.read.format("jdbc")
      .option("url", url).option("driver", driver)
      .option("dbtable", "customers")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", bounds.getLong(0))
      .option("upperBound", bounds.getLong(1) + 1)
      .option("numPartitions", 8)
      .load()
      .orderBy(col("c_custkey"))
  }

  val all: Seq[OpQuery] = Seq(s13_jdbc_extract)
}
