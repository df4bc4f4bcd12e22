package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2, expressed as a Spark DataFrame build
  * plus (when SQL-expressible) an equivalent ANSI SQL oracle that DuckDB
  * runs over the same parquet tables.
  *
  * Determinism contract (driver hashes values after sorting columns by
  * name): every query output is totally ordered by an explicit orderBy,
  * every computed column is aliased identically on both sides, and
  * floating aggregates pass through DECIMAL(18,2) so sums are exact and
  * order-independent in both engines.
  */
final case class OpQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpQuery {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, build, None)
}
