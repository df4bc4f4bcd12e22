package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema-drift tolerance (SURVEY §1.3): a bronze slice missing a time
  * column (possible via unionByName(allowMissingColumns) on a drifted
  * landing file) must still build silver — the missing column's
  * _seconds lands as NULL and the 45-column schema stays stable.
  */
class SilverDriftSpec extends SparkSpec {
  import spark.implicits._

  test("silver builds when a time column is absent from bronze") {
    val bronze = Seq(
      ("2023_M_x_1", 2023, "X Y", "US", "Finisher", "1", "0:50:00",
        "5:00:00", "3:00:00", "9:00:00", "f.csv"))
      .toDF("row_key", "year", "athlete_name", "country", "designation",
        "rank", "swim_time", "bike_time", "run_time", "finish_time", "source_file")
      .withColumn("load_timestamp", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .withColumn("load_date", lit(java.sql.Date.valueOf("2026-01-01")))
    // no transition_1 / transition_2 / bib / division / points columns
    val silver = Silver.build(bronze, None)
    val row = silver.head()
    assert(silver.columns.contains("transition_1_seconds"))
    assert(row.isNullAt(silver.columns.indexOf("transition_1_seconds")))
    assert(row.getInt(silver.columns.indexOf("swim_time_seconds")) == 3000)
    // calculated total propagates the null transition (D6 semantics)
    assert(row.isNullAt(silver.columns.indexOf("calculated_total_seconds")))
    assert(row.getBoolean(silver.columns.indexOf("is_finisher")))
  }
}
