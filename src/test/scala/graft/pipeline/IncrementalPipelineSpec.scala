package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental-run semantics (D13 + S6/S7): full-load 2023+2024, then an
  * incremental 2025 run must insert-only the fact/bronze/silver rows and
  * SCD1-refresh the dims — including the reference's deliberate quirk
  * that `dim_countries.athlete_count` reflects ONLY the latest processed
  * year after an incremental run (SURVEY §7.4, 04b:344-350).
  */
class IncrementalPipelineSpec extends SparkSpec {

  private val dataDir = "/root/reference/ironman_scraper/Data"
  private val files2324 = Seq(
    LandingFile(s"$dataDir/2023_men.csv", 2023, "M"),
    LandingFile(s"$dataDir/2023_women.csv", 2023, "F"),
    LandingFile(s"$dataDir/ironman_kona_2024_men_complete_results.csv", 2024, "M"),
    LandingFile(s"$dataDir/ironman_kona_2024_women_complete_results.csv", 2024, "F"))
  private val files25 = Seq(
    LandingFile(s"$dataDir/ironman_kona_2025_men_complete_results.csv", 2025, "M"),
    LandingFile(s"$dataDir/ironman_kona_2025_women_complete_results.csv", 2025, "F"))

  private val clock = Some(Timestamp.valueOf("2026-01-01 00:00:00"))

  test("incremental 2025 run inserts only new rows and SCD1-refreshes dims") {
    val wh = Files.createTempDirectory("graft-incr-").toString
    // full load of 2023+2024
    val store = Pipeline.run(spark,
      PipelineConfig(PipelineConfig.FullLoad, None, files2324, wh), clock)
    val factBefore = store.read(PipelineConfig.tables.fact).count()
    val countsBefore = store.read(PipelineConfig.tables.dimCountries)
      .select(sum(col("athlete_count"))).head().getLong(0)
    assert(factBefore == 12526 - 2535 - 1673) // 2025 rows absent

    // incremental 2025
    Pipeline.run(spark,
      PipelineConfig(PipelineConfig.Incremental, Some(2025), files25, wh), clock)

    val fact = store.read(PipelineConfig.tables.fact)
    assert(fact.count() == 12526)
    assert(fact.filter(col("year") === 2025).count() == 2535 + 1673)
    // insert-only: pre-existing fact rows unchanged (same fact_key set for 2023/24)
    assert(fact.groupBy("row_key").count().filter(col("count") > 1).count() == 0)

    // SCD1 quirk preserved: athlete_count now reflects 2025 only for
    // countries present in 2025; total differs from the full-history sum
    val countsAfter = store.read(PipelineConfig.tables.dimCountries)
      .select(sum(col("athlete_count"))).head().getLong(0)
    assert(countsAfter != countsBefore,
      "incremental SCD1 should overwrite athlete_count with latest-year counts")

    // dims keep their keys stable for unchanged members
    val divisions = store.read(PipelineConfig.tables.dimDivisions)
    assert(divisions.count() >= 32 - 5) // 2025-only divisions merged in, none lost
    // rerun same incremental: fully idempotent
    Pipeline.run(spark,
      PipelineConfig(PipelineConfig.Incremental, Some(2025), files25, wh), clock)
    assert(store.read(PipelineConfig.tables.fact).count() == 12526)
  }
}
