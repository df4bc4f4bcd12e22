package graft.pipeline

/** Run config as a value (SURVEY.md §1.1) — the reference builds a JSON
  * config dict once and passes it to every task
  * (01_config.ipynb:329-360 (cell-12)); here it is a case class passed by
  * value between stage functions.
  *
  * @param runMode     "full_load" or "incremental"
  * @param processYear for incremental runs, the single year to process
  * @param files       landing files to ingest: (path, year, gender)
  * @param warehouse   root directory of the parquet table store
  */
final case class PipelineConfig(
    runMode: String,
    processYear: Option[Int],
    files: Seq[LandingFile],
    warehouse: String) {

  require(
    runMode == PipelineConfig.FullLoad || runMode == PipelineConfig.Incremental,
    s"invalid run_mode: $runMode")   // ref: 01_config.ipynb:126-128 (cell-4)
  require(
    runMode != PipelineConfig.Incremental || processYear.nonEmpty,
    "incremental run requires process_year")  // ref: 01_config.ipynb:150 (cell-5)

  def isIncremental: Boolean = runMode == PipelineConfig.Incremental
}

final case class LandingFile(path: String, year: Int, gender: String)

object PipelineConfig {
  val FullLoad = "full_load"
  val Incremental = "incremental"

  object tables {
    val bronze = "bronze_ironman_results"
    val silver = "silver_ironman_results"
    val dimAthletes = "gold_dim_athletes"
    val dimCountries = "gold_dim_countries"
    val dimDivisions = "gold_dim_divisions"
    val fact = "gold_fact_race_results"
  }

  /** S11 — fail fast when a configured landing file is missing.
    * Ref: 01_config.ipynb:425-448 (cell-13).
    */
  def validateFiles(config: PipelineConfig): Unit = {
    val missing = config.files.filterNot(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(f.path)))
    if (missing.nonEmpty)
      throw new java.io.FileNotFoundException(
        s"missing landing files: ${missing.map(_.path).mkString(", ")}")
  }
}
