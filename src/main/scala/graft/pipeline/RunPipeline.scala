package graft.pipeline

import graft.GraftSession

/** CLI entry for the full medallion pipeline over the reference's landing
  * CSVs: `runMain graft.pipeline.RunPipeline [warehouseDir] [runMode] [year]`.
  * Prints the reference's audit surface (row counts, designation mix, FK
  * coverage, per-view row counts).
  */
object RunPipeline {

  def referenceFiles(dataDir: String): Seq[LandingFile] = Seq(
    LandingFile(s"$dataDir/2023_men.csv", 2023, "M"),
    LandingFile(s"$dataDir/2023_women.csv", 2023, "F"),
    LandingFile(s"$dataDir/ironman_kona_2024_men_complete_results.csv", 2024, "M"),
    LandingFile(s"$dataDir/ironman_kona_2024_women_complete_results.csv", 2024, "F"),
    LandingFile(s"$dataDir/ironman_kona_2025_men_complete_results.csv", 2025, "M"),
    LandingFile(s"$dataDir/ironman_kona_2025_women_complete_results.csv", 2025, "F"))

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-wh-").toString)
    val runMode = if (args.length > 1) args(1) else PipelineConfig.FullLoad
    val processYear = if (args.length > 2) Some(args(2).toInt) else None
    val dataDir = sys.env.getOrElse(
      "GRAFT_LANDING_DIR", "/root/reference/ironman_scraper/Data")

    val spark = GraftSession.local("graft-pipeline")
    val config = PipelineConfig(
      runMode, processYear,
      referenceFiles(dataDir).filter(f =>
        processYear.forall(_ == f.year) || runMode == PipelineConfig.FullLoad),
      warehouse)

    val t0 = System.nanoTime()
    val store = Pipeline.run(spark, config)
    val elapsed = (System.nanoTime() - t0) / 1e9

    import PipelineConfig.tables._
    println(f"[pipeline] completed in $elapsed%.1f s, warehouse=$warehouse")
    Seq(bronze, silver, dimAthletes, dimCountries, dimDivisions, fact).foreach { t =>
      println(s"[table] $t rows=${store.read(t).count()}")
    }
    println("[audit] fk coverage: " + Fact.fkAudit(store.read(fact)).head())
    Views.definitions.map(_._1).sorted.foreach { v =>
      println(s"[view] $v rows=${spark.table(v).count()}")
    }
    // typed Column-API builders must agree with their SQL view twins
    val factDf = store.read(PipelineConfig.tables.fact)
    Seq(
      "vw_athletes_by_year" -> TypedViews.athletesByYear(factDf),
      "vw_gender_distribution" -> TypedViews.genderDistribution(factDf),
      "vw_pro_vs_age_group" ->
        TypedViews.proVsAgeGroup(factDf, store.read(PipelineConfig.tables.dimDivisions))
    ).foreach { case (name, typed) =>
      val sqlRows = spark.table(name).collect().map(_.mkString("|")).toSet
      val typedRows = typed
        .select(spark.table(name).columns.toSeq.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.mkString("|")).toSet
      println(s"[typed-view] $name equal=${sqlRows == typedRows}")
    }
    spark.stop()
  }
}
