package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.operators.TableStore

/** The orchestrated batch pipeline (SURVEY.md §3.1): the reference's
  * Airflow → Databricks multi-task job collapses into stage functions
  * invoked in order with [[PipelineConfig]] passed by value —
  * config → bronze → silver → dims → fact → views.
  */
object Pipeline {

  def run(
      spark: SparkSession,
      config: PipelineConfig,
      clock: Option[java.sql.Timestamp] = None): TableStore = {
    PipelineConfig.validateFiles(config)
    val store = new TableStore(spark, config.warehouse)
    Bronze.run(spark, store, config, clock)
    Silver.run(spark, store, config)
    Dims.run(spark, store, config, clock)
    Fact.run(spark, store, config)
    Views.registerAll(spark, store)
    store
  }
}
