package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TableStore

/** Round-4 batch 33: gates for string-statistics pruning and partition
  * evolution — the storage features land in the driver's oracle loop,
  * not just in specs.
  */
object Round4Ops33 {

  /** String-stats pruned read: documents range-laid on lang, ANALYZEd,
    * then read via the pruned path for a lang range. The oracle filters
    * the source table directly — the pruned scan must be invisible in
    * the result while skipping files (skipping itself is asserted in
    * StorageEvolutionSpec; here the driver pins result-equality).
    */
  val s29_string_pruned_read = OpQuery(
    "s29_string_pruned_read",
    """SELECT doc_id, lang, source
      |FROM documents
      |WHERE lang >= 'de' AND lang <= 'en'
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "lang", "source")
    val root = graft.queries.GateScratch.dir("graft-strprune-").toString
    val store = new TableStore(spark, root)
    store.overwrite("docs", docs.repartitionByRange(5, col("lang"), col("doc_id")))
    store.analyzeStringColumn("docs", "lang")
    store.readPrunedString("docs", "lang", "de", "en")
      .orderBy("doc_id")
  }

  /** Partition evolution end-to-end: events stored partitioned by
    * event_type, evolved to a value-band layout, then aggregated off the
    * NEW layout. The oracle aggregates the source — evolution must be
    * content-neutral while the physical tree changes underneath.
    */
  val s30_partition_evolution = OpQuery(
    "s30_partition_evolution",
    """SELECT CAST(CAST(TRUNC(value) AS INT) // 25 AS INT) AS band,
      |       event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM events
      |WHERE event_id % 5 = 0
      |GROUP BY 1, 2
      |ORDER BY band, event_type""".stripMargin) { (spark, dir) =>
    val events = Tables.load(spark, dir, "events")
      .filter(col("event_id") % 5 === 0)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("band", (col("value").cast("int") / lit(25)).cast("int"))
    val root = graft.queries.GateScratch.dir("graft-evolve-gate-").toString
    val store = new TableStore(spark, root, retainVersions = 3)
    store.overwrite("ev", events, partitionBy = Seq("event_type"))
    store.evolvePartitioning("ev", Seq("band"))
    require(store.partitionColumns("ev") == Seq("band"),
      "evolution did not change the layout")
    store.read("ev")
      .groupBy(col("band").cast("int").as("band"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("band", "event_type")
  }

  val all: Seq[OpQuery] = Seq(s29_string_pruned_read, s30_partition_evolution)
}
