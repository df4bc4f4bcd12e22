package graft.tools

import graft.GraftSession
import graft.queries.{CurationPipeline, TrainingDataOps}

/** Round-4 profiling: is curation_e2e / semantic_dedup dominated by
  * execution or by per-query planning+codegen (second run in the same
  * session reuses the compiled codegen cache)?
  */
object ProfileR4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile-r4")
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).count())

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p4] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val docs = graft.Tables.load(spark, sfDir, "documents")
    time("A qualityScore filter count (cold)") {
      docs.filter(TextFunctions.qualityScore(col("text")) >= 0.5).count()
    }
    time("A again (warm)") {
      docs.filter(TextFunctions.qualityScore(col("text")) >= 0.5).count()
    }
    time("B exact-dedup over raw docs (cold)") {
      graft.operators.Dedup.exact(docs, "doc_id", "text").count()
    }
    time("C split+count over raw docs (cold)") {
      graft.operators.Sampling.deterministicSplit(
          docs.select(col("doc_id"), col("lang")), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"), col("lang")).count().count()
    }
    for (q <- Seq(CurationPipeline.curation_e2e, TrainingDataOps.semantic_dedup)) {
      time(s"${q.name} run1") { q.build(spark, sfDir).count() }
      time(s"${q.name} run2") { q.build(spark, sfDir).count() }
    }
    // semantic_dedup stages
    val half = graft.Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 2 === 0)
    time("D bruteForceNearDups pairs (cold)") {
      println("pairs=" + graft.operators.Similarity.bruteForceNearDups(half, 0.45).count())
    }
    time("D again (warm)") {
      graft.operators.Similarity.bruteForceNearDups(half, 0.45).count()
    }
    time("E connected components over those pairs") {
      val p = graft.operators.Similarity.bruteForceNearDups(half, 0.45)
        .select("id1", "id2")
      println("nodes=" + graft.operators.Dedup.connectedComponents(p).count())
    }
    spark.stop()
  }
}
