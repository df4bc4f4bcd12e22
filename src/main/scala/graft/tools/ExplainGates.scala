package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Dump `.explain("formatted")` for named SparkEntry gates to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/r13/`. Usage:
  *
  *   runMain graft.tools.ExplainGates <sfDir> <outDir> <suffix> q1,q2,...
  *
  * writes `<outDir>/<gate>_<suffix>.txt`. The gate fn runs first (some
  * gates build indexes/tables eagerly); the dumped plan is the returned
  * DataFrame's, POST-execution where AQE applies (isFinalPlan=true) so
  * the evidence shows the runtime join strategy/coalescing, matching
  * the PLANS.md convention.
  */
object ExplainGates {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val spark = GraftSession.builder("graft-explain",
        GraftSession.defaultCores)
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietBoundedWindowWarn()
    Files.createDirectories(Paths.get(outDir))
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explain] $name -> $outDir/${name}_$suffix.txt " +
        s"(${txt.length} chars)")
    }
    spark.stop()
  }
}
