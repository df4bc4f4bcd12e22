package graft.tools

import graft.GraftSession

/** Targeted timing for perf iteration: run the named SparkEntry queries
  * twice each (cold = planning+codegen+exec, warm = mostly exec) at the
  * given sf dir. Usage: runMain graft.tools.TimeQueries <sfDir> q1,q2
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-time", cpus.toInt)
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).count())
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (run <- Seq("cold", "warm")) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[tq] $name $run: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
