package graft.tools

import graft.GraftSession

/** Phase-split probe for the fuzz_relational mega-union: times parse+
  * analysis (spark.sql), optimization+planning (executedPlan force),
  * and execution (count) separately, under optional conf overrides
  * `k=v,k=v` in arg 2. Local iteration only.
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-fuzzprobe",
        GraftSession.defaultCores)
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1).nonEmpty)
      args(1).split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    val fn = graft.SparkEntry.queries("fuzz_relational")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force optimize + physical plan
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"[fuzzprobe] rep$rep analyze=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
