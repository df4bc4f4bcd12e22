package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Plan + stage-time probe for [[graft.operators.Graph.pageRank]]:
  * prints the AQE-final physical plan of the rank frame after a short
  * run so the per-iteration join strategy (broadcast vs sort-merge) is
  * inspectable. `runMain graft.tools.PageRankProbe [sfDir] [iters]`
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local("graft-pagerank-probe")
    spark.sparkContext.setLogLevel("WARN")
    val offset = 10000000L
    val li = graft.Tables.load(spark, sfDir, "lineitem").select(
      col("l_suppkey").cast("long").as("s"),
      (col("l_partkey").cast("long") + offset).as("p"))
    val edges = li.select(col("s").as("src"), col("p").as("dst"))
      .union(li.select(col("p").as("src"), col("s").as("dst")))
    val t0 = System.nanoTime()
    val ranks = graft.operators.Graph.pageRank(edges, iterations = iters)
    ranks.count()
    println(f"[probe] $iters iterations: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(ranks.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(4000))
    spark.stop()
  }
}
