package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions

/** Decompose qualityScore cost per component at sf0.1. */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-text-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    def warm(label: String)(c: org.apache.spark.sql.Column): Unit = {
      docs.select(sum(c)).collect()
      time(label) { docs.select(sum(c)).collect()(0) }
    }
    warm("lengthScore")(
      least(TextFunctions.tokenCount(col("text")).cast("double") / 100.0, lit(1.0)))
    warm("alphaRatio")(TextFunctions.alphaRatio(col("text")))
    warm("stopwordRatio")(TextFunctions.stopwordRatio(col("text")))
    warm("punctRatio")(TextFunctions.punctRatio(col("text")))
    warm("qualityScore")(TextFunctions.qualityScore(col("text")))
    warm("tokenCount")(TextFunctions.tokenCount(col("text")).cast("long"))
    spark.stop()
  }
}
