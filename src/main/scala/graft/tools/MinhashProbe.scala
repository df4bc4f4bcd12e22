package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Decompose dedup_minhash_lsh cost at sf0.1 (1000 docs, k=32, bands=4). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-mh-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0)
    docs.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    time("tokenSets") {
      docs.select(col("doc_id"),
        TextFunctions.distinctTokens(col("text")).as("toks")).count()
    }
    val tokenSets = docs.select(col("doc_id").as("doc_id"),
      TextFunctions.distinctTokens(col("text")).as("toks")).localCheckpoint(true)
    time("signature agg") {
      Dedup.signatureFromUnits(tokenSets, 32).count()
    }
    val sigs = Dedup.signatureFromUnits(tokenSets, 32).localCheckpoint(true)
    time("candidates distinct") {
      Dedup.minHashCandidates(sigs, 32, 4).count()
    }
    time("full minHashNearDups") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 4, 0.9).count()
    }
    time("full again (warm)") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 4, 0.9).count()
    }
    spark.stop()
  }
}
