package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Decompose dedup_minhash_verified cost (bands=16, margin=0.35). */
object VerifProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-vp", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0)
    docs.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val tokenSets = docs.select(col("doc_id"),
      TextFunctions.distinctTokens(col("text")).as("toks")).localCheckpoint(true)
    val sigs = Dedup.signatureFromUnits(tokenSets, 32).localCheckpoint(true)
    time("sig materialize") { sigs.count() }
    time("candidates b=16 distinct") { Dedup.minHashCandidates(sigs, 32, 16).count() }
    val cands = Dedup.minHashCandidates(sigs, 32, 16).localCheckpoint(true)
    val minEqual = math.ceil(32 * (0.9 - 0.35)).toInt
    val pre = cands
      .join(sigs.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("n_eq",
        (0 until 32)
          .map(i => when(element_at(col("sig1"), i + 1) === element_at(col("sig2"), i + 1), 1).otherwise(0))
          .reduce[org.apache.spark.sql.Column](_ + _))
      .filter(col("n_eq") >= minEqual)
      .select("id1", "id2")
    time("prefilter") { pre.count() }
    val preC = pre.localCheckpoint(true)
    time("verify join (array_intersect)") {
      preC
        .join(tokenSets.select(col("doc_id").as("id1"), col("toks").as("toks1")), "id1")
        .join(tokenSets.select(col("doc_id").as("id2"), col("toks").as("toks2")), "id2")
        .withColumn("n_inter", size(array_intersect(col("toks1"), col("toks2"))))
        .withColumn("jaccard", col("n_inter").cast("double") /
          (size(col("toks1")) + size(col("toks2")) - col("n_inter")))
        .filter(col("jaccard") >= 0.9).count()
    }
    time("full pipeline") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 16, 0.9, 0.35).count()
    }
    spark.stop()
  }
}
