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
    // variant: dedup AFTER the codegen'd n_eq prefilter instead of before
    time("variant prefilter-then-distinct") {
      val sigs2 = Dedup.signatureFromUnits(tokenSets, 32).localCheckpoint(true)
      val raw = Dedup.minHashCandidatesRaw(sigs2, 32, 4)
      val pre = raw
        .join(sigs2.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
        .join(sigs2.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
        .withColumn("n_eq",
          (0 until 32)
            .map(i => when(element_at(col("sig1"), i + 1) === element_at(col("sig2"), i + 1), 1).otherwise(0))
            .reduce[org.apache.spark.sql.Column](_ + _))
        .filter(col("n_eq") >= 24)
        .select("id1", "id2")
        .distinct()
      println("prefiltered-distinct=" + pre.count())
      val out = pre
        .join(tokenSets.select(col("doc_id").as("id1"), col("toks").as("toks1")), "id1")
        .join(tokenSets.select(col("doc_id").as("id2"), col("toks").as("toks2")), "id2")
        .withColumn("n_inter", size(array_intersect(col("toks1"), col("toks2"))))
        .withColumn("jaccard", col("n_inter").cast("double") /
          (size(col("toks1")) + size(col("toks2")) - col("n_inter")))
        .filter(col("jaccard") >= 0.9)
      println("verified=" + out.count())
    }
    spark.stop()
  }
}
