package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Stage-level timing for the heaviest bench op (minhash-LSH): signature
  * vs banding vs verification, to direct optimization at the real cost.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-profile")
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0).cache()
    docs.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = time("signature (32 hashes)") {
      val s = Dedup.minHashSignature(docs, "doc_id", "text", 32).cache()
      s.count(); s
    }
    val cands = time("band candidates (8 bands)") {
      val c = Dedup.minHashCandidates(sigs, 32, 8).cache()
      println(s"[profile] candidate pairs: ${c.count()}")
      c
    }
    time("verification (array_intersect)") {
      Dedup.minHashNearDups(docs, "doc_id", "text", 32, 8, 0.9).count()
    }
    time("full pipeline uncached") {
      Dedup.minHashNearDups(
        Tables.load(spark, sfDir, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", 32, 8, 0.9).count()
    }
    spark.stop()
  }
}
