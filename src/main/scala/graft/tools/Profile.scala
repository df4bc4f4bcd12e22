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

    val pairs = time("jaccard pairs for clusters") {
      val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).cache()
      println(s"[profile] pair count: ${p.count()}")
      p
    }
    time("connected components") {
      println(s"[profile] components nodes: ${Dedup.connectedComponents(pairs).count()}")
    }
    time("dedup corpus (pairs cached)") {
      println(s"[profile] survivors: ${Dedup.dedupCorpus(docs, "doc_id", pairs).count()}")
    }
    time("cdc + incremental refresh (15k rows)") {
      val wh = java.nio.file.Files.createTempDirectory("graft-ivm-prof-").toString
      val store = new graft.operators.TableStore(spark, wh)
      val customer = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      store.overwrite("base", customer)
      store.overwrite("agg", graft.operators.IncrementalAgg
        .fullAggregate(store.read("base"), Seq("c_mktsegment"), "c_acctbal"))
      store.overwrite("base", customer.filter(col("c_custkey") % 7 =!= 0))
      graft.operators.IncrementalAgg.refresh(store, "agg", "base", 0, 1,
        Seq("c_mktsegment"), "c_acctbal")
      println(s"[profile] refreshed groups: ${store.read("agg").count()}")
    }

    // merge-layer scale probe: 10M-row target, 1M-row source upsert — no
    // driver-side collection anywhere, so this should stream comfortably
    val wh = java.nio.file.Files.createTempDirectory("graft-scale-").toString
    val store = new graft.operators.TableStore(spark, wh)
    time("10M-row partitioned overwrite") {
      store.overwrite("big",
        spark.range(10000000L).toDF("k")
          .withColumn("part", col("k") % 16)
          .withColumn("v", col("k") * 3),
        partitionBy = Seq("part"))
    }
    time("1M-row partition-aligned insert-only merge") {
      graft.operators.Merge.insertOnlyPartitionAligned(store, "big",
        spark.range(9500000L, 10500000L).toDF("k")
          .withColumn("part", col("k") % 16)
          .withColumn("v", col("k") * 3),
        keys = Seq("k"), partCol = "part")
    }
    println(s"[profile] merged rows: ${store.read("big").count()}")
    spark.stop()
  }
}
