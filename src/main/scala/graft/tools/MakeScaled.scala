package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Build a K×-scaled copy of a testdata directory for scale studies
  * (SCALE.md §sf1): every fact/dim table is replicated K times with
  * key columns offset by a disjoint stride, so PRIMARY KEYS STAY
  * UNIQUE and foreign keys stay consistent (copy i of orders points at
  * copy i of customer). nation/region stay fixed — TPC-H semantics:
  * reference dims don't grow with scale factor.
  *
  * Documents get a PER-TOKEN replica suffix for i>0 (every token `t`
  * becomes `t_r<i>`): replicated text must not create cross-replica
  * similarity, or every near-dup operator measures the replication
  * artifact instead of the workload. A single appended token is NOT
  * enough — jaccard between a doc and its suffixed twin is n/(n+2)
  * ≈ 0.98, far above any dedup threshold, so every LSH bucket went
  * K× deep and within-bucket verify work went K² (measured: the
  * streaming-ingest gate exploded 5 s → 15+ min at K=10). Disjoint
  * token alphabets give replicas jaccard 0: each replica is an
  * independent corpus clone with the same token-frequency SHAPE, and
  * near-dup work scales linearly — the scaling a K×-bigger real
  * corpus would show. Embeddings are replicated as-is (identical
  * vectors don't change ANN work shape; the query set is pinned to
  * copy 0 by `vec_id < 8`).
  *
  * Usage: runMain graft.tools.MakeScaled [srcDir] [outDir] [k]
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark: SparkSession = GraftSession.local("graft-make-scaled")
    // stride far above any key in the source (max sf0.1 key ~600k) and
    // divisible by EVERY modulus 1..16 (it's a multiple of lcm(1..16) =
    // 720720) — gates slice and parameterize on doc_id % 5 / % 7 /
    // % 11 / % 13, and a stride with a nonzero residue would ROTATE a
    // replica's modulus classes instead of replicating them
    // proportionally (10^7 % 11 = 10, for instance)
    val stride = 720720L * 14 // 10,090,080
    def load(t: String): DataFrame =
      graft.Tables.load(spark, src, t)
    def rep(df: DataFrame, keyCols: Seq[String],
        perturbText: Boolean = false): DataFrame =
      (0 until k).map { i =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * stride)))
        if (perturbText && i > 0)
          // suffix EVERY token: replica alphabets are disjoint, so
          // cross-replica jaccard is 0 and LSH buckets never mix copies
          shifted.withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1_r$i"))
        else shifted
      }.reduce(_ unionByName _)
    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> load("region"),
      "nation" -> load("nation"),
      "customer" -> rep(load("customer"), Seq("c_custkey")),
      "supplier" -> rep(load("supplier"), Seq("s_suppkey")),
      "part" -> rep(load("part"), Seq("p_partkey")),
      "orders" -> rep(load("orders"), Seq("o_orderkey", "o_custkey")),
      "lineitem" -> rep(load("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> rep(load("events"), Seq("event_id", "user_id")),
      "documents" -> rep(load("documents"), Seq("doc_id"),
        perturbText = true),
      "embeddings" -> rep(load("embeddings"), Seq("vec_id")))
    plans.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[make-scaled] $t written")
    }
    spark.stop()
  }
}
