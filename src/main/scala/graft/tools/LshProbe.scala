package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Decompose sim_lsh_neardup cost: bucketing, candidate volume, rescore. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-lsh-probe", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val dim = 64
    time("buckets count") {
      Similarity.lshBuckets(emb, 32, 6, dim).count()
    }
    time("buckets again") {
      Similarity.lshBuckets(emb, 32, 6, dim).count()
    }
    val buckets = Similarity.lshBuckets(emb, 32, 6, dim).localCheckpoint(true)
    time("bucket skew (top5)") {
      buckets.groupBy("lsh_table", "lsh_bucket").count()
        .orderBy(desc("count")).limit(5).collect().map(_.getLong(2)).toSeq
    }
    val a = buckets.select(col("lsh_table"), col("lsh_bucket"), col("vec_id").as("id1"))
    val b = buckets.select(col("lsh_table"), col("lsh_bucket"), col("vec_id").as("id2"))
    time("raw candidates") {
      a.join(b, Seq("lsh_table", "lsh_bucket")).filter(col("id1") < col("id2")).count()
    }
    time("full lshNearDups") {
      Similarity.lshNearDups(emb, 0.45, 32, 6).count()
    }
    // variant B: vectors carried through the bucket join (single join)
    import graft.expressions.VectorExprs
    val unit = emb.select(col("vec_id"), VectorExprs.vecUnit(col("embedding")).as("uv"))
      .localCheckpoint(true)
    val bkt = buckets.join(unit, Seq("vec_id"))
    val l = bkt.select(col("lsh_table"), col("lsh_bucket"), col("vec_id").as("id1"), col("uv").as("v1"))
    val r = bkt.select(col("lsh_table"), col("lsh_bucket"), col("vec_id").as("id2"), col("uv").as("v2"))
    time("variant B rescore-through-join") {
      l.join(r, Seq("lsh_table", "lsh_bucket"))
        .filter(col("id1") < col("id2"))
        .withColumn("score", VectorExprs.vecDot(col("v1"), col("v2")))
        .filter(col("score") >= 0.45)
        .select("id1", "id2", "score").distinct().count()
    }
    time("variant C candidates+2 broadcast joins, no distinct") {
      a.join(b, Seq("lsh_table", "lsh_bucket")).filter(col("id1") < col("id2"))
        .join(broadcast(unit.select(col("vec_id").as("id1"), col("uv").as("v1"))), Seq("id1"))
        .join(broadcast(unit.select(col("vec_id").as("id2"), col("uv").as("v2"))), Seq("id2"))
        .withColumn("score", VectorExprs.vecDot(col("v1"), col("v2")))
        .filter(col("score") >= 0.45)
        .count()
    }
    spark.stop()
  }
}
