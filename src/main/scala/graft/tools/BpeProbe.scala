package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-off debug probe for Bpe.train on the sf0.01 documents slice. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-bpe-probe", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") % 7 === 0)
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(array_remove(split(col("w"), ""), "").as("syms"), col("cnt"))
    vocab.orderBy(col("cnt").desc).show(10, false)
    val merges = graft.operators.Bpe.train(docs, "text", 20)
    println(s"[bpe] merges=${merges.mkString(", ")}")
    val out = graft.queries.Round4Ops.bpe_tokenize.build(spark, "/root/testdata/sf0.01")
    out.show(5, false)
    println(s"[bpe] rows=${out.count()}")
    spark.stop()
  }
}
