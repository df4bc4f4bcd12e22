package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-4 batch 10: mergeable distinct sketches (the re-aggregation
  * pattern) and per-document keyword extraction.
  */
object Round4Ops10 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Mergeable HLL distinct sketches (Apache DataSketches via Spark's
    * hll_sketch_agg / hll_union_agg): per-DAY user sketches union into
    * per-WEEK estimates WITHOUT touching raw events again — the
    * incremental-rollup pattern that makes distinct counting O(sketch)
    * instead of O(re-scan) at 100 TB. Rows-only gate (sketch binaries
    * have no DuckDB twin); the output carries its own exactness check —
    * estimate vs exact count and the relative error, bound-asserted in
    * ScaleExtrasSpec.
    */
  val a20_hll_partial_merge = OpQuery.noOracle("a20_hll_partial_merge") { (spark, dir) =>
    val events = t(spark, dir, "events")
    val daily = events
      .groupBy(date_trunc("week", col("ts")).as("wk"), to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily
      .groupBy(col("wk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = events
      .groupBy(date_trunc("week", col("ts")).as("wk"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    weekly.join(exact, "wk")
      .select(
        date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("exact_distinct"),
        round(col("est"), 2).as("hll_estimate"),
        round(abs(col("est") - col("exact_distinct")) /
          col("exact_distinct"), 4).as("rel_err"))
      .withColumn("within_bound", col("rel_err") <= 0.05)
      .orderBy(col("week"))
  }

  /** Per-document keyword extraction: top-3 TF-IDF terms per doc. The
    * per-doc ranking happens INSIDE each doc's aggregated term array
    * (sort + slice of a doc-vocabulary-sized array) — no window, no
    * global sort; document frequencies join back broadcast.
    */
  val text_keywords = OpQuery(
    "text_keywords",
    """WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      |    FROM documents WHERE coalesce(trim(text), '') <> ''
      |  ) GROUP BY 1, 2
      |), idf AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
      |  WHERE coalesce(trim(text), '') <> ''
      |), ranked AS (
      |  SELECT tf.doc_id, tf.tok,
      |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |           ORDER BY tf.tf * ln(n.n_docs / idf.df) DESC, tf.tok) AS rn
      |  FROM tf JOIN idf ON tf.tok = idf.tok, n
      |)
      |SELECT doc_id,
      |       array_to_string(list(tok ORDER BY rn), ',') AS keywords
      |FROM ranked WHERE rn <= 3
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = t(spark, dir, "documents")
      .filter(coalesce(trim(col("text")), lit("")) =!= "")
    val tf = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(idf, "tok")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      .groupBy(col("doc_id"))
      // rank inside the doc's own term array: sort by (-score, tok),
      // slice 3 — doc-vocabulary-sized, never a window over the corpus
      .agg(slice(
        array_sort(collect_list(struct((-col("score")).as("ns"), col("tok")))),
        1, 3).as("top"))
      .select(col("doc_id"),
        array_join(transform(col("top"), s => s.getField("tok")), ",").as("keywords"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(a20_hll_partial_merge, text_keywords)
}
