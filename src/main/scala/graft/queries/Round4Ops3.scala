package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Round-4 batch 3: PageRank centrality, equal-frequency feature
  * binning, and the binaryFile source (raw-bytes ingestion with
  * provenance columns).
  */
object Round4Ops3 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** PageRank over the bipartite supplier↔part graph (both directions of
    * every lineitem, so mass circulates): which parts/suppliers are the
    * hubs of the supply network. Rows-only gate — iterative float
    * fixpoints have no SQL twin; the closed-form contract is pinned in
    * GraphSpec. Output: top-20 parts by rank (rounded; ties broken by
    * key). 6 iterations: the bipartite walk's rank ORDER stabilizes by
    * round 4; wall-clock is per-iteration scheduling, so the gate
    * doesn't buy precision it can't show in 20 rounded rows.
    */
  val pagerank_parts = OpQuery.noOracle("pagerank_parts") { (spark, dir) =>
    val offset = 10000000L
    val li = t(spark, dir, "lineitem").select(
      col("l_suppkey").cast("long").as("s"),
      (col("l_partkey").cast("long") + offset).as("p"))
    val edges = li.select(col("s").as("src"), col("p").as("dst"))
      .union(li.select(col("p").as("src"), col("s").as("dst")))
    Graph.pageRank(edges, iterations = 6)
      .filter(col("id") >= offset)
      .select((col("id") - offset).as("part_key"),
        round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("part_key"))
      .limit(20)
  }

  /** Equal-frequency feature binning (the bucketizer every feature
    * pipeline runs before hashing/embedding): decile bounds from EXACT
    * interpolated percentiles over integer cents (the a16 trick — both
    * engines interpolate identically in the integer domain), bucket
    * assignment by codegen'd array filter against the broadcast bounds,
    * then a per-bucket audit. Equal counts per bucket in the output ARE
    * the equal-frequency property.
    *
    * Scale note: exact `percentile` funnels the single group through one
    * aggregation buffer — that is the price of exactness and the gate's
    * point (engine-identical bounds). The 100 TB path swaps in
    * `approx_percentile` bounds (same assignment plan; a8 covers the
    * approx contract).
    */
  val feature_bucketize = OpQuery(
    "feature_bucketize",
    """WITH c AS (
      |  SELECT CAST(TRUNC(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
      |), b AS (
      |  SELECT quantile_cont(cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds FROM c
      |)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(MIN(cents) AS BIGINT) AS lo_cents,
      |       CAST(MAX(cents) AS BIGINT) AS hi_cents
      |FROM (SELECT c.cents, CAST(1 + len(list_filter(b.bounds, x -> c.cents > x)) AS INT) AS bucket
      |      FROM c, b)
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
    val cents = t(spark, dir, "lineitem")
      .select((col("l_extendedprice") * 100).cast("long").as("cents"))
    val qs = (1 to 9).map(_ / 10.0)
    val bounds = cents.agg(
      percentile(col("cents"), lit(qs.toArray)).as("bounds"))
    // bucket = 1 + #(bounds below cents), written as 9 unrolled
    // element_at comparisons instead of size(filter(bounds, λ)):
    // higher-order functions are CodegenFallback (interpreted per row
    // over the whole fact table), the unrolled form whole-stage-codegens
    // — same integer count, bounds is sorted either way (r13-opt §4)
    cents.crossJoin(broadcast(bounds))
      .select(col("cents"),
        qs.indices.map(i =>
            when(col("cents") > element_at(col("bounds"), i + 1), 1)
              .otherwise(0))
          .reduce[org.apache.spark.sql.Column](_ + _)
          .+(lit(1)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo_cents"), max(col("cents")).as("hi_cents"))
      .orderBy(col("bucket"))
  }

  /** binaryFile source: documents land as one raw file each (a stand-in
    * for images/audio — same reader path), are read back as bytes with
    * path provenance, and the oracle computes the EXPECTED length and
    * md5 from the source table — proving the bytes round-tripped
    * exactly without the oracle ever seeing the files (the s19
    * philosophy). Provenance id is parsed from the partition path.
    */
  val s20_binaryfile_scan = OpQuery(
    "s20_binaryfile_scan",
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) + 1 AS BIGINT) AS n_bytes,
      |       md5(text || chr(10)) AS content_md5
      |FROM documents
      |WHERE doc_id % 25 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val base = s"/tmp/graft_landing_s20_${math.abs(dir.hashCode)}"
    if (!Files.exists(Paths.get(base, "_SUCCESS"))) {
      t(spark, dir, "documents")
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").partitionBy("doc_id").text(base)
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .option("recursiveFileLookup", "true")
      .load(base)
      .select(
        regexp_extract(col("path"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(pagerank_parts, feature_bucketize, s20_binaryfile_scan)
}
