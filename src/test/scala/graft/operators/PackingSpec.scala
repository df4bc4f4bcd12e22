package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("soft-capacity packing: bins only overflow by their last document") {
    val docs = Tables.load(spark, sf, "documents").select(
      col("doc_id"),
      size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n_tokens"))
    val capacity = 256L
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens", capacity, buckets = 4)

    // every document lands in exactly one bin
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id").distinct().count() == docs.count())

    // per bin: total minus the LAST doc fits under capacity (soft overflow)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bin").orderBy(col("seq_pos").desc)
    val bad = packed
      .withColumn("rn", row_number().over(w))
      .groupBy("bin")
      .agg(
        sum("n_tokens").as("total"),
        sum(when(col("rn") === 1, col("n_tokens")).otherwise(0)).as("last_doc"))
      .filter(col("total") - col("last_doc") >= capacity)
      .count()
    assert(bad == 0, s"$bad bins exceed capacity before their final document")

    // deterministic under re-layout
    val again = Packing.packSequences(docs.repartition(13), "doc_id", "n_tokens",
        capacity, buckets = 4)
      .select("doc_id", "bin", "seq_pos").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == packed.select("doc_id", "bin", "seq_pos").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)

    // lanes actually parallelize: more than one lane in use
    assert(packed.select("lane").distinct().count() > 1)
  }

  test("bin ids never collide across lanes, even past a million bins per lane") {
    // capacity 1 turns every token into its own bin-index unit: docs of
    // 600k tokens push lane-local bin indices past the old 1e6 packing
    // multiplier, which made lane 0's high bins collide with lane 1's low
    // bins. The 2^40 encoding must keep every (lane, lane_bin) distinct.
    val docs = (1L to 40L).map(i => (i, 600000L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", "n_tokens",
      capacity = 1L, buckets = 4).cache()
    val lanesPerBin = packed.groupBy("bin")
      .agg(countDistinct("lane").as("n"))
      .filter(col("n") > 1).count()
    assert(lanesPerBin == 0, "a bin id is shared by two lanes")
    // the regression territory was actually exercised
    val maxLaneBin = packed
      .select(max(col("bin").bitwiseAND(lit((1L << 40) - 1)))).head().getLong(0)
    assert(maxLaneBin > 1000000L, s"test corpus too small: max lane bin $maxLaneBin")
    packed.unpersist()
  }
}
