package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data shard export: a deterministic global shuffle plus
  * size-balanced shard assignment — the last step of every pretraining
  * pipeline (write the curated corpus as N shards of ~target size, in a
  * reproducible pseudo-random document order, so data loaders stream
  * shards without a seek-heavy global sample).
  *
  * Determinism contract: the "shuffle" is an ORDER, not an RNG — rows
  * sort by `md5(id)` (engine-independent, layout-invariant, and
  * reproducible run-over-run), and shard boundaries are pure arithmetic
  * on the running cost prefix. Two runs over the same corpus produce
  * byte-identical shard membership; so does any other engine that can
  * compute md5 (the DuckDB oracle replays the whole assignment).
  *
  * Scale shape: the only global coordination is [[TotalOrder.prefixAggs]]
  * — one range shuffle on the hash order with per-partition offsets
  * broadcast back. No single-reducer window, no driver collect; the
  * write is a partitionBy on the shard column. At 100 TB with 1 GiB
  * shards this assigns ~100k shards in one pass.
  */
object ShardExport {

  /** The deterministic shuffle key for a document id. */
  def shuffleKey(id: Column): Column = md5(id.cast("string"))

  /** Assign every row a shard id such that consecutive rows (in
    * deterministic-shuffle order) pack into shards of ~`targetCost`
    * total `costCol` (chars, bytes, or tokens). A document belongs to
    * the shard its STARTING offset falls in: every shard holds MORE
    * than `targetCost − maxDocCost` and overflows by less than the
    * largest single document — the exact minimum-size guarantee, which
    * degenerates when one document's cost reaches the target (such a
    * doc spans several targets, and the shard ids it covers are
    * skipped: shard ids are monotone but not gap-free on such data).
    * Null costs count as 0 (the [[Packing]] convention) — a null must
    * not poison its own and every later row's shard id.
    *
    * Adds: `__shuffle_key` (md5 order), `shard` (0-based LongType).
    */
  def assignShards(
      df: DataFrame, idCol: String, costCol: String,
      targetCost: Long): DataFrame = {
    require(targetCost > 0, s"targetCost must be positive, got $targetCost")
    val keyed = df.withColumn("__shuffle_key", shuffleKey(col(idCol)))
    val withPrefix = TotalOrder.prefixAggs(
      keyed.withColumn("__cost", coalesce(col(costCol).cast("long"), lit(0L))),
      order = Seq(col("__shuffle_key"), col(idCol)),
      sums = Seq("__cost" -> "__prefix"))
    // start offset of this doc = prefix minus its own cost; `div` is
    // Long integer division — floor over a double quotient would lose
    // exactness once the running prefix passes 2^53
    withPrefix
      .withColumn("shard",
        expr(s"(__prefix - __cost) div ${targetCost}L").cast("long"))
      .drop("__cost", "__prefix")
  }

  /** Shard manifest: one row per shard with document count and total
    * cost — the loader-facing index (and the oracle-checkable shape of
    * the assignment).
    */
  def manifest(assigned: DataFrame, costCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(costCol).cast("long")).as("total_cost"))
      .orderBy(col("shard"))

  /** Write the assigned corpus as one directory per shard
    * (`shard=K/...`), shard-partitioned so each shard's rows land in
    * its own files. Returns the manifest of what was written.
    */
  def writeShards(
      assigned: DataFrame, costCol: String, outDir: String): DataFrame = {
    assigned
      // the in-file row order IS the loader's training order: sort each
      // shard by the shuffle key before writing — a bare repartition
      // leaves shuffle-fetch order, which differs run-over-run and
      // breaks the module's reproducible-order contract
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__shuffle_key"))
      .drop("__shuffle_key")
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(outDir)
    manifest(assigned, costCol)
  }
}
