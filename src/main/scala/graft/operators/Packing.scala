package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-capacity bins (training sequences) so short documents share a
  * sequence instead of wasting padding.
  *
  * Scale design: a globally-optimal packing is inherently sequential, so
  * documents are first spread over `buckets` independent packing lanes by
  * stable hash (same md5 arithmetic as [[Sampling]] — deterministic under
  * any layout), and each lane packs greedily in id order via ONE window
  * pass (running token total). Lanes pack in parallel; the only shuffle
  * is the per-lane window partition. With buckets sized to executor count
  * there is no single-reducer funnel — the trade is lane-local (not
  * global) packing, the standard approximation real pipelines ship.
  *
  * Capacity semantics are "soft": a document is placed by the cumulative
  * count BEFORE it, so the bin that ends at the boundary may overflow by
  * at most one document (downstream truncation/splitting is the
  * tokenizer's job, not the packer's). A document longer than `capacity`
  * still shares its bin with whatever shorter documents preceded it
  * there — start-offset placement does not isolate oversized docs, it
  * only guarantees no LATER document joins the overflowed bin.
  */
object Packing {

  /** @return input columns + `lane` (packing lane), `bin` (sequence id,
    *         unique across lanes), `seq_pos` (document's position inside
    *         its sequence, 1-based)
    */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: String,
      capacity: Long, buckets: Int): DataFrame = {
    require(capacity > 0 && buckets > 0, "capacity and buckets must be positive")
    val lane = Sampling.hashBucket(col(idCol), buckets)
    val w = Window.partitionBy(col("lane")).orderBy(col(idCol))
    // null token counts pack as 0-length — one null must not poison the
    // lane's running total from that row onward
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    val withLane = df.withColumn("lane", lane)
      .withColumn("__cum",
        sum(toks).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__before", col("__cum") - toks)
      .withColumn("__lane_bin", floor(col("__before") / capacity))
    withLane
      // 2^40 bins per lane before ids would collide across lanes — a
      // lane would need capacity × 2^40 tokens to get there (the old
      // ×1e6 encoding was reachable: ~1M bins/lane is a few hundred
      // billion tokens at capacity 512, i.e. one big corpus)
      .withColumn("bin",
        shiftleft(col("lane").cast("long"), 40) + col("__lane_bin"))
      .withColumn("seq_pos",
        row_number().over(Window.partitionBy(col("lane"), col("__lane_bin"))
          .orderBy(col(idCol))))
      .drop("__cum", "__before", "__lane_bin")
  }
}
