package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.QuantileBucketExpr

/** Z-order-style multi-dimensional data clustering on write (the
  * `OPTIMIZE ... ZORDER BY` analog of the reference's Delta tables,
  * extending file-level pruning beyond the single `year=` partition
  * column).
  *
  * Each clustering column is normalized to a `bits`-wide integer by
  * min-max scaling, the bit patterns are interleaved into one z-value,
  * and the table is range-partitioned and sorted by that z-value before
  * writing. Files then cover compact hyper-rectangles of the clustering
  * space, so parquet min/max statistics prune files for selective
  * predicates on ANY clustered column — a linear sort only achieves this
  * for its leading column.
  *
  * Scale notes: the min/max pass is one distributed aggregate (2·n
  * doubles to the driver); `repartitionByRange` samples the z-value to
  * build balanced ranges (Spark's standard range exchange); the
  * interleave itself is a fixed chain of shift/mask expressions that
  * stays inside whole-stage codegen. Min-max scaling is skew-sensitive
  * (a heavy-hitter value compresses the rest of the axis); rank-based
  * scaling would fix that at the cost of a window pass — documented
  * trade-off, same as Delta OSS's range_partition_id approach vs this.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative integer
    * columns: output bit (b·n + i) = bit b of column i.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "interleaveBits needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits exceeds a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * cols.size + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value of the given columns, min-max scaled into `bits` bits using
    * the supplied per-column (min, max) ranges.
    */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int): Column = {
    val maxBucket = (1L << bits) - 1
    val scaled = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(
        ((c.cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble)).cast("long"),
        lit(0L)), lit(maxBucket))
    }
    interleaveBits(scaled, bits)
  }

  /** Re-layout `df` clustered by `cols`: range-partition into `numFiles`
    * z-ranges and sort within each, so each output file covers a compact
    * region of the clustering space. Row content is untouched.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int, bits: Int = 16): DataFrame = {
    val statsRows = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        .head,
      cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        .tail: _*)
      .collect()
    // Empty table or all-null clustering column: min/max are null, so no
    // z-order exists — the re-layout is a no-op, not an error.
    if (statsRows.isEmpty || statsRows.head.anyNull) return df
    val stats = statsRows.head
    val ranges = cols.indices.map(i => (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
    layoutByZ(df.withColumn("__z", zValue(cols.map(col), ranges, bits)), numFiles)
  }

  /** Rank-based clustering — the skew-immune variant of [[cluster]]:
    * each column is scaled by its QUANTILE rank instead of min-max, so a
    * heavy-hitter value cannot compress the rest of the axis into a few
    * buckets (the documented weakness of min-max scaling).
    *
    * One approxQuantile pass per column computes 2^bits - 1 boundaries
    * (a few hundred doubles to the driver — same footprint class as
    * cluster()'s min/max); the per-row bucket is then a codegen'd binary
    * search over the broadcast boundary array, map-only. This is the
    * trade Delta OSS makes with range_partition_id, without the extra
    * shuffle a window-rank would cost.
    */
  def clusterByRank(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits exceeds a long")
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (1 << bits)).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    if (bounds.exists(_.isEmpty)) return df // empty/all-null: no-op
    QuantileBucketExpr.register(df.sparkSession)
    val bucketCols = cols.zip(bounds).map { case (c, b) =>
      QuantileBucketExpr.bucketOf(col(c).cast("double"), b)
    }
    layoutByZ(
      df.withColumn("__z", interleaveBits(bucketCols, bits)), numFiles)
  }

  private def layoutByZ(dfWithZ: DataFrame, numFiles: Int): DataFrame =
    dfWithZ
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
