package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and splitting for training-data
  * pipelines.
  *
  * Why not `randomSplit`/`sample`: RNG-based splits change membership
  * when the data is repartitioned, re-ordered, or re-run — at 100 TB
  * that silently leaks val data into train across pipeline versions.
  * Hashing a stable id into buckets gives the same row the same split
  * forever, on any cluster layout, and is reproducible in any engine
  * (md5 is universal — the DuckDB oracle replicates it bit-for-bit).
  */
object Sampling {

  /** md5-derived bucket in [0, buckets): stable per id, uniform. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    pmod(
      conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long"),
      lit(buckets.toLong))

  /** Assign train/val/test by cumulative percentage over the hash bucket
    * space. `weights` are integer percents summing to <= 100 (the
    * remainder, if any, becomes the last split).
    */
  def deterministicSplit(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], salt: String = ""): DataFrame = {
    require(splits.map(_._2).sum <= 100, "split percents must sum to <= 100")
    val bucket = hashBucket(col(idCol), 100, salt)
    val cutoffs = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val labeled = splits.map(_._1).zip(cutoffs)
    val expr = labeled.init.foldRight(lit(labeled.last._1): Column) {
      case ((name, cutoff), rest) => when(bucket < cutoff, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic per-stratum sampling: keep a row iff its hash bucket
    * (salted per stratum) falls under the stratum's percent — the
    * content-stable `sampleBy`.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      percentByStratum: Map[String, Int], salt: String = ""): DataFrame = {
    val pct = percentByStratum.foldLeft(lit(0): Column) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, p).otherwise(acc)
    }
    df.filter(hashBucket(concat(col(idCol), lit("|"), col(strataCol)), 100, salt) < pct)
  }
}
