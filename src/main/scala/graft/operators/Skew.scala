package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handles sort-merge skew
  * automatically; explicit salting remains the tool when one hot key
  * dominates a hash aggregation or when a skewed shuffle join must be
  * balanced deterministically (e.g., a power-law key like a hot document
  * domain at 100 TB).
  */
object Skew {

  /** Salted two-phase aggregation: count/sum per (key, salt) first —
    * spreading a hot key over `saltBuckets` reducers — then combine per
    * key. Result is identical to a direct groupBy; the plan trades one
    * extra (tiny) shuffle for bounded per-task input on hot keys.
    */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String, saltBuckets: Int): DataFrame = {
    // per-row entropy, independent of column values: a hot key whose rows
    // all carry the same value must still spread across buckets
    val salted = df.withColumn(
      "__salt", pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n_rows"),
        sum(col("__s")).cast("double").as("total_value"))
  }

  /** Salted join of a skewed big side against a small side: the big side
    * gets a deterministic salt in [0, saltBuckets); the small side is
    * replicated across every salt value (explode), so the join key
    * becomes (key, salt) and a hot key's rows spread over saltBuckets
    * tasks. Equivalent to `big.join(small, keys)` row-for-row.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn(
      "__salt",
      pmod(hash(big.columns.toSeq.map(col): _*), lit(saltBuckets)))
    val replicatedSmall = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig
      .join(replicatedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
