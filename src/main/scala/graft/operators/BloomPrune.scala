package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.BloomFilter

/** Runtime-filter pruning (the pattern behind Spark's InjectRuntimeFilter
  * and Delta/Databricks bloom-filter indexes, exposed as a first-class
  * operator): build a bloom filter ONCE over a dimension's join keys,
  * then cut fact rows that cannot join BEFORE the join's shuffle.
  *
  * Why it matters at 100 TB: a selective dimension predicate (e.g. one
  * market segment) means most fact rows will not survive the join — but
  * a plain shuffled join still shuffles all of them. The bloom probe is
  * a map-side, codegen'd filter on the scan, so the shuffle only carries
  * the (few) candidate rows plus a bounded false-positive overhead.
  *
  * Correctness contract: bloom filters have NO false negatives, so
  * prune-then-join is observationally identical to the plain join —
  * that equivalence is the `bloom_prune_join` oracle gate, and the
  * no-false-negative / FPP-bound invariants are pinned in
  * BloomFilterSpec.
  */
object BloomPrune {

  /** Fact rows whose `factKey` might be present in `dim`'s `dimKey` set.
    *
    * The filter is built with one partial-aggregated pass over `dim`
    * (map-side bit arrays, OR-merged — tiny shuffled state), then
    * broadcast as a single row and probed inside whole-stage codegen on
    * the fact side. The fact table itself is never shuffled here.
    *
    * @param expectedItems sizing hint: expected distinct dim keys
    *                      (over-sizing only wastes filter bits); <= 0 ⇒
    *                      auto-size from a count of `dim`
    * @param fpp           target false-positive rate
    */
  def prune(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    BloomFilter.register(fact.sparkSession)
    // the filter expressions take BIGINT: integral keys cast losslessly,
    // everything else goes through xxhash64 on BOTH sides — the same
    // hash on build and probe preserves the no-false-negative contract
    // (a bare cast(\"long\") turned string keys into NULLs and the probe
    // then dropped EVERY fact row).
    // The encoding must be decided from BOTH key types together: if the
    // dim key picked cast and the fact key picked xxhash64 (or xxhash64
    // over different raw types — xxhash64(int 5) != xxhash64("5")),
    // build and probe would encode joinable values differently and the
    // filter would silently drop nearly every matching fact row. Both
    // integral → cast (value-equal across widths); same non-integral
    // type → hash both; anything else is refused loudly — align the key
    // types before pruning.
    import org.apache.spark.sql.types._
    val dimType = dim.schema(dimKey).dataType
    val factType = fact.schema(factKey).dataType
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val bothIntegral = integral(dimType) && integral(factType)
    require(bothIntegral || dimType == factType,
      s"bloomPruneFact: key types must both be integral or identical — " +
        s"dim $dimKey is ${dimType.sql}, fact $factKey is ${factType.sql}; " +
        "cast the keys to a common type before pruning (a mixed encoding " +
        "would silently drop matching fact rows)")
    def asLong(c: org.apache.spark.sql.Column, t: DataType) =
      if (bothIntegral) c.cast("long") else xxhash64(c)
    // auto-size when the caller has no estimate: one count over the
    // (filtered) dim — trivial next to the fact scan the filter saves
    val n = if (expectedItems > 0) expectedItems
            else math.max(1L, dim.count())
    val bloom = dim.agg(
      BloomFilter.bloomBuild(
        asLong(col(dimKey), dim.schema(dimKey).dataType), n, fpp).as("__bf"))
    // 1-row broadcast => BroadcastNestedLoopJoin that streams the fact
    // side map-only; the probe stays in the scan's codegen stage
    fact.crossJoin(broadcast(bloom))
      .filter(BloomFilter.bloomMightContain(
        asLong(col(factKey), fact.schema(factKey).dataType), col("__bf")))
      .drop("__bf")
  }
}
