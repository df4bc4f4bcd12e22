package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.expressions._

/** The engine's full SQL-function surface in one place: every native
  * expression and TypedImperativeAggregate, as (name → builder) pairs.
  *
  * Two consumers:
  *  - [[registerAll]] — imperative per-session registration (what the
  *    query builders do piecemeal today via each object's `register`);
  *  - [[graft.plans.GraftExtensions]] — injects the same list through
  *    `SparkSessionExtensions.injectFunction`, so a user who only sets
  *    `spark.sql.extensions=graft.plans.GraftExtensions` gets the whole
  *    surface in plain `spark.sql(...)` with no Scala imports at all.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // vector math (native codegen loops)
    "vec_dot" -> ((e: Seq[Expression]) => VectorDot(e(0), e(1))),
    "vec_norm" -> ((e: Seq[Expression]) => VectorNorm(e.head)),
    "vec_unit" -> ((e: Seq[Expression]) => VectorNormalize(e.head)),
    "vec_q8" -> ((e: Seq[Expression]) => VectorQuantize(e.head)),
    "vec_dot_q8" -> ((e: Seq[Expression]) => VectorDotQ8(e(0), e(1))),
    "lsh_sig" -> ((e: Seq[Expression]) => LshSignature(e(0), e(1), e(2))),
    "nearest_cell" -> ((e: Seq[Expression]) => NearestCell(e(0), e(1), e(2))),
    "pq_encode" -> ((e: Seq[Expression]) => PqEncode(e(0), e(1), e(2))),
    "pq_encode_packed" -> ((e: Seq[Expression]) => PqEncodePacked(e(0), e(1), e(2))),
    "pq_encode_residual" -> ((e: Seq[Expression]) => PqEncodeResidual(e(0), e(1), e(2), e(3))),
    "pq_adc" -> ((e: Seq[Expression]) => PqAdc(e(0), e(1))),
    "pq_probe_cells" -> ((e: Seq[Expression]) => PqProbeCells(e(0), e(1), e(2))),
    "pq_cell_residual" -> ((e: Seq[Expression]) => PqCellResidual(e(0), e(1), e(2))),
    "pq_query_lut" -> ((e: Seq[Expression]) => PqQueryLut(e(0), e(1), e(2))),
    // fuzzy string comparators (DuckDB-pinned semantics)
    "jaro_sim" -> ((e: Seq[Expression]) => JaroSimilarity(e(0), e(1))),
    "jaro_winkler_sim" -> ((e: Seq[Expression]) => JaroWinklerSimilarity(e(0), e(1))),
    "damerau_levenshtein" -> ((e: Seq[Expression]) => DamerauLevenshtein(e(0), e(1))),
    // unicode normalization (pre-dedup canonicalization)
    "unicode_normalize" -> ((e: Seq[Expression]) => UnicodeNormalize(e(0), e(1))),
    // sorted-array set arithmetic
    "sorted_intersect_size" -> ((e: Seq[Expression]) => SortedIntersectSize(e(0), e(1))),
    "word_ngrams" -> ((e: Seq[Expression]) =>
      WordNgrams(e(0), ArrayExprs.extractN(e(1)))),
    // scalar codecs over literal tables
    "bpe_encode" -> ((e: Seq[Expression]) =>
      BpeEncodeExpr(e(0), BpeEncode.extractMerges(e(1)).toSeq)),
    "quantile_bucket" -> ((e: Seq[Expression]) =>
      QuantileBucket(e(0), QuantileBucketExpr.extractBounds(e(1)).toSeq)),
    // sketch / bounded-state aggregates
    "minhash_sig" -> ((e: Seq[Expression]) => MinHashAggregate(e(0), e(1))),
    "minhash_sig_arr" -> ((e: Seq[Expression]) => MinHashArraySignature(e(0), e(1))),
    "simhash_sig" -> ((e: Seq[Expression]) => SimHashAggregate(e.head)),
    "freq_sketch" -> ((e: Seq[Expression]) => FreqSketchAggregate(e(0), e(1))),
    "kmv_sketch" -> ((e: Seq[Expression]) => KmvSketchAggregate(e(0), e(1))),
    "topk_by" -> ((e: Seq[Expression]) => TopKAggregate(e(0), e(1), e(2))),
    "bloom_build" -> ((e: Seq[Expression]) => BloomBuildAggregate(e(0), e(1), e(2))),
    "bloom_might_contain" -> ((e: Seq[Expression]) => BloomMightContain(e(0), e(1))))

  /** Register every function on an existing session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registerIfAbsent(reg, name, builder, "built-in")
    }
  }

  /** Register-if-missing: operators defensively (re)register the natives
    * they use on every call, which is correct but — via
    * `createOrReplaceTempFunction` — replaced the live entry each time
    * and spammed every bench/pipeline log with hundreds of
    * "function X replaced a previously registered function" warnings.
    * The builders are all stateless singletons, so first-registration
    * wins is exactly as correct, and quiet — but ONLY when the existing
    * entry is ours: a user UDF squatting on a graft name (source !=
    * "built-in") must still be replaced, or operators would silently
    * score through foreign semantics.
    */
  def registerIfAbsent(
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      name: String, builder: Seq[Expression] => Expression,
      source: String): Unit = {
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    val oursAlready = reg.lookupFunction(id).exists(_.getSource == source)
    if (!oursAlready)
      reg.createOrReplaceTempFunction(name, builder, source)
  }
}
