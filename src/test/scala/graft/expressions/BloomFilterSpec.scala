package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BloomPrune

/** Pins the three bloom-filter invariants the pruning operator relies on:
  * no false negatives over the full key set, observed false-positive rate
  * within 2x of configured, and interpreted eval identical to generated
  * code (the probe runs inside whole-stage codegen in the gate query).
  */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val nKeys = 5000L
  private val fpp = 0.03

  // members: 0..4999 scaled by a prime; absent: offset by 1 (never members)
  private def members = spark.range(nKeys).select(($"id" * 7919L).as("k"))
  private def absent = spark.range(20000).select(($"id" * 7919L + 1L).as("k"))

  private def builtFilter: Array[Byte] = {
    BloomFilter.register(spark)
    members.agg(BloomFilter.bloomBuild($"k", nKeys, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  test("no false negatives: every inserted key probes true") {
    BloomFilter.register(spark)
    val bloom = members.agg(BloomFilter.bloomBuild($"k", nKeys, fpp).as("bf"))
    val missed = members.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.bloomMightContain($"k", $"bf"))
      .count()
    assert(missed == 0, s"$missed false negatives — bloom contract broken")
  }

  test("observed false-positive rate stays within 2x of configured fpp") {
    val bf = builtFilter
    val falsePositives = absent
      .filter(BloomFilter.bloomMightContain($"k", lit(bf)))
      .count()
    val observed = falsePositives.toDouble / 20000
    assert(observed <= 2 * fpp, f"observed FPP $observed%.4f > 2x configured $fpp")
  }

  test("interpreted eval == generated code over members and non-members") {
    val bf = builtFilter
    val probes = members.unionAll(absent)
    def results(factoryMode: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", factoryMode)
      try probes.filter(BloomFilter.bloomMightContain($"k", lit(bf)))
        .as[Long].collect().sorted.toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val interpreted = results("NO_CODEGEN")
    val codegen = results("CODEGEN_ONLY")
    assert(interpreted == codegen,
      s"interpreted (${interpreted.size}) != codegen (${codegen.size})")
    // and both agree with the static probe the generated code calls
    val direct = probes.as[Long].collect()
      .filter(BloomFilter.mightContain(bf, _)).sorted.toSeq
    assert(direct == codegen)
  }

  test("merge across partitions: partial bit arrays OR together losslessly") {
    BloomFilter.register(spark)
    // 32 partitions force map-side partial buffers + a final merge
    val bloom = members.repartition(32)
      .agg(BloomFilter.bloomBuild($"k", nKeys, fpp).as("bf"))
    val missed = members.crossJoin(broadcast(bloom))
      .filter(!BloomFilter.bloomMightContain($"k", $"bf"))
      .count()
    assert(missed == 0)
  }

  test("prune keeps all joinable rows and the probe stays map-only on the fact") {
    val fact = spark.range(20000).select(
      $"id".as("f_id"), ($"id" % 1000L).as("f_key"))
    val dim = spark.range(100).select(($"id" * 10L).as("d_key")) // 100 of 1000 keys
    val pruned = BloomPrune.prune(fact, "f_key", dim, "d_key",
      expectedItems = 100L, fpp = 0.01)
    // superset of the true semi-join (no false negatives), bounded overhead
    val trueMatches = fact.join(dim, $"f_key" === $"d_key", "left_semi")
    assert(pruned.join(dim, $"f_key" === $"d_key", "left_semi").count() ==
      trueMatches.count())
    val prunedCount = pruned.count()
    assert(prunedCount >= trueMatches.count())
    assert(prunedCount <= (trueMatches.count() * 1.5).toLong,
      s"pruned $prunedCount vs true ${trueMatches.count()} — filter not selective")
    // plan shape: broadcast of the 1-row filter, no shuffle of the fact side
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("oversized filters and column-valued parameters are refused at analysis") {
    // m for 2e9 items at 1% overflows the Int byte-size math — clamp
    val e = intercept[IllegalArgumentException](
      BloomFilter.parameters(2000000000L, 0.01))
    assert(e.getMessage.contains("bit"))
    // a column-valued n must fail at ANALYSIS, not executor-side NPE
    BloomFilter.register(spark)
    val df = Seq((1L, 10L)).toDF("k", "n")
    df.createOrReplaceTempView("bf_fold")
    val err = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT bloom_build(k, n, 0.01d) FROM bf_fold").collect())
    assert(err.getMessage.contains("literal"))
  }
}
