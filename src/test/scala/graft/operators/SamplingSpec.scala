package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")

  test("split membership is invariant under repartition/reorder (the point)") {
    def membership(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.deterministicSplit(df.select($"doc_id"), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = membership(docs)
    assert(membership(docs.repartition(13)) == base)
    assert(membership(docs.orderBy($"doc_id".desc)) == base)
  }

  test("split proportions roughly match weights; splits are exhaustive and disjoint") {
    val split = Sampling.deterministicSplit(
      spark.range(20000).toDF("doc_id"), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000)
    assert(math.abs(counts("train") - 16000.0) / 16000.0 < 0.05)
    assert(math.abs(counts("val") - 2000.0) / 2000.0 < 0.2)
  }

  test("stratified sample keeps only configured strata at ~their rates") {
    val sampled = Sampling.stratifiedSample(
      docs.select($"doc_id", $"lang"), "doc_id", "lang",
      Map("en" -> 50, "es" -> 25))
    val langs = sampled.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "es")))
    val enTotal = docs.filter($"lang" === "en").count().toDouble
    val enKept = sampled.filter($"lang" === "en").count().toDouble
    assert(enTotal == 0 || math.abs(enKept / enTotal - 0.5) < 0.2)
    // different salt -> different sample (salting works)
    val other = Sampling.stratifiedSample(
      docs.select($"doc_id", $"lang"), "doc_id", "lang",
      Map("en" -> 50, "es" -> 25), salt = "v2")
    assert(other.select("doc_id").as[Long].collect().toSet !=
      sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("mixtureSample: kept counts approach targets, membership layout-stable") {
    val docs = Tables.load(spark, sf, "documents").select($"doc_id", $"lang")
    val targets = Map("en" -> 100L, "es" -> 50L, "de" -> 50L, "fr" -> 50L, "zh" -> 50L)
    val kept = Sampling.mixtureSample(docs, "doc_id", "lang", targets)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (lang, tgt) =>
      val n = byLang.getOrElse(lang, 0L)
      val avail = totals(lang)
      if (tgt >= avail) assert(n == avail, s"$lang should keep everything")
      else {
        // binomial concentration: within 4 sigma of the target
        val sigma = math.sqrt(tgt.toDouble)
        assert(math.abs(n - tgt) <= 4 * sigma + 1,
          s"$lang kept $n, target $tgt (avail $avail)")
      }
    }
    // stability: same membership on a different layout
    val again = Sampling.mixtureSample(docs.repartition(17), "doc_id", "lang", targets)
    assert(again.select("doc_id").as[Long].collect().toSet ==
      kept.select("doc_id").as[Long].collect().toSet)
    // a domain with no target keeps nothing; an oversized target keeps all
    val only = Sampling.mixtureSample(docs, "doc_id", "lang", Map("en" -> 100000L))
    assert(only.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    assert(only.count() == totals("en"))
  }

  test("selectByTokenBudget: greedy-by-quality prefix, crossing doc kept, layout-invariant") {
    val df = Seq(
      (1L, 0.9, 100L), (2L, 0.8, 200L), (3L, 0.8, 50L),
      (4L, 0.5, 400L), (5L, 0.3, 10L))
      .toDF("id", "q", "tok")
    def ids(d: org.apache.spark.sql.DataFrame, budget: Long): Set[Long] =
      Sampling.selectByTokenBudget(d, "id", "q", "tok", budget)
        .select("id").as[Long].collect().toSet
    // order: 1 (100), 2 (200, ties 0.8 resolve by id), 3 (50), 4, 5
    assert(ids(df, 100) == Set(1L))             // exactly spent
    assert(ids(df, 101) == Set(1L, 2L))         // 2 crosses the budget: kept whole
    assert(ids(df, 350) == Set(1L, 2L, 3L))
    assert(ids(df, 351) == Set(1L, 2L, 3L, 4L))
    assert(ids(df, 1L << 40) == Set(1L, 2L, 3L, 4L, 5L))
    // layout invariance on real data vs a naive single-window reference
    val docs = Tables.load(spark, sf, "documents").select(
      $"doc_id",
      graft.functions.TextFunctions.qualityScore($"text").as("q"),
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("tok"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"q".desc, $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("b", coalesce(sum($"tok").over(w), lit(0L)))
      .filter($"b" < 3000).select("doc_id").as[Long].collect().toSet
    val distributed = Sampling
      .selectByTokenBudget(docs.repartition(13), "doc_id", "q", "tok", 3000)
      .select("doc_id").as[Long].collect().toSet
    assert(distributed == naive)
  }

  test("uniformPerGroup: exactly k per big group, layout-invariant, no window") {
    val events = Tables.load(spark, sf, "events")
    def ids(parts: Int): Map[Long, Set[Long]] =
      Sampling.uniformPerGroup(events.repartition(parts), "user_id", "event_id", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
    val a = ids(1)
    val b = ids(13)
    assert(a == b, "sample changed with partitioning")
    val groupSizes = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (u, s) =>
      assert(s.size == math.min(3L, groupSizes(u)), s"user $u got ${s.size}")
    }
    // plan shape: bounded-heap aggregate, no Window operator
    val plan = Sampling.uniformPerGroup(events, "user_id", "event_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-group sample fell back to a window:\n$plan")
  }

  test("weightedSample: exact k, layout-invariant membership, no Window") {
    val rows = (1L to 2000L).map(i => (i, (i % 100 + 1).toDouble))
      .toDF("id", "w")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.weightedSample(df, "id", "w", k = 150)
        .as[Long].collect().toSet
    val a = ids(rows.repartition(1))
    assert(a.size === 150)
    assert(ids(rows.repartition(17)) === a, "membership changed with layout")
    val plan = Sampling.weightedSample(rows, "id", "w", 150)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"weighted sample fell back to a window:\n$plan")
  }

  test("weightedSample: selection is weight-biased (ES property)") {
    // half the corpus at weight 1, half at weight 20: the heavy half
    // must dominate the sample far beyond its 50% share
    val rows = (1L to 2000L).map(i =>
      (i, if (i <= 1000) 1.0 else 20.0)).toDF("id", "w")
    val sample = Sampling.weightedSample(rows, "id", "w", k = 200)
      .as[Long].collect()
    val heavy = sample.count(_ > 1000L)
    assert(heavy > 150,
      s"weight-20 rows took only $heavy of 200 slots — sampling is not weight-biased")
  }

  test("weightedSample: null and non-positive weights are excluded") {
    val rows = Seq(
      (1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-2.0)), (4L, None),
      (5L, Some(1.0))).toDF("id", "w")
    val got = Sampling.weightedSample(rows, "id", "w", k = 10)
      .as[Long].collect().toSet
    assert(got === Set(1L, 5L))
  }

  test("heap samplers refuse non-integral ids; null-id rows split to NULL") {
    val strIds = Seq(("doc-1", "a"), ("doc-2", "a")).toDF("id", "g")
    val e1 = intercept[IllegalArgumentException](
      Sampling.uniformPerGroup(strIds, "g", "id", k = 1))
    assert(e1.getMessage.contains("integral"))
    val weighted = Seq(("doc-1", 1.0)).toDF("id", "w")
    val e2 = intercept[IllegalArgumentException](
      Sampling.weightedSample(weighted, "id", "w", k = 1))
    assert(e2.getMessage.contains("integral"))
    // a null id must NOT fall through into the last split (eval bias)
    val withNull = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val splits = Sampling.deterministicSplit(withNull, "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => Option(r.get(0)) -> Option(r.getString(1))).toMap
    assert(splits(None).isEmpty, "null id must get a NULL split")
    assert(splits(Some(1L)).nonEmpty && splits(Some(2L)).nonEmpty)
  }

  test("leakageSafeSplit: groups never straddle; assignment is the representative's") {
    val rows = (0L until 1000L).map(i => (i, s"grp${i % 40}"))
    val df = rows.toDF("doc_id", "grp")
    val split = Sampling.leakageSafeSplit(df, "doc_id", "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.count() === 1000L) // the join loses nothing
    val straddles = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddles === 0L)
    // each group's split IS deterministicSplit of its min id
    val expected = Sampling.deterministicSplit(
        df.groupBy("grp").agg(min("doc_id").as("rep")), "rep",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    split.select("grp", "split").distinct().collect().foreach { r =>
      assert(expected(r.getString(0)) === r.getString(1))
    }
  }

  test("leakageSafeSplit: null groups are independent singletons, not one fused bucket") {
    val df = (0L until 500L).map(i => (i, None: Option[String]))
      .toDF("doc_id", "grp")
    val split = Sampling.leakageSafeSplit(df, "doc_id", "grp",
      Seq("train" -> 50, "test" -> 50))
    assert(split.count() === 500L, "null-group rows must not be dropped")
    val perSplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a fused null bucket would put all 500 in ONE split; independent
    // singletons land near 50/50
    assert(perSplit.keySet === Set("train", "test"))
    assert(perSplit.values.forall(n => n > 150 && n < 350), perSplit.toString)
  }

  test("leakageSafeSplit: adding a non-representative row never moves the group") {
    val base = Seq((10L, "a"), (20L, "a"), (5L, "b")).toDF("doc_id", "grp")
    val grown = Seq((10L, "a"), (20L, "a"), (30L, "a"), (5L, "b"))
      .toDF("doc_id", "grp") // 30 > 10: representative unchanged
    def assign(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      Sampling.leakageSafeSplit(df, "doc_id", "grp",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("grp", "split").distinct()
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(assign(base) == assign(grown)) // same group→split map
  }

  test("leakageSafeSplit: (null group, null id) keeps its row with a NULL split") {
    val df = Seq(
      (Some(1L), Some("a")),
      (None: Option[Long], None: Option[String]),
      (Some(2L), None: Option[String]))
      .toDF("doc_id", "grp")
    val out = Sampling.leakageSafeSplit(df, "doc_id", "grp",
        Seq("train" -> 50, "test" -> 50))
      .collect().map(r => Option(r.get(0)) -> Option(r.getString(2))).toMap
    assert(out.size === 3, "no row may be silently dropped")
    assert(out(None).isEmpty, "unassignable row must carry a NULL split")
    assert(out(Some(1L)).nonEmpty && out(Some(2L)).nonEmpty)
  }

  test("leakageSafeSplit: a group value that LOOKS like a singleton key never fuses") {
    // group "s:42" (an arbitrary real-world string) vs the null-group
    // singleton of id 42 — the prefixed keyspace keeps them apart
    val df = Seq(
      (100L, Some("s:42")), (101L, Some("s:42")),
      (42L, None: Option[String]))
      .toDF("doc_id", "grp")
    val out = Sampling.leakageSafeSplit(df, "doc_id", "grp",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    // the real group hashes on rep 100, the singleton on 42 — assert the
    // group rows agree with each other and the singleton is independent
    val byId = out.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(100L) === byId(101L))
    val expectSolo = Sampling.deterministicSplit(
        Seq(42L).toDF("id"), "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .head().getString(1)
    val expectGroup = Sampling.deterministicSplit(
        Seq(100L).toDF("id"), "id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .head().getString(1)
    assert(byId(42L) === expectSolo)
    assert(byId(100L) === expectGroup)
  }

  test("leakageSafeSplit: re-splitting replaces an existing split column") {
    val df = Seq((1L, "a", "stale"), (2L, "b", "stale"))
      .toDF("doc_id", "grp", "split")
    val out = Sampling.leakageSafeSplit(df, "doc_id", "grp",
      Seq("train" -> 50, "test" -> 50))
    assert(out.columns.count(_ == "split") === 1)
    assert(out.select("split").collect().forall(_.getString(0) != "stale"))
  }

  test("stratifiedExactSplit: cell counts are exact integer fractions, layout-stable; nulls handled") {
    val df = (0 until 97).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "g")
    val out = Sampling.stratifiedExactSplit(df, "id", "g",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = out.groupBy($"g", $"split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // strata sizes: s0=33, s1=32, s2=32; exact thresholds floor(n*80/100),
    // floor(n*90/100): s0 -> 26/3/4, s1/s2 -> 25/3/4
    assert(counts(("s0", "train")) === 26L && counts(("s0", "val")) === 3L &&
      counts(("s0", "test")) === 4L)
    for (g <- Seq("s1", "s2"))
      assert(counts((g, "train")) === 25L && counts((g, "val")) === 3L &&
        counts((g, "test")) === 4L)
    // assignment is layout-independent (md5 rank, not partition order)
    val again = Sampling.stratifiedExactSplit(df.repartition(17), "id", "g",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select($"id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select($"id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === first)
    // a NULL id gets a NULL split and never consumes a threshold slot
    val withNull = (Seq((Some(1L), "a"), (None: Option[Long], "a"),
      (Some(2L), "a"), (Some(3L), "a"), (Some(4L), "a"))).toDF("id", "g")
    val ns = Sampling.stratifiedExactSplit(withNull, "id", "g",
      Seq("train" -> 50, "test" -> 50))
    val rows = ns.select($"id", $"split")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1))))
    assert(rows.collect { case (None, sp) => sp } === Array(None))
    // 4 non-null ids at 50/50: exactly 2 train + 2 test
    val nn = rows.collect { case (Some(_), Some(sp)) => sp }
    assert(nn.count(_ == "train") === 2 && nn.count(_ == "test") === 2)
    // NULL strata form their own exact cell, not dropped
    val nullG = (0 until 10).map(i => (i.toLong,
      if (i < 4) null else "x")).toDF("id", "g")
    val ng = Sampling.stratifiedExactSplit(nullG, "id", "g",
      Seq("train" -> 50, "test" -> 50))
    assert(ng.filter($"g".isNull && $"split" === "train").count() === 2L)
  }
}
