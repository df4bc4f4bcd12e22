package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench", cpus.toInt)
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + parquet footer caches, so the first timed
    // query doesn't absorb session start-up
    try {
      graft.Tables.all.foreach(t =>
        graft.Tables.load(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    // local iteration only: SPARK_GRAFT_ONLY=q1,q2 times a subset (the
    // driver never sets it)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // failed queries report -1 (never a fake timing) and are excluded
    // from the total, so a regression cannot "improve" the benchmark.
    // Each run times TWO phases: the gate-fn call (for ordinary gates a
    // lazy plan build, ~0; for the persisted-index gates the eager
    // index BUILD) and the count() (the query/probe execution) — so
    // bench_detail.json can attribute an index gate's cost to build vs
    // the amortized probe without splitting the gate.
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) =
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (-1.0, -1.0)
      }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val firstRun: Seq[(String, (Double, Double))] =
      queries.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results: Map[String, Double] = firstRun.map { case (name, (setup, exec)) =>
      name -> (if (setup < 0) -1.0 else setup + exec)
    }.toMap
    // repeatability: the top-20 most expensive gates run 2 more times
    // and report the min-of-3 WARM number alongside the single-shot one
    // — single-run timings at 0.3-9 s amplitude could not distinguish
    // JVM/IO noise from a real plan regression (VERDICT r6 item 3).
    // SPARK_GRAFT_WARM=0 skips the re-runs (scale studies at 10×+ data,
    // where a second pass over the heavy tail costs more than the
    // noise it removes); the driver never sets it.
    val fnByName = queries.toMap
    val warmRuns = sys.env.get("SPARK_GRAFT_WARM").forall(_ != "0")
    val top20 =
      if (!warmRuns) Seq.empty
      else results.toSeq.filter(_._2 > 0).sortBy(-_._2).take(20).map(_._1)
    val warm: Map[String, Double] = top20.map { name =>
      val reruns = (1 to 2).map { _ =>
        val (s, e) = timeOnce(name, fnByName(name))
        if (s < 0) Double.MaxValue else s + e
      }
      name -> math.min(results(name), reruns.min)
    }.toMap
    // The driver captures a fixed-size tail (~2000 chars) of the run
    // output; with 85+ registered queries a full per-query dump pushes
    // the start of the JSON line out of the window and the driver
    // records parsed=null. So the stdout line carries a curated headline
    // subset (every family's representative + the historically expensive
    // queries) plus anything that measured >=0.5 s this run, at 3
    // decimals; the complete map goes to bench_detail.json next to the
    // repo for local analysis.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val headline: Set[String] = Set(
      "q1_agg", "a1_dup_audit", "a8_percentile", "a10_ratio_of_aggs",
      "a12_rollup", "j1_left_join_broadcast", "j3_star_join",
      "j11_set_ops", "w1_row_number", "w2_top1_per_group",
      "s6_insert_only_merge",
      "s7_scd1_merge", "tpch_q3_shape", "tpch_q4_shape", "tpch_q5_shape",
      "zorder_cluster", "bloom_prune_join", "ivm_refresh", "asof_join",
      "range_join", "skew_salted_join", "dedup_exact", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_ngram_jaccard", "dedup_clusters",
      "dedup_corpus", "sim_topk_bruteforce", "sim_ivf_topk",
      "sim_topk_quantized", "sim_neardup_embedding",
      "text_tfidf", "sample_per_group", "pack_sequences", "curation_e2e",
      "stream_session_agg", "stream_dedup",
      "mm_features", "freq_heavy_hitters", "sim_lsh_neardup",
      "text_lm_score", "mixture_sample", "stream_interval_join",
      "s15_scd2_merge", "semantic_dedup", "decontam_overlap",
      // round-4 batches 3-8
      "pagerank_parts", "graph_bfs", "dedup_fuzzy_names",
      "sample_weighted", "emb_class_stats", "market_basket")
    val shown = results.toSeq
      .filter { case (k, v) => headline(k) || v >= 0.5 || v < 0 }
      .sortBy(_._1)
    def render(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    // hard cap: the driver's capture window is ~2000 chars and must hold
    // the WHOLE line — under heavy machine load many queries cross the
    // 0.5 s bar, so shed the non-headline extras first, then the fastest
    // headline entries, before the line can outgrow the window
    var qs = render(shown)
    if (qs.length > 1600) qs = render(shown.filter { case (k, v) => headline(k) || v < 0 })
    if (qs.length > 1600)
      qs = render(shown.filter(_._2 != 0)
        .sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
        .take(45).sortBy(_._1))
    val total = results.values.filter(_ >= 0).sum
    val fullJson = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // phases: only gates whose fn call did real work (index builds) —
    // a lazy plan construction under 50 ms is noise, not a phase
    val phasesJson = firstRun
      .filter { case (_, (setup, _)) => setup >= 0.05 }
      .sortBy(_._1)
      .map { case (k, (s, e)) =>
        s"\"" + k + "\":{\"setup\":" + fmt(s) + ",\"exec\":" + fmt(e) + "}" }
      .mkString("{", ",", "}")
    val warmJson = warm.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        (s"""{"total":${fmt(total)},"sf":"$sfDir","queries":$fullJson,""" +
          s""""phases":$phasesJson,"warm":$warmJson}""").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // queries_timed lets a round-over-round reader normalize the total:
    // the registry grows every round, so total alone is not comparable
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries_timed":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
