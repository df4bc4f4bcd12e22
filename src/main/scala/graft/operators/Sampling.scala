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

  /** The heap-based samplers ride ids through [[graft.expressions
    * .TopKAgg]] as longs — a non-integral id column would cast to
    * all-null, the aggregate would skip every row, and the sample would
    * come back silently EMPTY. Refuse loudly instead (the
    * [[Similarity]] top-k guard, same reason).
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val t = df.schema(idCol).dataType
    val ok = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"$op needs an integral id column, got $t in '$idCol' — " +
      "dictionary-encode or hash string ids first")
  }

  /** md5-derived bucket in [0, buckets): stable per id, uniform. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    pmod(
      conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long"),
      lit(buckets.toLong))

  /** Assign train/val/test by cumulative percentage over the hash bucket
    * space. `weights` are integer percents summing to <= 100 (the
    * remainder, if any, becomes the last split). A NULL id gets a NULL
    * split — the old fallthrough silently funneled every null-id row
    * into the LAST split (usually 'test'), biasing the eval set.
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
    df.withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string")).otherwise(expr))
  }

  /** EXACT-count stratified split: within each stratum, rows rank by
    * md5 priority and the first ⌊n_s·p₁⌋ go to split 1, the next up to
    * ⌊n_s·(p₁+p₂)⌋ to split 2, … — so every stratum's split sizes are
    * EXACT integer fractions of that stratum, not binomial like
    * [[deterministicSplit]] (hash splits wobble ±√n per cell, which at
    * small strata — a rare language, a tiny domain — can leave an eval
    * cell empty). Deterministic and content-stable (md5 of the id, no
    * RNG), and exactly replayable in SQL as `ROW_NUMBER() OVER
    * (PARTITION BY stratum ORDER BY md5(id))` against the same
    * cumulative ⌊n_s·Σp⌋ thresholds (the `split_stratified_exact` gate
    * hash-oracles it).
    *
    * Trade-offs vs the hash split, stated honestly: adding rows to a
    * stratum can MOVE existing rows between splits (the thresholds
    * shift — exact counts and membership stability are mutually
    * exclusive; use [[deterministicSplit]]/[[leakageSafeSplit]] when
    * stability under growth matters more than exact fractions), and
    * the per-stratum rank is a stratum-local window — fine for the
    * bounded strata this is for (languages, sources, label classes);
    * a single giant stratum would funnel through one reducer's sort.
    * NULL ids get a NULL split (as everywhere); NULL strata form their
    * own stratum (exact fractions of the null cell, not dropped).
    *
    * Duplicate ids within a stratum (ADVICE r11): identical ids hash to
    * identical md5 priorities, so the rank order among them is broken by
    * a FULL-ROW xxhash64 tie-break — deterministic up to rows that are
    * identical in every column (which are interchangeable, so any order
    * is the same split assignment). With unique ids per stratum — the
    * contract the `split_stratified_exact` oracle replays — the
    * tie-break never fires and the SQL window order is unchanged.
    */
  def stratifiedExactSplit(
      df: DataFrame, idCol: String, stratumCol: String,
      splits: Seq[(String, Int)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      "split percents must sum to <= 100")
    // null-id rows rank LAST and are excluded from n, so they can never
    // consume a threshold slot a real row should have gotten (their own
    // split is forced NULL below)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col(idCol).isNull.asc,
        md5(concat(col(idCol).cast("string"), lit(salt))),
        xxhash64(df.columns.map(col).toIndexedSeq: _*))
    val n = count(col(idCol)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol)))
    val rn = row_number().over(w)
    // cumulative integer thresholds: rank <= (n_s * Σp) / 100, exact
    // integer arithmetic in both engines
    val cutoffs = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val expr = splits.map(_._1).zip(cutoffs).init
      .foldRight(
        // remainder (if percents sum to 100, the last cutoff covers it;
        // if < 100, the tail past the last cutoff gets a NULL split —
        // visibly unassigned, same stance as null ids)
        when(rn <= floor(n * cutoffs.last / 100), splits.last._1)
          .otherwise(lit(null).cast("string"))) {
        case ((name, cutoff), rest) =>
          when(rn <= floor(n * cutoff / 100), name).otherwise(rest)
      }
    df.drop("split").withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string")).otherwise(expr))
  }

  /** GROUP-aware train/val/test split — the leakage-safe form of
    * [[deterministicSplit]]: every row of a group (a near-dup cluster,
    * a source domain, a user) lands in the SAME split, because eval
    * contamination at corpus scale is rarely an identical row — it's
    * the near-copy or same-domain sibling of a training row, and a
    * row-hashed split happily puts those on opposite sides. The split
    * is hashed on the group's REPRESENTATIVE (min id — deterministic
    * and content-stable like everything else here), so adding rows to
    * a group never moves it between splits unless the new row becomes
    * the representative.
    *
    * A NULL group is a SINGLETON (keyed by the row's own id), not a
    * shared bucket: null-keyed rows would otherwise either be silently
    * dropped by the join or — worse — fused into one giant fake group
    * that lands whole in one split. Group keys and singleton keys live
    * under DISTINCT prefixes ("g:"/"s:"), so a group VALUE that happens
    * to look like a synthetic key can never fuse with one. A row with
    * BOTH group and id NULL gets a NULL split (retained, visibly
    * unassigned — [[deterministicSplit]]'s pinned null-id behavior),
    * never silently dropped. A pre-existing `split` column is REPLACED,
    * matching [[deterministicSplit]]'s withColumn semantics.
    *
    * Scale shape: one groupBy and one join, both hash-partitioned on
    * the group key (the same exchange, reused), no windows, no
    * broadcast of anything data-sized. Skew-safe: the per-group state
    * is one (rep, split) row regardless of group size.
    */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, groupCol: String,
      splits: Seq[(String, Int)], salt: String = ""): DataFrame = {
    requireIntegralId(df, idCol, "leakageSafeSplit")
    val keyed = df.drop("split").withColumn("__grp",
      when(col(groupCol).isNotNull,
        concat(lit("g:"), col(groupCol).cast("string")))
        .otherwise(concat(lit("s:"), col(idCol).cast("string"))))
    val assigned = deterministicSplit(
        keyed.groupBy(col("__grp")).agg(min(col(idCol)).as("__rep")),
        "__rep", splits, salt)
      .select(col("__grp"), col("split"))
    // LEFT join: the only unmatched key is the NULL __grp of a
    // (NULL group, NULL id) row — it keeps its row with a NULL split
    keyed.join(assigned, Seq("__grp"), "left").drop("__grp")
  }

  /** Deterministic uniform k-sample per group: keep the k rows with the
    * SMALLEST md5-derived priority in each group — bottom-k hash
    * sampling, the content-stable "cap every group at k" primitive
    * (eval-set construction, per-domain caps, per-user debiasing).
    * Uniform because the hash priority is uniform; stable because the
    * same row always hashes the same; mergeable because bottom-k runs on
    * the bounded-heap [[graft.expressions.TopKAgg]] — map tasks keep
    * k-element heaps, so no group funnels its rows through one reducer's
    * sort (a row_number window would).
    */
  def uniformPerGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = ""): DataFrame = {
    requireIntegralId(df, idCol, "uniformPerGroup")
    graft.expressions.TopKAgg.register(df.sparkSession)
    val priority =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long")
    df.select(col(groupCol), col(idCol).cast("long").as(idCol), priority.as("__p"))
      .groupBy(col(groupCol))
      // priority is 32 bits (8 hex chars) — exact as the double score
      .agg(graft.expressions.TopKAgg
        .topKBy(-col("__p").cast("double"), col(idCol), k).as("__topk"))
      .select(col(groupCol), explode(col("__topk")).as("__hit"))
      .select(col(groupCol), col("__hit.corpus_id").as(idCol))
  }

  /** Domain-mixture resampling: downsample each domain toward a target
    * row count so the kept corpus approaches a prescribed mixture (the
    * "20% code, 40% web, ..." knob every pretraining data pipeline
    * ends with). Per-domain counts are aggregated first (a domain-sized
    * result — safe to collect), each domain gets a hash threshold
    * `ceil(target/count · RES)`, and a row survives iff its salted
    * md5 bucket clears its domain's threshold. Content-stable like
    * every sampler here: membership survives repartitioning and reruns,
    * and the kept count concentrates tightly around the target
    * (binomial, not exact-k — use [[uniformPerGroup]] when a hard cap
    * matters more than one-pass scalability). Domains absent from
    * `targetRows` keep nothing; targets above the domain's count keep
    * the whole domain.
    */
  def mixtureSample(
      df: DataFrame, idCol: String, domainCol: String,
      targetRows: Map[String, Long], salt: String = ""): DataFrame = {
    val res = 1000000
    val counts = df.groupBy(col(domainCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = targetRows.foldLeft(lit(0L): Column) {
      case (acc, (domain, tgt)) =>
        val n = counts.getOrElse(domain, 0L)
        val thr = if (n == 0L) 0L else math.min(res.toLong, (tgt * res + n - 1) / n)
        when(col(domainCol) === domain, lit(thr)).otherwise(acc)
    }
    df.filter(
      hashBucket(concat(col(idCol).cast("string"), lit("|"), col(domainCol)), res, salt)
        < threshold)
  }

  /** Token-budget corpus selection: take documents in descending
    * quality order until the token budget is spent — the "best N
    * billion tokens" selection every pretraining mix ends with. One
    * global sort (range-partitioned, fully parallel) + one running-sum
    * window; the budget check admits the document that CROSSES the
    * budget (standard: the budget bounds where the cut falls, the last
    * doc is kept whole). Ties on quality resolve by id, so selection is
    * deterministic and layout-invariant.
    */
  def selectByTokenBudget(
      df: DataFrame, idCol: String, qualityCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    // The two-phase distributed prefix sum lives in
    // [[TotalOrder.prefixAggs]] (range partition on the selection
    // order, window within partitions, per-partition offsets broadcast
    // back — no single-reducer sort); this used to hand-roll the same
    // machinery. Spent-before = inclusive prefix minus the row's own
    // (null-coalesced) cost, exactly [[ShardExport.assignShards]]'s
    // start-offset trick.
    val ordered = Seq(col(qualityCol).desc, col(idCol).asc)
    TotalOrder.prefixAggs(
        df.withColumn("__tok0", coalesce(col(tokenCol).cast("long"), lit(0L))),
        ordered, sums = Seq("__tok0" -> "__spent"))
      .filter(col("__spent") - col("__tok0") < budget)
      .drop("__tok0", "__spent")
  }

  /** Weighted sampling WITHOUT replacement, k rows, deterministic
    * (Efraimidis–Spirakis A-Res): each row gets priority ln(u)/w where
    * u ∈ (0,1] is its md5-derived uniform and w its weight; the k
    * largest priorities form an exact weighted sample without
    * replacement. Same content-stable story as every sampler here —
    * u comes from the id hash, not an RNG, so membership survives
    * repartitioning, reruns, and engine changes.
    *
    * Scale: global top-k on the bounded-heap
    * [[graft.expressions.TopKAgg]] — map tasks keep k-element heaps and
    * the final reduce merges (partitions × k) candidates, so no global
    * sort and no single-reducer funnel (this is `selectByTokenBudget`'s
    * cheaper cousin: fixed row budget instead of a token budget).
    *
    * Rows with null or non-positive weight are excluded (ln(u)/w flips
    * sign at w ≤ 0 — such a row would OUTRANK everything).
    *
    * Returns (idCol) — the selected ids, join back for payload.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = ""): DataFrame = {
    requireIntegralId(df, idCol, "weightedSample")
    graft.expressions.TopKAgg.register(df.sparkSession)
    val h =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 8), 16, 10)
        .cast("long")
    val u = (h + lit(1L)) / lit(4294967296.0) // (0, 1]: ln is finite
    val priority = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol).cast("long").as(idCol), priority.as("__pri"))
      .agg(graft.expressions.TopKAgg
        .topKBy(col("__pri"), col(idCol), k).as("__topk"))
      .select(explode(col("__topk")).as("__hit"))
      .select(col("__hit.corpus_id").as(idCol))
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
