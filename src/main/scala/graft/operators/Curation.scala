package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-data curation operators beyond the dedup/similarity family:
  * benchmark decontamination, chunking, and intra-document repetition
  * statistics. All three are built from codegen'd column expressions
  * (no UDFs) so the per-document work runs at scan speed; the only
  * shuffle in the family is decontamination's count-distinct, and its
  * benchmark side is broadcast (benchmark suites are tiny relative to a
  * training corpus).
  */
object Curation {

  private def nonEmptyText(textCol: String): Column =
    coalesce(trim(col(textCol)), lit("")) =!= ""

  // ---------------------------------------------------- decontamination
  /** Benchmark decontamination via word n-gram overlap (the standard
    * contamination check run before training: any training document
    * sharing an n-gram with an evaluation benchmark is flagged).
    *
    * Plan shape at 100 TB: the benchmark n-gram set is DISTINCT'd and
    * broadcast (eval suites are MBs, the corpus is TBs — never shuffle
    * the corpus for this); the training side is one scan + explode +
    * broadcast-hash semi-join + count-distinct per doc. The final left
    * join restores zero-hit documents so the output is a full audit,
    * not just the flagged tail.
    */
  def decontaminate(
      training: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val bench = benchmark
      .filter(nonEmptyText(textCol))
      .select(explode(TextFunctions.wordNgrams(col(textCol), n)).as("g"))
      .distinct()
    val hits = training
      .filter(nonEmptyText(textCol))
      .select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n)).as("g"))
      .join(broadcast(bench), "g")
      .groupBy(idCol)
      .agg(countDistinct(col("g")).as("n_hits"))
    training
      .filter(nonEmptyText(textCol))
      .select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  // --------------------------------------------------------- chunking
  /** Sliding token-window chunking (RAG / context-window prep): each
    * document becomes ceil-spaced chunks of `chunkSize` tokens with
    * `overlap` tokens shared between neighbours. Chunk count for L
    * tokens is 1 if L <= chunkSize else floor((L-chunkSize+stride-1)/
    * stride)+1 with stride = chunkSize-overlap, so the last chunk always
    * reaches the final token.
    *
    * Map-only: split + sequence + explode + slice, all inside
    * whole-stage codegen — zero shuffles, embarrassingly parallel over
    * any corpus size. (floor() on both engines; a bare int cast would
    * diverge — Spark truncates, DuckDB rounds.)
    */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    df.filter(nonEmptyText(textCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__L", size(col("__toks")))
      .withColumn("__n_chunks",
        when(col("__L") <= chunkSize, lit(1))
          .otherwise(floor((col("__L") - chunkSize + (stride - 1)) / lit(stride.toDouble))
            .cast("int") + 1))
      .select(col(idCol), col("__toks"), col("__L"),
        explode(sequence(lit(0), col("__n_chunks") - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        least(lit(chunkSize), col("__L") - col("chunk_idx") * stride)
          .cast("int").as("n_chunk_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  // ----------------------------------------------- repetition statistics
  /** Gopher-style intra-document repetition statistics: top-token
    * fraction, duplicate-bigram fraction, distinct-token ratio, and the
    * composite `repetitive` filter flag.
    *
    * Deliberately map-only: every statistic is an array expression over
    * the token list (array_distinct / filter / transform), so the whole
    * operator is one codegen'd scan pass — no explode, no shuffle. The
    * top-token count is O(distinct x length) per document, fine for
    * natural documents; an exploded two-level aggregation would trade a
    * full shuffle for linear per-doc work and only wins on pathological
    * million-token documents.
    *
    * The flag is computed from the ROUNDED fractions so the filter
    * decision is bit-identical to any external system (the DuckDB
    * oracle) computing it from the same rounded values.
    */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String,
      topTokenFracMax: Double = 0.14,
      dupBigramFracMax: Double = 0.065): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val bigrams = TextFunctions.wordNgrams(col(textCol), 2)
    val base = df.filter(nonEmptyText(textCol))
      .select(col(idCol), toks.as("__t"), bigrams.as("__bg"))
      .withColumn("__L", size(col("__t")))
    val topCnt = array_max(
      transform(array_distinct(col("__t")),
        x => size(filter(col("__t"), t => t === x))))
    val dupBigram = when(col("__L") > lit(1),
      lit(1.0) - size(array_distinct(col("__bg"))).cast("double")
        / (col("__L") - 1).cast("double"))
      .otherwise(lit(0.0))
    base.select(
        col(idCol),
        col("__L").cast("int").as("n_tokens"),
        round(topCnt.cast("double") / col("__L").cast("double"), 6)
          .as("top_tok_frac"),
        round(dupBigram, 6).as("dup_bigram_frac"),
        round(size(array_distinct(col("__t"))).cast("double")
          / col("__L").cast("double"), 6).as("distinct_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") > topTokenFracMax ||
          col("dup_bigram_frac") > dupBigramFracMax)
  }

  // ------------------------------------------------------ semantic dedup
  /** SemDeDup-style semantic deduplication over an embedding column:
    * documents whose embeddings are near-identical in cosine space are
    * collapsed to one survivor per connected component (min id, matching
    * [[Dedup.exact]]'s election). `exact` is the n² ground truth used by
    * the oracle gate; [[cellBucketed]] is the scale path — k-means cells
    * bound the pair join to within-cell candidates, and because its pair
    * set is a subset of the exact pair set, every document it removes is
    * also removed by the exact operator (removal-precision 1.0, pinned
    * in CurationSpec).
    */
  def semanticDedupExact(
      embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    keepSurvivors(embeddings, idCol,
      Similarity.bruteForceNearDups(embeddings, threshold, idCol, vecCol))

  def semanticDedupCellBucketed(
      embeddings: DataFrame, threshold: Double, numCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    keepSurvivors(embeddings, idCol,
      Similarity.cellBucketedNearDups(embeddings, threshold, numCells, idCol, vecCol))

  private def keepSurvivors(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    Dedup.dedupCorpus(df, idCol, pairs.select("id1", "id2"))

  // ------------------------------------------------ duplicated spans
  /** Cross-document duplicated-span detection (the signal behind exact
    * substring dedup, Lee et al. "Deduplicating Training Data Makes
    * Language Models Better"): fingerprint every `n`-token window of
    * every document and flag the windows whose fingerprint occurs in at
    * least `minDocs` DISTINCT documents. Output is a per-document audit:
    * total spans, duplicated spans, duplicated fraction — the score a
    * curation pipeline thresholds to drop or trim copy-heavy documents.
    *
    * Plan shape at 100 TB: span fingerprinting is map-side (split +
    * slice + md5 inside codegen); the distinct-doc count is ONE shuffle
    * keyed on the 128-bit fingerprint (uniform — no skew); flagging
    * re-joins spans to the duplicated-fingerprint set on the same
    * uniform key. Nothing is ever all-pairs: cost is O(total tokens),
    * the same asymptotics as the suffix-array construction it
    * approximates, in three scans.
    */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"span length must be >= 2 tokens, got $n")
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val spans = df
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol),
        explode(
          when(size(col("__t")) >= n, sequence(lit(1), size(col("__t")) - (n - 1)))
            .otherwise(array().cast("array<int>"))).as("__pos"),
        col("__t"))
      .select(col(idCol),
        md5(concat_ws(" ", slice(col("__t"), col("__pos"), lit(n)))).as("__k"))
    val dup = spans
      .groupBy(col("__k"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__k"), lit(true).as("__dup"))
    val perDoc = spans.join(dup, Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        count(col("__dup")).as("n_dup_spans"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        round(col("n_dup_spans") * 1.0 / nullif(col("n_spans"), lit(0)), 6)
          .cast("double"))
  }

  // ------------------------------------------------- boilerplate lines
  /** Corpus-level boilerplate removal (the C4/RefinedWeb line-dedup
    * step): a LINE that appears verbatim in at least `minDocs` distinct
    * documents is boilerplate (nav bars, cookie banners, license
    * headers) and is dropped from every document; documents are then
    * reassembled from their surviving lines in original order.
    *
    * Plan shape at 100 TB: posexplode lines (map-side), ONE groupBy on
    * the line's md5 fingerprint for the distinct-doc counts (16-byte
    * keys, not line text, cross the wire), and the boilerplate
    * fingerprint set comes back as an anti-join — deliberately NOT
    * broadcast-hinted: at minDocs=2 over a web corpus the boilerplate
    * set is NOT small (most nav/footer lines qualify), so Catalyst
    * must stay free to shuffle it; AQE broadcasts when it does fit.
    * Reassembly is a groupBy on doc id using positionally-sorted
    * array_agg — the one corpus-sized shuffle.
    *
    * Output: (id, text) with `text` rebuilt from kept lines joined by
    * `sep`; documents whose every line was boilerplate keep an empty
    * text. `n_lines_kept` / `n_lines_dropped` make the op auditable.
    */
  def removeBoilerplateLines(
      df: DataFrame, idCol: String, textCol: String,
      minDocs: Int, sep: String = "\n"): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
      .withColumn("__k", md5(col("__line")))
    val boiler = lines
      .groupBy(col("__k"))
      .agg(countDistinct(col(idCol)).as("__n_docs"))
      .filter(col("__n_docs") >= minDocs)
      .select("__k")
    val kept = lines.join(boiler, Seq("__k"), "left_anti").drop("__k")
    df.select(col(idCol))
      .join(kept, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          sep).as(textCol),
        count(col("__line")).as("n_lines_kept"))
      .join(
        lines.groupBy(col(idCol)).agg(count(lit(1)).as("__n_total")),
        Seq(idCol), "left")
      .withColumn("n_lines_dropped",
        coalesce(col("__n_total"), lit(0L)) - col("n_lines_kept"))
      .drop("__n_total")
  }

  // --------------------------------------- duplicated-span REMOVAL
  /** Exact substring deduplication — the full rewrite step behind
    * [[duplicatedSpans]]'s audit (Lee et al. "Deduplicating Training
    * Data Makes Language Models Better", the ExactSubstr variant):
    * every `n`-token window whose fingerprint occurs in >= `minDocs`
    * distinct documents is CUT from every document; overlapping
    * duplicated windows merge into one maximal removed span, and each
    * document is rebuilt from its surviving tokens in original order.
    *
    * Matching is case-insensitive (fingerprints are over lowercased
    * tokens, the [[duplicatedSpans]] convention) but the rebuilt text
    * keeps the original-case tokens — positions align because
    * lowercasing never adds or removes whitespace.
    *
    * Plan shape at 100 TB: window fingerprinting is map-side; the
    * duplicated-fingerprint set is ONE shuffle on the uniform 128-bit
    * md5 key; the span starts come back per document through one more
    * uniform groupBy on the doc id; the rewrite itself (merge intervals,
    * drop covered positions, reassemble) is pure per-row array algebra
    * inside the scan — `flatten(transform(starts, p -> sequence(...)))`
    * costs O(duplicated_spans x n) per document, the size of the text
    * being removed, never O(L²). Nothing is all-pairs; total cost is
    * O(total tokens), the same asymptotics as the suffix array this
    * approximates, in three scans.
    *
    * Output: (id, text rebuilt, n_tokens, n_dropped) — n_dropped is the
    * count of removed token positions, so `n_dropped = 0 <=> text` is
    * byte-identical to the whitespace-normalized original.
    */
  def removeDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2, keepFirst: Boolean = false): DataFrame = {
    require(n >= 2, s"span length must be >= 2 tokens, got $n")
    val base = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__tl", transform(col("__t"), t => lower(t)))
      .withColumn("__L", size(col("__t")))
    val spans = base
      .select(col(idCol),
        explode(
          when(col("__L") >= n, sequence(lit(1), col("__L") - (n - 1)))
            .otherwise(array().cast("array<int>"))).as("__pos"),
        col("__tl"))
      .select(col(idCol), col("__pos"),
        md5(concat_ws(" ", slice(col("__tl"), col("__pos"), lit(n)))).as("__k"))
    val dup = spans
      .groupBy(col("__k"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__k")
    val dupSpans = spans.join(dup, Seq("__k"), "left_semi")
    // keepFirst (the Lee-et-al convention): the globally FIRST occurrence
    // of each duplicated window — min (doc id, position), a deterministic
    // total order — is not itself marked for removal, so exactly one
    // copy of the duplicated content survives in the corpus. (It can
    // still lose tokens to OTHER overlapping duplicated windows whose
    // first occurrence lies elsewhere — cuts are cuts.) One extra
    // aggregation on the same uniform fingerprint key, nothing all-pairs.
    val cuts =
      if (!keepFirst) dupSpans
      else {
        val winners = dupSpans
          .groupBy(col("__k"))
          .agg(min(struct(col(idCol), col("__pos"))).as("__w"))
          .select(col("__k"),
            col("__w").getField(idCol).as(idCol),
            col("__w").getField("__pos").as("__pos"))
        dupSpans.join(winners, Seq("__k", idCol, "__pos"), "left_anti")
      }
    val starts = cuts
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__pos"))).as("__starts"))
    base.join(starts, Seq(idCol), "left")
      .withColumn("__cov",
        when(col("__starts").isNull, array().cast("array<int>"))
          .otherwise(array_distinct(flatten(
            transform(col("__starts"), p => sequence(p, p + (n - 1)))))))
      .withColumn("__keep",
        // array_except keeps left-operand order, so positions stay sorted
        array_except(sequence(lit(1), col("__L")), col("__cov")))
      .select(
        col(idCol),
        concat_ws(" ",
          transform(col("__keep"), i => element_at(col("__t"), i))).as(textCol),
        col("__L").cast("int").as("n_tokens"),
        size(col("__cov")).cast("int").as("n_dropped"))
  }
}
