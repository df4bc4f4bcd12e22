package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** Capstone: the operators composed as an actual training-data curation
  * pipeline — quality-score filter → exact dedup (survivors only) →
  * content-stable split → per-(split, lang) accounting — oracled as ONE
  * unit, so the composition (not just each stage) is hash-verified.
  *
  * Scale shape: three shuffles total (fingerprint groupBy, the split is
  * map-only, final count groupBy) over a single scan of the corpus.
  */
object CurationPipeline {

  private val stopwords =
    TextFunctions.langMarkers.flatMap(_._2).distinct

  val curation_e2e: OpQuery = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    OpQuery(
      "curation_e2e",
      s"""WITH scored AS (
        |  SELECT doc_id, lang, text,
        |    LEAST(length(regexp_split_to_array(trim(text), '\\s+')) * 1.0 / 100, 1.0) AS length_score,
        |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
        |        t -> list_contains($stopList, t))) * 1.0
        |      / length(regexp_split_to_array(lower(trim(text)), '\\s+')) AS stop_ratio,
        |    length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) * 1.0 / length(text) AS punct_ratio
        |  FROM documents
        |), quality AS (
        |  SELECT doc_id, lang, text,
        |    ROUND(GREATEST(LEAST(
        |      length_score * 0.3 + alpha_ratio * 0.3 + stop_ratio * 0.2 + (1.0 - punct_ratio) * 0.2,
        |      1.0), 0.0), 4) AS q
        |  FROM scored
        |), kept AS (
        |  SELECT * FROM quality WHERE q >= 0.5
        |), survivors AS (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        |), split AS (
        |  SELECT k.doc_id, k.lang,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM kept k JOIN survivors s ON k.doc_id = s.doc_id
        |)
        |SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM split
        |GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val kept = docs.filter(TextFunctions.qualityScore(col("text")) >= 0.5)
      val survivors = Dedup.exact(kept, "doc_id", "text")
      Sampling.deterministicSplit(
          survivors.select(col("doc_id"), col("lang")), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"), col("lang"))
    }
  }

  /** Token-budget corpus selection: the best documents by quality score
    * until 12k tokens are spent (the "best N tokens" cut every
    * pretraining mix ends with; the doc crossing the budget is kept
    * whole). Spark runs the two-phase distributed prefix sum — range
    * partition on the selection order, window within partitions,
    * partition offsets broadcast back — the oracle states the same
    * selection with one global running-sum window.
    */
  val corpus_select: OpQuery = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    OpQuery(
      "corpus_select",
      s"""WITH scored AS (
        |  SELECT doc_id, text,
        |    LEAST(length(regexp_split_to_array(trim(text), '\\s+')) * 1.0 / 100, 1.0) AS length_score,
        |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
        |        t -> list_contains($stopList, t))) * 1.0
        |      / length(regexp_split_to_array(lower(trim(text)), '\\s+')) AS stop_ratio,
        |    length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) * 1.0 / length(text) AS punct_ratio
        |  FROM documents
        |), quality AS (
        |  SELECT doc_id,
        |    ROUND(GREATEST(LEAST(
        |      length_score * 0.3 + alpha_ratio * 0.3 + stop_ratio * 0.2 + (1.0 - punct_ratio) * 0.2,
        |      1.0), 0.0), 4) AS q,
        |    CASE WHEN coalesce(trim(text), '') = '' THEN 0
        |         ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
        |  FROM scored
        |), ord AS (
        |  SELECT doc_id, q, n_tokens,
        |    COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (
        |      ORDER BY q DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS spent_before
        |  FROM quality
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(q AS DOUBLE) AS quality
        |FROM ord WHERE spent_before < 12000
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val scored = docs.select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling
        .selectByTokenBudget(scored, "doc_id", "quality", "n_tokens", 12000L)
        .select(col("doc_id"), col("n_tokens"),
          col("quality").cast("double").as("quality"))
        .orderBy(col("doc_id"))
    }
  }

  /** Dataset card: per (source, lang) corpus statistics — doc count,
    * token volume, exact median doc length, and exact-duplicate rate
    * (share of docs whose normalized fingerprint appears more than
    * once). The summary every curated-corpus release ships with; one
    * fingerprint aggregate + one grouped rollup.
    */
  val corpus_stats = OpQuery(
    "corpus_stats",
    """WITH d AS (
      |  SELECT source, lang,
      |         CASE WHEN coalesce(trim(text), '') = '' THEN 0
      |              ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS toks,
      |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents
      |), f AS (
      |  SELECT fp, COUNT(*) AS c FROM d GROUP BY fp
      |)
      |SELECT d.source, d.lang,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(toks) AS BIGINT) AS total_tokens,
      |       CAST(ROUND(quantile_cont(toks, 0.5), 4) AS DOUBLE) AS median_tokens,
      |       CAST(ROUND(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS DOUBLE) AS dup_rate
      |FROM d JOIN f USING (fp)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.select(
      col("source"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val fpCounts = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    base.join(fpCounts, Seq("fp"))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        round(percentile(col("toks"), lit(0.5)), 4).cast("double").as("median_tokens"),
        round(sum(when(col("c") > 1, 1).otherwise(0)) * 1.0 / count(lit(1)), 6)
          .cast("double").as("dup_rate"))
      .orderBy(col("source"), col("lang"))
  }

  val all: Seq[OpQuery] = Seq(curation_e2e, corpus_select, corpus_stats)
}
