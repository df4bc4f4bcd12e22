package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 70: deterministic bootstrap confidence interval,
  * sentence segmentation stats, and the Kolmogorov–Smirnov two-sample
  * test.
  */
object Round4Ops70 {

  /** Bootstrap 95% CI for mean customer spend: 100 replicas, each
    * resampling n customers with replacement through a pinned LCG
    * (idx = (b·48271 + i·16807) mod p mod n) — so the "randomness" is
    * identical on every engine and run. Replica sums stay integer; the
    * CI bounds are the 3rd and 98th sorted replica means. The replica
    * fan-out is explode(sequence(...)) — distributed, no driver loop —
    * and the sample join hits a broadcast of the ranked spend table.
    */
  val a48_bootstrap_ci = OpQuery(
    "a48_bootstrap_ci",
    """WITH spend AS (
      |  SELECT o_custkey, CAST(ROUND(SUM(o_totalprice)) AS BIGINT) AS s
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT s, ROW_NUMBER() OVER (ORDER BY o_custkey) AS idx FROM spend),
      |m AS (SELECT COUNT(*) AS n FROM ranked),
      |draws AS (
      |  SELECT b.b, i.i,
      |         ((b.b * 48271 + i.i * 16807) % 2147483647) % i.n + 1 AS idx
      |  FROM (SELECT unnest(range(1, 101)) AS b) b,
      |       (SELECT unnest(range(1, CAST(n AS INT) + 1)) AS i, n FROM m) i),
      |means AS (
      |  SELECT d.b, SUM(r.s) AS tot, COUNT(*) AS cnt
      |  FROM draws d JOIN ranked r ON d.idx = r.idx
      |  GROUP BY d.b),
      |sorted AS (
      |  SELECT CAST(tot AS DOUBLE) / cnt AS mean_b,
      |         ROW_NUMBER() OVER (ORDER BY CAST(tot AS DOUBLE) / cnt, b) AS rk
      |  FROM means)
      |SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_customers,
      |       CAST(ROUND(MAX(CASE WHEN rk = 3 THEN mean_b END), 6) AS DOUBLE) AS ci_lo,
      |       CAST(ROUND(MAX(CASE WHEN rk = 98 THEN mean_b END), 6) AS DOUBLE) AS ci_hi
      |FROM sorted""".stripMargin) { (spark, dir) =>
    // Spark side rebuilt distributed (round-12 sf1 flag, e = 1.20 at
    // 10x): the SQL form generated all 100*n draw rows by exploding
    // sequence(1, n) out of ONE row — single-partition generation — and
    // ranked customers through a partition-less window. Now: customer
    // ranks via the distributed TotalOrder.rowNumber, draws via two
    // spark.range cross joins (both sides partitioned), same LCG, same
    // join+agg, bit-identical output. The oracle keeps the plain
    // quadratic-free SQL definition.
    import graft.operators.TotalOrder
    val spend = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 0).cast("bigint").as("s"))
    val ranked = TotalOrder.rowNumber(
        spend, Seq(col("o_custkey").asc), "idx")
      .select(col("s"), col("idx"))
      .localCheckpoint(true)
    val n = ranked.count()
    val draws = spark.range(1, 101).select(col("id").as("b"))
      .crossJoin(spark.range(1, n + 1).select(col("id").as("i")))
      .select(col("b"),
        ((col("b") * 48271L + col("i") * 16807L) % 2147483647L % n + 1)
          .as("idx"))
    val means = draws.join(ranked, "idx")
      .groupBy(col("b"))
      .agg(sum(col("s")).as("tot"), count(lit(1)).as("cnt"))
    // 100 bootstrap means: driver-bounded by construction, so the final
    // rank is a plain window over 100 rows
    val sorted = means
      .select((col("tot").cast("double") / col("cnt")).as("mean_b"), col("b"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mean_b"), col("b"))))
    sorted.agg(
      lit(n).cast("bigint").as("n_customers"),
      round(max(when(col("rk") === 3, col("mean_b"))), 6).cast("double").as("ci_lo"),
      round(max(when(col("rk") === 98, col("mean_b"))), 6).cast("double").as("ci_hi"))
      .select(col("n_customers"), col("ci_lo"), col("ci_hi"))
  }

  /** Sentence segmentation stats per language: documents split on
    * [.!?]+ runs, empty fragments trimmed away, then per-lang counts
    * and mean sentence length from integer sums. All array work stays
    * inside higher-order functions on the row (no explode shuffle
    * amplification — one row in, one row out, then a 6-group reduce).
    */
  val text_sentences = OpQuery(
    "text_sentences",
    """WITH per_doc AS (
      |  SELECT lang,
      |         len(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
      |             s -> trim(s)), s -> length(s) > 0)) AS n_sent,
      |         list_sum(list_transform(list_filter(list_transform(
      |             string_split_regex(text, '[.!?]+'), s -> trim(s)),
      |             s -> length(s) > 0), s -> length(s))) AS chars
      |  FROM documents)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_sent) AS BIGINT) AS n_sentences,
      |       CAST(ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(n_sent), 6) AS DOUBLE)
      |         AS mean_sentence_chars
      |FROM per_doc
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    val sentences = filter(
      transform(split(col("text"), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    Tables.load(spark, dir, "documents")
      .select(col("lang"), size(sentences).as("n_sent"),
        aggregate(sentences, lit(0L), (acc, s) => acc + length(s)).as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_sent")).cast("long").as("n_sentences"),
        round(sum(col("chars")).cast("double") / sum(col("n_sent")), 6)
          .cast("double").as("mean_sentence_chars"))
      .orderBy("lang")
  }

  /** Kolmogorov–Smirnov two-sample statistic between purchase and view
    * value distributions. The ECDF gap is maximized on the INTEGER
    * cross-term |c1·n2 − c2·n1| (one window pass over the merged sorted
    * values), and only the final maximum is divided — no float
    * comparisons anywhere in the argmax.
    */
  val a49_ks_test = OpQuery(
    "a49_ks_test",
    """WITH samples AS (
      |  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |counts AS (
      |  SELECT SUM(g) AS n1, SUM(1 - g) AS n2 FROM samples),
      |cum AS (
      |  SELECT value,
      |         SUM(g) OVER (ORDER BY value
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
      |         SUM(1 - g) OVER (ORDER BY value
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      |  FROM samples),
      |at_value AS (
      |  SELECT value, MAX(c1) AS c1, MAX(c2) AS c2 FROM cum GROUP BY value),
      |gaps AS (
      |  SELECT MAX(ABS(c1 * (SELECT n2 FROM counts) - c2 * (SELECT n1 FROM counts)))
      |           AS max_gap
      |  FROM at_value)
      |SELECT CAST((SELECT n1 FROM counts) AS BIGINT) AS n_purchase,
      |       CAST((SELECT n2 FROM counts) AS BIGINT) AS n_view,
      |       CAST(ROUND(CAST(max_gap AS DOUBLE) /
      |            ((SELECT n1 FROM counts) * (SELECT n2 FROM counts)), 6) AS DOUBLE) AS ks_d
      |FROM gaps""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_ks_events")
    // both running ECDF counters in ONE TotalOrder.prefixAggs pass
    // (two-phase range ranks) — the window form pushed every sampled
    // event through a single reducer. Ties on `value` are absorbed by
    // the MAX-per-value collapse downstream, exactly as in the window
    // form, so the oracle still hash-matches.
    import org.apache.spark.sql.functions.col
    val ksSamples = spark.sql(
      """SELECT value,
        |       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
        |       CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS ig
        |FROM graft_ks_events
        |WHERE event_type IN ('purchase', 'view')""".stripMargin)
    graft.operators.TotalOrder
      .prefixAggs(ksSamples, Seq(col("value")),
        sums = Seq("g" -> "c1", "ig" -> "c2"))
      .select(col("value"), col("c1"), col("c2"))
      .createOrReplaceTempView("graft_ks_cum")
    spark.sql(
      """WITH samples AS (
        |  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
        |  FROM graft_ks_events WHERE event_type IN ('purchase', 'view')),
        |counts AS (
        |  SELECT SUM(g) AS n1, SUM(1 - g) AS n2 FROM samples),
        |cum AS (SELECT value, c1, c2 FROM graft_ks_cum),
        |at_value AS (
        |  SELECT value, MAX(c1) AS c1, MAX(c2) AS c2 FROM cum GROUP BY value),
        |gaps AS (
        |  SELECT MAX(ABS(c1 * (SELECT n2 FROM counts) - c2 * (SELECT n1 FROM counts)))
        |           AS max_gap
        |  FROM at_value)
        |SELECT CAST((SELECT n1 FROM counts) AS BIGINT) AS n_purchase,
        |       CAST((SELECT n2 FROM counts) AS BIGINT) AS n_view,
        |       CAST(ROUND(CAST(max_gap AS DOUBLE) /
        |            ((SELECT n1 FROM counts) * (SELECT n2 FROM counts)), 6) AS DOUBLE) AS ks_d
        |FROM gaps""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(a48_bootstrap_ci, text_sentences, a49_ks_test)
}
