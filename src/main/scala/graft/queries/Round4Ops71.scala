package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 71: phonetic blocking keys for fuzzy dedup, IPv4
  * codec + CIDR membership, and Cohen's kappa inter-annotator
  * agreement.
  */
object Round4Ops71 {

  /** Phonetic blocking key (a pinned soundex-style code: first letter +
    * consonant-class digits, vowels dropped, runs collapsed, padded to
    * 4) over the corpus vocabulary (plus a vowel-mutated variant of every word, so the collision report exercises the class-merge property), then the collision report — how many
    * distinct words share a key. This is the blocking stage of fuzzy
    * dedup: the key is GROUP BY-able, so candidate pairs form inside
    * key buckets instead of a quadratic cross join. The code is derived
    * from first principles in both engines (regex class maps), so the
    * gate pins the algorithm, not a library.
    */
  val dedup_phonetic = OpQuery(
    "dedup_phonetic",
    """WITH vocab AS (
      |  SELECT DISTINCT upper(u.w) AS w
      |  FROM (SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |                           s -> length(s) >= 3) AS ws FROM documents) d,
      |       (SELECT unnest(ws) AS w) u),
      |words AS (
      |  SELECT w FROM vocab
      |  UNION
      |  SELECT replace(w, 'A', 'E') FROM vocab),
      |coded AS (
      |  SELECT w,
      |    rpad(substr(w, 1, 1) ||
      |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |        substr(w, 2),
      |        '[AEIOUYHW]', '', 'g'),
      |        '[BFPV]', '1', 'g'), '[CGJKQSXZ]', '2', 'g'), '[DT]', '3', 'g'),
      |        'L', '4', 'g'), '[MN]', '5', 'g'), 'R', '6', 'g'),
      |        '1{2,}', '1', 'g'), '2{2,}', '2', 'g'), '3{2,}', '3', 'g'),
      |        '5{2,}', '5', 'g'), '6{2,}', '6', 'g'), 4, '0') AS key
      |  FROM words)
      |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_words, MIN(w) AS sample_word
      |FROM coded
      |GROUP BY key
      |HAVING COUNT(*) > 1
      |ORDER BY key""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_phon_docs")
    spark.sql(
      """WITH vocab AS (
        |  SELECT DISTINCT upper(w) AS w
        |  FROM (SELECT explode(filter(split(lower(text), '[^a-z]+'),
        |                              s -> length(s) >= 3)) AS w
        |        FROM graft_phon_docs) t),
        |words AS (
        |  SELECT w FROM vocab
        |  UNION
        |  SELECT replace(w, 'A', 'E') FROM vocab),
        |coded AS (
        |  SELECT w,
        |    rpad(substr(w, 1, 1) ||
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        substr(w, 2),
        |        '[AEIOUYHW]', ''),
        |        '[BFPV]', '1'), '[CGJKQSXZ]', '2'), '[DT]', '3'),
        |        'L', '4'), '[MN]', '5'), 'R', '6'),
        |        '1{2,}', '1'), '2{2,}', '2'), '3{2,}', '3'),
        |        '5{2,}', '5'), '6{2,}', '6'), 4, '0') AS key
        |  FROM words)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_words, MIN(w) AS sample_word
        |FROM coded
        |GROUP BY key
        |HAVING COUNT(*) > 1
        |ORDER BY key""".stripMargin)
  }

  /** IPv4 codec: synthesize an address per user, render it dotted-quad,
    * parse it back to a 32-bit integer, and test CIDR membership
    * (10.1.0.0/16) with pure shift/mask arithmetic — the log-pipeline
    * enrichment that must behave bit-identically everywhere. The
    * round-trip (int → string → int) is asserted by construction: both
    * columns come from the parsed string.
    */
  val f_ipv4 = OpQuery(
    "f_ipv4",
    """WITH ips AS (
      |  SELECT DISTINCT user_id,
      |         '10.' || CAST((user_id >> 8) & 255 AS VARCHAR) || '.' ||
      |         CAST((user_id >> 4) & 255 AS VARCHAR) || '.' ||
      |         CAST(user_id & 255 AS VARCHAR) AS ip
      |  FROM events WHERE user_id < 300),
      |parsed AS (
      |  SELECT user_id, ip,
      |         CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 +
      |         CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 +
      |         CAST(split_part(ip, '.', 3) AS BIGINT) * 256 +
      |         CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_int
      |  FROM ips)
      |SELECT user_id, ip, ip_int,
      |       ((ip_int >> 16) = (10 * 65536 + 1)) AS in_10_1_16
      |FROM parsed
      |ORDER BY user_id""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_ip_events")
    spark.sql(
      """WITH ips AS (
        |  SELECT DISTINCT user_id,
        |         concat('10.', CAST(shiftright(user_id, 8) & 255 AS STRING), '.',
        |                CAST(shiftright(user_id, 4) & 255 AS STRING), '.',
        |                CAST(user_id & 255 AS STRING)) AS ip
        |  FROM graft_ip_events WHERE user_id < 300),
        |parsed AS (
        |  SELECT user_id, ip,
        |         CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216 +
        |         CAST(split_part(ip, '.', 2) AS BIGINT) * 65536 +
        |         CAST(split_part(ip, '.', 3) AS BIGINT) * 256 +
        |         CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_int
        |  FROM ips)
        |SELECT user_id, ip, ip_int,
        |       (shiftright(ip_int, 16) = (10 * 65536 + 1)) AS in_10_1_16
        |FROM parsed
        |ORDER BY user_id""".stripMargin)
  }

  /** Cohen's kappa between two deterministic "annotators" (a
    * language-based and a length-based labeling rule over documents):
    * observed agreement vs chance agreement from the marginals. All
    * counts integer; one pass for the confusion counts plus a tiny
    * marginal cross — the standard agreement check before trusting a
    * labeling pipeline.
    */
  val eval_cohens_kappa = OpQuery(
    "eval_cohens_kappa",
    """WITH labeled AS (
      |  SELECT CASE WHEN lang = 'en' THEN 'good'
      |              WHEN lang IN ('de', 'fr') THEN 'ok' ELSE 'bad' END AS a1,
      |         CASE WHEN n_chars >= 800 THEN 'good'
      |              WHEN n_chars >= 300 THEN 'ok' ELSE 'bad' END AS a2
      |  FROM documents),
      |m AS (
      |  SELECT COUNT(*) AS n,
      |         SUM(CASE WHEN a1 = a2 THEN 1 ELSE 0 END) AS agree,
      |         SUM(CASE WHEN a1 = 'good' THEN 1 ELSE 0 END) AS g1,
      |         SUM(CASE WHEN a1 = 'ok' THEN 1 ELSE 0 END) AS o1,
      |         SUM(CASE WHEN a1 = 'bad' THEN 1 ELSE 0 END) AS b1,
      |         SUM(CASE WHEN a2 = 'good' THEN 1 ELSE 0 END) AS g2,
      |         SUM(CASE WHEN a2 = 'ok' THEN 1 ELSE 0 END) AS o2,
      |         SUM(CASE WHEN a2 = 'bad' THEN 1 ELSE 0 END) AS b2
      |  FROM labeled)
      |SELECT CAST(n AS BIGINT) AS n_docs,
      |       CAST(ROUND(CAST(agree AS DOUBLE) / n, 6) AS DOUBLE) AS po,
      |       CAST(ROUND(CAST(g1 * g2 + o1 * o2 + b1 * b2 AS DOUBLE) / (n * n), 6)
      |            AS DOUBLE) AS pe,
      |       CAST(ROUND((CAST(agree AS DOUBLE) / n -
      |                   CAST(g1 * g2 + o1 * o2 + b1 * b2 AS DOUBLE) / (n * n)) /
      |                  (1 - CAST(g1 * g2 + o1 * o2 + b1 * b2 AS DOUBLE) / (n * n)), 6)
      |            AS DOUBLE) AS kappa
      |FROM m""".stripMargin) { (spark, dir) =>
    val labeled = Tables.load(spark, dir, "documents")
      .select(
        when(col("lang") === "en", "good")
          .when(col("lang").isin("de", "fr"), "ok")
          .otherwise("bad").as("a1"),
        when(col("n_chars") >= 800, "good")
          .when(col("n_chars") >= 300, "ok")
          .otherwise("bad").as("a2"))
    val m = labeled.agg(
      count(lit(1)).as("n"),
      sum(when(col("a1") === col("a2"), 1).otherwise(0)).as("agree"),
      sum(when(col("a1") === "good", 1).otherwise(0)).as("g1"),
      sum(when(col("a1") === "ok", 1).otherwise(0)).as("o1"),
      sum(when(col("a1") === "bad", 1).otherwise(0)).as("b1"),
      sum(when(col("a2") === "good", 1).otherwise(0)).as("g2"),
      sum(when(col("a2") === "ok", 1).otherwise(0)).as("o2"),
      sum(when(col("a2") === "bad", 1).otherwise(0)).as("b2"))
    val pe = (col("g1") * col("g2") + col("o1") * col("o2") + col("b1") * col("b2"))
      .cast("double") / (col("n") * col("n"))
    val po = col("agree").cast("double") / col("n")
    m.select(col("n").cast("long").as("n_docs"),
      round(po, 6).cast("double").as("po"),
      round(pe, 6).cast("double").as("pe"),
      round((po - pe) / (lit(1) - pe), 6).cast("double").as("kappa"))
  }

  val all: Seq[OpQuery] = Seq(dedup_phonetic, f_ipv4, eval_cohens_kappa)
}
