package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.FuzzyStrings

/** Round-4 batch 131: native fuzzy-string matching — Jaro / Jaro-Winkler
  * similarity and unrestricted Damerau-Levenshtein as codegen'd Catalyst
  * expressions ([[graft.expressions.FuzzyStrings]]), oracled against
  * DuckDB's NATIVE `jaro_similarity` / `jaro_winkler_similarity` /
  * `damerau_levenshtein` — the oracle is an independent C++
  * implementation, so a hash match pins the full algorithm (match
  * window, transposition counting, 0.7 boost threshold, prefix cap,
  * unrestricted transposition blocks), not just our own arithmetic.
  */
object Round4Ops131 {

  /** Banded self-pairing of customer names scored by all three
    * comparators. The band (key distance ≤ 5) is the scale shape:
    * pair count stays linear in table size, never n².
    */
  val f_jaro_winkler = OpQuery(
    "f_jaro_winkler",
    """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
      |       CAST(ROUND(jaro_similarity(a.c_name, b.c_name), 6) AS DOUBLE) AS jaro,
      |       CAST(ROUND(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS DOUBLE) AS jw,
      |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
      |FROM customer a JOIN customer b
      |  ON b.c_custkey > a.c_custkey AND b.c_custkey <= a.c_custkey + 5
      |WHERE a.c_custkey <= 300
      |ORDER BY key_a, key_b""".stripMargin) { (spark, dir) =>
    FuzzyStrings.register(spark)
    val c = Tables.load(spark, dir, "customer")
    val a = c.filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("key_a"), col("c_name").as("name_a"))
    val b = c.select(col("c_custkey").as("key_b"), col("c_name").as("name_b"))
    a.join(b, col("key_b") > col("key_a") && col("key_b") <= col("key_a") + 5)
      .select(
        col("key_a"), col("key_b"),
        round(FuzzyStrings.jaroSim(col("name_a"), col("name_b")), 6)
          .cast("double").as("jaro"),
        round(FuzzyStrings.jaroWinklerSim(col("name_a"), col("name_b")), 6)
          .cast("double").as("jw"),
        levenshtein(col("name_a"), col("name_b")).cast("int").as("lev"))
      .orderBy("key_a", "key_b")
  }

  /** Unrestricted Damerau-Levenshtein vs plain Levenshtein over part
    * names — the rows where they differ are exactly the transposition
    * typos, surfaced as a flag plus a distance histogram.
    */
  val f_damerau_lev = OpQuery(
    "f_damerau_lev",
    """WITH pairs AS (
      |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |         damerau_levenshtein(a.p_name, b.p_name) AS dl,
      |         levenshtein(a.p_name, b.p_name) AS lev
      |  FROM part a JOIN part b
      |    ON b.p_partkey > a.p_partkey AND b.p_partkey <= a.p_partkey + 3
      |  WHERE a.p_partkey <= 400)
      |SELECT CAST(dl AS INT) AS dl, CAST(COUNT(*) AS BIGINT) AS pairs,
      |       CAST(SUM(CASE WHEN dl < lev THEN 1 ELSE 0 END) AS BIGINT)
      |         AS transposition_wins,
      |       CAST(MIN(lev) AS INT) AS min_lev, CAST(MAX(lev) AS INT) AS max_lev
      |FROM pairs
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    FuzzyStrings.register(spark)
    val p = Tables.load(spark, dir, "part")
    val a = p.filter(col("p_partkey") <= 400)
      .select(col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, col("key_b") > col("key_a") && col("key_b") <= col("key_a") + 3)
      .select(
        FuzzyStrings.damerauLevenshtein(col("name_a"), col("name_b")).as("dl"),
        levenshtein(col("name_a"), col("name_b")).as("lev"))
      .groupBy(col("dl").cast("int").as("dl"))
      .agg(
        count(lit(1)).as("pairs"),
        sum(when(col("dl") < col("lev"), 1).otherwise(0))
          .cast("bigint").as("transposition_wins"),
        min("lev").cast("int").as("min_lev"),
        max("lev").cast("int").as("max_lev"))
      .orderBy("dl")
  }

  /** Fuzzy-name linkage with blocking: candidate pairs only within a
    * nation block and a key band (never all-pairs), kept when
    * Jaro-Winkler ≥ 0.95. Per-nation linkage report: candidate count,
    * accepted count, mean accepted similarity. The blocking-plus-
    * threshold shape is the standard record-linkage scale path.
    */
  val dedup_jw_blocking = OpQuery(
    "dedup_jw_blocking",
    """WITH cand AS (
      |  SELECT a.c_nationkey AS nation,
      |         jaro_winkler_similarity(a.c_name, b.c_name) AS jw
      |  FROM customer a JOIN customer b
      |    ON b.c_nationkey = a.c_nationkey
      |   AND b.c_custkey > a.c_custkey
      |   AND b.c_custkey <= a.c_custkey + 40)
      |SELECT CAST(nation AS INT) AS nation,
      |       CAST(COUNT(*) AS BIGINT) AS candidates,
      |       CAST(SUM(CASE WHEN jw >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS accepted,
      |       CAST(ROUND(SUM(CASE WHEN jw >= 0.95
      |                           THEN CAST(ROUND(jw, 6) AS DECIMAL(18,6))
      |                           ELSE CAST(0 AS DECIMAL(18,6)) END)
      |                  / NULLIF(SUM(CASE WHEN jw >= 0.95 THEN 1 ELSE 0 END), 0),
      |                  6) AS DOUBLE) AS mean_accepted_jw
      |FROM cand
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    FuzzyStrings.register(spark)
    val c = Tables.load(spark, dir, "customer")
    val a = c.select(col("c_nationkey").as("nation"),
      col("c_custkey").as("key_a"), col("c_name").as("name_a"))
    val b = c.select(col("c_nationkey").as("nation_b"),
      col("c_custkey").as("key_b"), col("c_name").as("name_b"))
    a.join(b, col("nation_b") === col("nation") &&
        col("key_b") > col("key_a") && col("key_b") <= col("key_a") + 40)
      .select(col("nation"),
        FuzzyStrings.jaroWinklerSim(col("name_a"), col("name_b")).as("jw"))
      .groupBy(col("nation").cast("int").as("nation"))
      .agg(
        count(lit(1)).as("candidates"),
        sum(when(col("jw") >= 0.95, 1).otherwise(0)).cast("bigint").as("accepted"),
        round(
          sum(when(col("jw") >= 0.95, round(col("jw"), 6).cast("decimal(18,6)"))
            .otherwise(lit(0).cast("decimal(18,6)"))) /
            nullif(sum(when(col("jw") >= 0.95, 1).otherwise(0)), lit(0)), 6)
          .cast("double").as("mean_accepted_jw"))
      .orderBy("nation")
  }

  val all: Seq[OpQuery] = Seq(f_jaro_winkler, f_damerau_lev, dedup_jw_blocking)
}
