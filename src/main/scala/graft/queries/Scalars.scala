package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.IronmanExprs

/** SURVEY.md §2.7 scalar-function families + §2.8 derived semantics,
  * exercised over the synthetic tables with DuckDB oracles.
  *
  * Engine-diff rules baked into the oracles (verified empirically):
  * DuckDB regexp_replace needs the 'g' flag to match Spark's
  * replace-all; DuckDB lists are 1-indexed (Spark arrays 0-indexed);
  * Spark `concat` is NULL if any argument is NULL (DuckDB skips NULLs)
  * so oracles avoid nullable concat args; Spark dayofweek is 1-based
  * Sunday, DuckDB 0-based.
  */
object Scalars {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** String family: lower/upper/trim/regexp_replace/regexp_extract/
    * split+index/element_at(-1)/size/concat/concat_ws/lpad/substring/
    * startswith/contains (ref usages: 02:211-212, 03:252-303, 04a:133-136,
    * 04c:148-205, 05:613-618).
    */
  val f_string = OpQuery(
    "f_string",
    """SELECT p_partkey,
      |  lower(p_name) AS name_lower,
      |  upper(p_brand) AS brand_upper,
      |  trim(p_type) AS type_trim,
      |  regexp_replace(p_name, '[^a-zA-Z0-9]', '', 'g') AS name_clean,
      |  regexp_extract(p_type, '([A-Z]+)', 1) AS type_first_upper,
      |  list_extract(string_split(p_name, ' '), 1) AS first_token,
      |  string_split(p_name, ' ')[-1] AS last_token,
      |  CAST(length(string_split(p_name, ' ')) AS INT) AS n_tokens,
      |  concat(p_brand, '#', p_type) AS brand_type,
      |  concat_ws('_', p_brand, p_type) AS brand_type_ws,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      |  substring(p_name, 1, 5) AS name_prefix,
      |  starts_with(p_brand, 'Brand') AS is_brand,
      |  contains(p_type, 'a') AS has_a
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val parts = split(col("p_name"), " ")
    t(spark, dir, "part").select(
      col("p_partkey"),
      lower(col("p_name")).as("name_lower"),
      upper(col("p_brand")).as("brand_upper"),
      trim(col("p_type")).as("type_trim"),
      regexp_replace(col("p_name"), "[^a-zA-Z0-9]", "").as("name_clean"),
      regexp_extract(col("p_type"), "([A-Z]+)", 1).as("type_first_upper"),
      get(parts, lit(0)).as("first_token"),
      element_at(parts, -1).as("last_token"),
      size(parts).as("n_tokens"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      concat_ws("_", col("p_brand"), col("p_type")).as("brand_type_ws"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
      substring(col("p_name"), 1, 5).as("name_prefix"),
      col("p_brand").startsWith("Brand").as("is_brand"),
      col("p_type").contains("a").as("has_a"))
      .orderBy(col("p_partkey"))
  }

  /** Conditional/null family: when/otherwise chains, coalesce, nullif,
    * null-sentinel handling (ref: pervasive, e.g. 03:257-295, 05:693-697).
    */
  val f_conditional = OpQuery(
    "f_conditional",
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'negative'
      |       WHEN c_acctbal < 5000 THEN 'low'
      |       ELSE 'high' END AS bal_band,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
      |  CASE WHEN c_nationkey % 2 = 0 THEN c_name END AS name_evens_only
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("bal_band"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
        .as("segment_masked"),
      when(col("c_nationkey") % 2 === 0, col("c_name")).as("name_evens_only"))
      .orderBy(col("c_custkey"))
  }

  /** Math family: abs/round/floor/ceil/pmod/integer arithmetic
    * (ref: 03:134-139, 04a:194, 05:553-558,615-618). pmod has no DuckDB
    * twin; the oracle spells out ((x % n) + n) % n.
    */
  val f_math = OpQuery(
    "f_math",
    """SELECT s_suppkey,
      |  abs(s_acctbal) AS bal_abs,
      |  CAST(round(s_acctbal, 1) AS DOUBLE) AS bal_round1,
      |  CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
      |  CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
      |  CAST(((s_suppkey * 37 % 10) + 10) % 10 AS BIGINT) AS key_pmod,
      |  CAST(s_suppkey * 3600 + s_nationkey * 60 AS BIGINT) AS synthetic_secs
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "supplier").select(
      col("s_suppkey"),
      abs(col("s_acctbal")).as("bal_abs"),
      round(col("s_acctbal"), 1).cast("double").as("bal_round1"),
      floor(col("s_acctbal")).as("bal_floor"),
      ceil(col("s_acctbal")).as("bal_ceil"),
      pmod(col("s_suppkey") * 37, lit(10)).cast("long").as("key_pmod"),
      (col("s_suppkey") * 3600 + col("s_nationkey") * 60).cast("long")
        .as("synthetic_secs"))
      .orderBy(col("s_suppkey"))
  }

  /** Date/time family: year/month/day/date_trunc/date_format/datediff
    * (ref: current_timestamp/current_date 02:150-151 are nondeterministic
    * so the deterministic extraction family stands in).
    */
  val f_datetime = OpQuery(
    "f_datetime",
    """SELECT o_orderkey,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
      |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sunday1,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
      |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_92
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"),
      dayofweek(col("o_orderdate")).as("dow_sunday1"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
        .as("month_start"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date_str"),
      datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
        .as("days_since_92"))
      .orderBy(col("o_orderkey"))
  }

  /** D1 + the H:MM:SS formatter, round-tripped over synthetic seconds:
    * format → parse must reproduce the input (property pinned by the
    * oracle recomputing both directions in SQL).
    */
  val d1_time_roundtrip = OpQuery(
    "d1_time_roundtrip",
    """WITH secs AS (
      |  SELECT event_id, CAST((event_id * 7919) % 86399 + 1 AS BIGINT) AS s
      |  FROM events
      |), fmt AS (
      |  SELECT event_id, s,
      |         concat(CAST(s // 3600 AS VARCHAR), ':',
      |                lpad(CAST((s % 3600) // 60 AS VARCHAR), 2, '0'), ':',
      |                lpad(CAST(s % 60 AS VARCHAR), 2, '0')) AS hms
      |  FROM secs
      |)
      |SELECT event_id, s, hms,
      |  CAST(CAST(string_split(hms, ':')[1] AS INT) * 3600 +
      |       CAST(string_split(hms, ':')[2] AS INT) * 60 +
      |       CAST(string_split(hms, ':')[3] AS INT) AS BIGINT) AS s_roundtrip
      |FROM fmt
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    t(spark, dir, "events")
      .select(
        col("event_id"),
        ((col("event_id") * 7919) % 86399 + 1).cast("long").as("s"))
      .withColumn("hms", IronmanExprs.formatSeconds(col("s")))
      .withColumn("s_roundtrip",
        IronmanExprs.parseTimeToSeconds(col("hms")).cast("long"))
      .orderBy(col("event_id"))
  }

  /** D3 natural-key semantics over customer names: clean + concat_ws with
    * an UNKNOWN fallback for a nullable column (ref: 04a:130-139).
    */
  val d3_natural_key = OpQuery(
    "d3_natural_key",
    """SELECT c_custkey,
      |  lower(concat_ws('_',
      |    regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g'),
      |    coalesce(nullif(c_mktsegment, 'MACHINERY'), 'UNKNOWN'))) AS natural_key
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val seg = nullif(col("c_mktsegment"), lit("MACHINERY"))
    t(spark, dir, "customer").select(
      col("c_custkey"),
      IronmanExprs.athleteNaturalKey(col("c_name"), seg).as("natural_key"))
      .orderBy(col("c_custkey"))
  }

  /** D4 surrogate keys — abs(Murmur3 hash). Not SQL-oracle-expressible
    * (DuckDB's hash is a different function); covered by rows-only check
    * here and exact-equality unit tests in IronmanExprsSpec.
    */
  val d4_surrogate_key = OpQuery.noOracle("d4_surrogate_key") { (spark, dir) =>
    t(spark, dir, "customer").select(
      col("c_custkey"),
      IronmanExprs.surrogateKey(col("c_name")).as("customer_sk"),
      IronmanExprs.athleteSurrogateKey(col("c_name"), col("c_mktsegment"))
        .as("composite_sk"))
      .orderBy(col("c_custkey"))
  }

  /** D10 division parsing applied to a synthetic division-shaped string
    * built from part attributes, exercising startswith/contains/
    * regexp_extract/split in the exact reference composition.
    */
  val d10_division_parse = OpQuery(
    "d10_division_parse",
    """WITH div AS (
      |  SELECT p_partkey,
      |         CASE WHEN p_size % 3 = 0 THEN concat('M', CAST(p_size AS VARCHAR), '-', CAST(p_size + 4 AS VARCHAR))
      |              WHEN p_size % 3 = 1 THEN concat('F', CAST(p_size AS VARCHAR), '-', CAST(p_size + 4 AS VARCHAR))
      |              ELSE 'XPRO' END AS division
      |  FROM part
      |)
      |SELECT p_partkey, division,
      |  CASE WHEN starts_with(division, 'M') THEN 'M'
      |       WHEN starts_with(division, 'F') THEN 'F'
      |       ELSE 'UNKNOWN' END AS gender,
      |  contains(division, 'PRO') AS is_professional,
      |  CAST(CASE WHEN regexp_extract(division, '(\d+\-\d+)', 1) != ''
      |       THEN CAST(string_split(regexp_extract(division, '(\d+\-\d+)', 1), '-')[1] AS INT) END AS INT) AS age_start,
      |  CAST(CASE WHEN regexp_extract(division, '(\d+\-\d+)', 1) != ''
      |       THEN CAST(string_split(regexp_extract(division, '(\d+\-\d+)', 1), '-')[2] AS INT) END AS INT) AS age_end
      |FROM div
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val division = when(col("p_size") % 3 === 0,
        concat(lit("M"), col("p_size").cast("string"), lit("-"),
          (col("p_size") + 4).cast("string")))
      .when(col("p_size") % 3 === 1,
        concat(lit("F"), col("p_size").cast("string"), lit("-"),
          (col("p_size") + 4).cast("string")))
      .otherwise(lit("XPRO"))
    t(spark, dir, "part")
      .withColumn("division", division)
      .select(
        col("p_partkey"),
        col("division"),
        IronmanExprs.divisionGender(col("division")).as("gender"),
        IronmanExprs.isProfessional(col("division")).as("is_professional"),
        IronmanExprs.ageGroupStart(col("division")).as("age_start"),
        IronmanExprs.ageGroupEnd(col("division")).as("age_end"))
      .orderBy(col("p_partkey"))
  }

  /** Composite silver-layer semantics gate: D2 row_key (dedup-rank
    * row_number + clean-name concat), D5 status flags (case-insensitive),
    * D6 null-propagating calculated total, D7 has_data_issue, D8 time
    * difference, D9 name split, D12 both gender-label variants — the
    * derived columns 03_silver.ipynb:257-305 / 02_bronze.ipynb:208-230
    * compute, replayed over athlete-shaped rows synthesized from
    * `customer` so DuckDB can hash-pin every value.
    */
  val d_silver_semantics = OpQuery(
    "d_silver_semantics",
    """WITH base AS (
      |  SELECT c_custkey,
      |    CAST(2020 + c_custkey % 5 AS INT) AS year,
      |    CASE CAST(c_custkey % 3 AS INT)
      |      WHEN 0 THEN concat('Solo', CAST(c_custkey % 11 AS VARCHAR))
      |      WHEN 1 THEN concat('Mary Jane-', CAST(c_custkey % 11 AS VARCHAR))
      |      ELSE concat('Jo O''Neil ', CAST(c_custkey % 11 AS VARCHAR)) END AS athlete_name,
      |    CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'F' ELSE 'X' END AS source_gender,
      |    CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'FINISHER' WHEN 1 THEN 'dnf' WHEN 2 THEN 'DNS' ELSE 'dq' END AS designation,
      |    CAST((c_custkey * 13) % 3600 + 1200 AS INT) AS swim,
      |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE CAST(c_custkey % 300 + 60 AS INT) END AS t1,
      |    CAST((c_custkey * 29) % 18000 + 9000 AS INT) AS bike,
      |    CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE CAST(c_custkey % 240 + 45 AS INT) END AS t2,
      |    CAST((c_custkey * 17) % 14400 + 7200 AS INT) AS run,
      |    CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE CAST(c_custkey % 500 + 1 AS INT) END AS race_rank
      |  FROM customer
      |), derived AS (
      |  SELECT *,
      |    lower(regexp_replace(athlete_name, '[^a-zA-Z0-9]', '', 'g')) AS name_clean,
      |    CAST(swim + t1 + bike + t2 + run AS INT) AS calculated_total_seconds,
      |    CASE WHEN c_custkey % 13 = 0 THEN NULL
      |         ELSE CAST(swim + coalesce(t1, 300) + bike + coalesce(t2, 300) + run + c_custkey % 90 AS INT)
      |    END AS finish_time_seconds,
      |    upper(designation) = 'FINISHER' AS is_finisher,
      |    upper(designation) = 'DNF' AS is_dnf,
      |    upper(designation) = 'DNS' AS is_dns,
      |    upper(designation) = 'DQ' AS is_dq
      |  FROM base
      |), keyed AS (
      |  SELECT *,
      |    CAST(row_number() OVER (PARTITION BY year, source_gender, name_clean ORDER BY c_custkey) AS INT) AS dup_rank
      |  FROM derived
      |)
      |SELECT c_custkey,
      |  concat(CAST(year AS VARCHAR), '_', source_gender, '_', name_clean, '_', CAST(dup_rank AS VARCHAR)) AS row_key,
      |  year, athlete_name,
      |  string_split(athlete_name, ' ')[1] AS first_name,
      |  CASE WHEN len(string_split(athlete_name, ' ')) > 1 THEN string_split(athlete_name, ' ')[-1] END AS last_name,
      |  source_gender,
      |  CASE WHEN source_gender = 'M' THEN 'Male' ELSE 'Female' END AS gender_label,
      |  CASE WHEN source_gender = 'M' THEN 'Male' ELSE source_gender END AS gender_display,
      |  designation, is_finisher, is_dnf, is_dns, is_dq,
      |  dup_rank, calculated_total_seconds, finish_time_seconds,
      |  CASE WHEN finish_time_seconds IS NULL OR calculated_total_seconds IS NULL THEN NULL
      |       ELSE abs(finish_time_seconds - calculated_total_seconds) END AS time_difference,
      |  race_rank,
      |  (is_finisher AND (race_rank IS NULL OR swim IS NULL OR bike IS NULL
      |     OR run IS NULL OR finish_time_seconds IS NULL)) AS has_data_issue
      |FROM keyed
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ck = col("c_custkey")
    val athleteName = when(ck % 3 === 0, concat(lit("Solo"), (ck % 11).cast("string")))
      .when(ck % 3 === 1, concat(lit("Mary Jane-"), (ck % 11).cast("string")))
      .otherwise(concat(lit("Jo O'Neil "), (ck % 11).cast("string")))
    val sourceGender = when(ck % 3 === 0, "M").when(ck % 3 === 1, "F").otherwise("X")
    val designation = when(ck % 4 === 0, "FINISHER").when(ck % 4 === 1, "dnf")
      .when(ck % 4 === 2, "DNS").otherwise("dq")
    val base = t(spark, dir, "customer").select(
      ck,
      (lit(2020) + ck % 5).cast("int").as("year"),
      athleteName.as("athlete_name"),
      sourceGender.as("source_gender"),
      designation.as("designation"),
      ((ck * 13) % 3600 + 1200).cast("int").as("swim"),
      when(ck % 7 === 0, lit(null)).otherwise(ck % 300 + 60).cast("int").as("t1"),
      ((ck * 29) % 18000 + 9000).cast("int").as("bike"),
      when(ck % 11 === 0, lit(null)).otherwise(ck % 240 + 45).cast("int").as("t2"),
      ((ck * 17) % 14400 + 7200).cast("int").as("run"),
      when(ck % 17 === 0, lit(null)).otherwise(ck % 500 + 1).cast("int").as("race_rank"))
    val derived = base
      .withColumn("name_clean", IronmanExprs.cleanName(col("athlete_name")))
      .withColumn("calculated_total_seconds",
        IronmanExprs.calculatedTotalSeconds(
          col("swim"), col("t1"), col("bike"), col("t2"), col("run")).cast("int"))
      .withColumn("finish_time_seconds",
        when(ck % 13 === 0, lit(null)).otherwise(
          col("swim") + coalesce(col("t1"), lit(300)) + col("bike") +
            coalesce(col("t2"), lit(300)) + col("run") + ck % 90).cast("int"))
      .withColumn("is_finisher", IronmanExprs.statusFlag(col("designation"), "FINISHER"))
      .withColumn("is_dnf", IronmanExprs.statusFlag(col("designation"), "DNF"))
      .withColumn("is_dns", IronmanExprs.statusFlag(col("designation"), "DNS"))
      .withColumn("is_dq", IronmanExprs.statusFlag(col("designation"), "DQ"))
    val dupWindow = Window
      .partitionBy(col("year"), col("source_gender"), col("name_clean"))
      .orderBy(ck)
    derived
      .withColumn("dup_rank", row_number().over(dupWindow))
      .select(
        ck,
        IronmanExprs.rowKey(col("year"), col("source_gender"),
          col("name_clean"), col("dup_rank")).as("row_key"),
        col("year"), col("athlete_name"),
        IronmanExprs.firstName(col("athlete_name")).as("first_name"),
        IronmanExprs.lastName(col("athlete_name")).as("last_name"),
        col("source_gender"),
        IronmanExprs.genderLabel(col("source_gender")).as("gender_label"),
        IronmanExprs.genderLabelPassthrough(col("source_gender")).as("gender_display"),
        col("designation"), col("is_finisher"), col("is_dnf"), col("is_dns"), col("is_dq"),
        col("dup_rank"), col("calculated_total_seconds"), col("finish_time_seconds"),
        IronmanExprs.timeDifference(
          col("finish_time_seconds"), col("calculated_total_seconds")).as("time_difference"),
        col("race_rank"),
        when(
          col("is_finisher") === true && (
            col("race_rank").isNull || col("swim").isNull || col("bike").isNull ||
              col("run").isNull || col("finish_time_seconds").isNull),
          lit(true)).otherwise(lit(false)).as("has_data_issue"))
      .orderBy(ck)
  }

  /** Higher-order array functions (transform / filter / aggregate /
    * array_sort / array_join) — the lambda surface over array columns,
    * stated on exact string/integer semantics so both engines hash
    * identically (float lambdas would drift).
    */
  val f_higher_order = OpQuery(
    "f_higher_order",
    """SELECT doc_id,
      |  array_to_string(
      |    list_sort(list_transform(
      |      list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |                  t -> length(t) > 4),
      |      t -> upper(t))), ',') AS long_tokens,
      |  CAST(coalesce(list_sum(list_transform(
      |      regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> length(t))), 0) AS BIGINT) AS total_chars,
      |  CAST(length(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      t -> t LIKE '%e%')) AS INT) AS tokens_with_e
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = split(lower(trim(col("text"))), "\\s+")
    graft.Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      array_join(
        array_sort(transform(
          filter(toks, t => length(t) > 4),
          t => upper(t))), ",").as("long_tokens"),
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).as("total_chars"),
      size(filter(toks, t => t.like("%e%"))).as("tokens_with_e"))
      .orderBy(col("doc_id"))
  }

  /** Generator (table-valued) functions: posexplode with position,
    * explode over a computed array, and inline-style struct expansion —
    * one row per (doc, token index) with the token and a derived field.
    */
  val f_generator = OpQuery(
    "f_generator",
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents WHERE doc_id % 50 = 0
      |)
      |SELECT doc_id,
      |       CAST(u.i - 1 AS INT) AS pos,
      |       t[u.i] AS tok,
      |       CAST(length(t[u.i]) AS INT) AS tok_len
      |FROM toks, unnest(generate_series(1, len(t))) AS u(i)
      |ORDER BY doc_id, pos""".stripMargin) { (spark, dir) =>
    val toks = split(lower(trim(col("text"))), "\\s+")
    graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), col("tok"),
        length(col("tok")).as("tok_len"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Array set algebra: union / intersect / except between the token
    * sets of adjacent documents, canonicalized by sort (the two engines
    * order set results differently, the CONTENT is the contract).
    */
  val f_array_setops = OpQuery(
    "f_array_setops",
    """WITH pairs AS (
      |  SELECT a.doc_id,
      |         regexp_split_to_array(lower(trim(a.text)), '\s+') AS ta,
      |         regexp_split_to_array(lower(trim(b.text)), '\s+') AS tb
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 25 = 0
      |)
      |SELECT doc_id,
      |       coalesce(array_to_string(list_sort(list_distinct(list_cat(ta, tb))), ','), '') AS u,
      |       coalesce(array_to_string(list_sort(list_intersect(ta, tb)), ','), '') AS i,
      |       coalesce(array_to_string(list_sort(list_filter(list_distinct(ta),
      |         t -> NOT list_contains(tb, t))), ','), '') AS d
      |FROM pairs
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = graft.Tables.load(spark, dir, "documents")
    def toks(c: Column) = split(lower(trim(c)), "\\s+")
    val a = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), toks(col("text")).as("ta"))
    val b = docs.select((col("doc_id") - 1).as("doc_id"), toks(col("text")).as("tb"))
    a.join(b, Seq("doc_id"))
      .select(
        col("doc_id"),
        array_join(array_sort(array_union(col("ta"), col("tb"))), ",").as("u"),
        array_join(array_sort(array_intersect(col("ta"), col("tb"))), ",").as("i"),
        array_join(array_sort(array_except(col("ta"), col("tb"))), ",").as("d"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[OpQuery] = Seq(
    f_string, f_conditional, f_math, f_datetime, f_higher_order,
    f_generator, f_array_setops,
    d1_time_roundtrip, d3_natural_key, d4_surrogate_key, d10_division_parse,
    d_silver_semantics)
}
