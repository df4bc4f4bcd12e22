package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-4 batch 25: hostile-CSV ingest (quoted multiline fields),
  * bitmap-aggregate distinct counting, SQL pipe syntax, parameterized
  * SQL, and lag autocorrelation.
  */
object Round4Ops25 {

  /** CSV round trip with embedded delimiters, quotes, and newlines —
    * the fields that break naive line-split ingest. multiLine=true
    * makes records span physical lines; quoting/escaping round-trips
    * the raw document text byte-for-byte. The oracle reads the source
    * table (never the CSV), so the gate proves lossless ingest.
    */
  val s26_csv_multiline_quote = OpQuery(
    "s26_csv_multiline_quote",
    """SELECT doc_id, text, lang
      |FROM documents
      |WHERE doc_id % 20 = 0
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select("doc_id", "text", "lang")
    val out = graft.queries.GateScratch.dir("graft-mlcsv-").toString
    docs.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(out)
    spark.read
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .schema(docs.schema)
      .csv(out)
      .orderBy("doc_id")
  }

  /** Bitmap aggregates (Spark 4 bitmap_* family): exact distinct counts
    * as mergeable fixed-width bitmaps — the re-aggregatable exact
    * counterpart of HLL for dense integer domains. The oracle states
    * plain COUNT(DISTINCT), proving bitmap_count ∘ bitmap_construct_agg
    * is exactly that.
    */
  val a28_bitmap_distinct = OpQuery(
    "a28_bitmap_distinct",
    """SELECT o_orderpriority,
      |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_bm_orders")
    spark.sql(
      """WITH per_bucket AS (
        |  SELECT o_orderpriority,
        |         bitmap_bucket_number(o_custkey) AS bucket,
        |         bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm,
        |         COUNT(*) AS n
        |  FROM graft_bm_orders
        |  GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey))
        |SELECT o_orderpriority,
        |       CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_customers,
        |       CAST(SUM(n) AS BIGINT) AS n_orders
        |FROM per_bucket
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** SQL pipe syntax (Spark 4): the |> operator chain — FROM ... |>
    * WHERE |> AGGREGATE — compiles to the identical logical plan as the
    * classical form the oracle states.
    */
  val p13_pipe_syntax = OpQuery(
    "p13_pipe_syntax",
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |       CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("graft_pipe_lineitem")
    spark.sql(
      """FROM graft_pipe_lineitem
        ||> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        ||> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |   GROUP BY l_returnflag
        ||> SELECT l_returnflag, qty, n
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  /** Parameterized SQL (named-marker binding via spark.sql(args=...)):
    * literals travel as typed parameters, not string splices — the
    * injection-safe API surface. The oracle inlines the same values.
    */
  val p14_parameterized_sql = OpQuery(
    "p14_parameterized_sql",
    """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 300000
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "orders").createOrReplaceTempView("graft_param_orders")
    spark.sql(
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
        |FROM graft_param_orders
        |WHERE o_orderstatus = :status AND o_totalprice > :floor
        |ORDER BY o_orderkey""".stripMargin,
      Map("status" -> "F", "floor" -> Int.box(300000)))
  }

  /** Lag-k autocorrelation (k = 1..7) of the daily event series from
    * exact integer cross-moments: r_k = (n·Σxy − Σx·Σy) /
    * √(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²) where every Σ is a BIGINT over the
    * lag-joined day pairs — engines share the one float expression.
    * The weekly seasonality planted by dow effects shows up as an r_7
    * peak.
    */
  val ts_autocorr = OpQuery(
    "ts_autocorr",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY CAST(ts AS DATE)),
      |lagged AS (
      |  SELECT k.k, a.c AS x, b.c AS y
      |  FROM daily a
      |  JOIN (SELECT unnest(generate_series(1, 7)) AS k) k ON true
      |  JOIN daily b ON b.d = a.d + CAST(k.k AS INT) * INTERVAL 1 DAY),
      |m AS (
      |  SELECT k, COUNT(*) AS n,
      |         SUM(x) AS sx, SUM(y) AS sy,
      |         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM lagged GROUP BY k)
      |SELECT CAST(k AS INT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
      |       CAST(ROUND((n * sxy - sx * sy) /
      |            (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |             sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS DOUBLE) AS autocorr
      |FROM m
      |ORDER BY lag_days""".stripMargin) { (spark, dir) =>
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_ac_events")
    spark.sql(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM graft_ac_events GROUP BY CAST(ts AS DATE)),
        |lagged AS (
        |  SELECT k.k, a.c AS x, b.c AS y
        |  FROM daily a
        |  JOIN (SELECT explode(sequence(1, 7)) AS k) k ON true
        |  JOIN daily b ON b.d = date_add(a.d, k.k)),
        |m AS (
        |  SELECT k, COUNT(*) AS n,
        |         SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM lagged GROUP BY k)
        |SELECT CAST(k AS INT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
        |       CAST(ROUND((n * sxy - sx * sy) /
        |            (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |             sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS DOUBLE) AS autocorr
        |FROM m
        |ORDER BY lag_days""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(
    s26_csv_multiline_quote, a28_bitmap_distinct, p13_pipe_syntax,
    p14_parameterized_sql, ts_autocorr)
}
