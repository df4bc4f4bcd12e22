package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 68: z-score feature standardization, stratified
  * k-fold assignment, and DISTINCT ON (latest-row-per-key) semantics.
  */
object Round4Ops68 {

  /** Z-score standardization of order value within each market
    * segment — the feature-scaling step before any distance-based
    * model. Moments come from integer-cents sums carried as
    * DECIMAL(38,0) (order-independent, and wide enough that a 100 TB
    * sum still fits where a BIGINT would overflow); one broadcast of
    * the 5-row stats table back onto the fact.
    */
  val feature_standardize = OpQuery(
    "feature_standardize",
    """WITH base AS (
      |  SELECT o.o_orderkey, c.c_mktsegment AS seg,
      |         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |stats AS (
      |  SELECT seg, COUNT(*) AS n,
      |         SUM(CAST(cents AS DECIMAL(38,0))) AS s,
      |         SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS sq
      |  FROM base GROUP BY seg)
      |SELECT b.o_orderkey, b.seg,
      |       CAST(ROUND((b.cents - CAST(st.s AS DOUBLE) / st.n) /
      |            sqrt(CAST(st.sq AS DOUBLE) / st.n -
      |                 POW(CAST(st.s AS DOUBLE) / st.n, 2)), 6) AS DOUBLE) AS z
      |FROM base b JOIN stats st ON b.seg = st.seg
      |WHERE b.o_orderkey < 4000
      |ORDER BY b.o_orderkey""".stripMargin) { (spark, dir) =>
    val orders = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    val base = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val stats = base.groupBy("seg").agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum(col("cents").cast("decimal(38,0)") * col("cents").cast("decimal(38,0)"))
        .as("sq"))
    base.join(broadcast(stats), "seg")
      .select(col("o_orderkey"), col("seg"),
        round((col("cents") - stats("s").cast("double") / col("n")) /
          sqrt(stats("sq").cast("double") / col("n") -
            pow(stats("s").cast("double") / col("n"), 2)), 6)
          .cast("double").as("z"))
      .filter(col("o_orderkey") < 4000)
      .orderBy("o_orderkey")
  }

  /** Stratified 5-fold assignment: within each language stratum,
    * documents are shuffled by md5(doc_id) and dealt round-robin into
    * folds, so folds are balanced per stratum and identical on every
    * engine/run. The gate reports per-(lang, fold) counts and an id
    * checksum; the assignment itself is one window pass.
    */
  val ml_kfold_assign = OpQuery(
    "ml_kfold_assign",
    """WITH assigned AS (
      |  SELECT lang, doc_id,
      |         CAST((ROW_NUMBER() OVER (PARTITION BY lang
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5 AS INT) AS fold
      |  FROM documents)
      |SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM assigned
      |GROUP BY lang, fold
      |ORDER BY lang, fold""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"))
      .withColumn("fold", ((row_number().over(w) - 1) % 5).cast("int"))
      .groupBy("lang", "fold")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("id_checksum"))
      .orderBy("lang", "fold")
  }

  /** DISTINCT ON semantics — latest shipped line per order. DuckDB
    * runs its native `DISTINCT ON (key) ... ORDER BY` clause; the
    * Spark side expresses the identical contract as a row_number
    * window, the scalable shuffle-once plan for keep-one-row-per-key.
    */
  val o7_distinct_on = OpQuery(
    "o7_distinct_on",
    """SELECT DISTINCT ON (l_orderkey)
      |       l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
      |       strftime(l_shipdate, '%Y-%m-%d') AS ship
      |FROM lineitem
      |WHERE l_orderkey < 2000
      |ORDER BY l_orderkey, l_shipdate DESC, l_linenumber DESC""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
      .orderBy("l_orderkey")
  }

  val all: Seq[OpQuery] = Seq(feature_standardize, ml_kfold_assign, o7_distinct_on)
}
