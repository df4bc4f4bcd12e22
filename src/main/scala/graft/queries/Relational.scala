package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.2–§2.6 relational operator inventory over the synthetic
  * TPC-H-ish tables (TESTDATA.md).
  *
  * Each query is the Spark-native expression of one reference operator
  * (citations in scaladoc point into /root/reference); the DuckDB oracle
  * is semantically identical ANSI SQL.
  */
object Relational {

  /** Exact money arithmetic: double -> DECIMAL(18,2) so aggregation is
    * order-independent and bit-identical between Spark and DuckDB.
    */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // ---------------------------------------------------------------------

  /** Flagship: pricing-summary full-table hash aggregate with conditional
    * and plain aggregates — the reference's A2/A5 audit-aggregate shape
    * (02_bronze.ipynb:345-352, 05_dashboard_queries.ipynb:49-105) on
    * lineitem. Map-side partial aggregation + single shuffle on the
    * 2-column group key; at 100 TB this stays a two-stage agg with no
    * join, the optimal plan.
    */
  val q1_agg = OpQuery(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      |       CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy($("l_returnflag"), $("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($("l_returnflag"), $("l_linestatus"))
  }

  private def $(name: String): Column = col(name)

  /** A5 conditional aggregates — SUM(CASE WHEN)/AVG(CASE WHEN), the
    * backbone of all 15 reference views (05_dashboard_queries.ipynb:49-105
    * kpi view). AVG over CASE is null-skipping in both engines.
    */
  val a5_conditional_agg = OpQuery(
    "a5_conditional_agg",
    """SELECT o_orderpriority,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS filled_value,
      |       CAST(COUNT(*) AS BIGINT) AS n_total
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .groupBy($("o_orderpriority"))
      .agg(
        sum(when($("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"),
        sum(when($("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when($("o_orderstatus") === "F", dec($("o_totalprice"))))
          .cast("double").as("filled_value"),
        count(lit(1)).as("n_total"))
      .orderBy($("o_orderpriority"))
  }

  /** A4/A7 exact count-distinct per group (04b_gold_dim_countries
    * .ipynb:344-350). Spark plans this as a two-phase expand+agg; at
    * scale prefer approx_count_distinct unless exactness is required —
    * the reference requires exact.
    */
  val a4_count_distinct = OpQuery(
    "a4_count_distinct",
    """SELECT c_mktsegment,
      |       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      |       CAST(COUNT(*) AS BIGINT) AS n_customers
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    t(spark, dir, "customer")
      .groupBy($("c_mktsegment"))
      .agg(
        countDistinct($("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy($("c_mktsegment"))
  }

  /** A3 distinct values of a column with a null guard
    * (04b_gold_dim_countries.ipynb:131-139).
    */
  val a3_distinct = OpQuery(
    "a3_distinct",
    """SELECT DISTINCT o_orderpriority
      |FROM orders
      |WHERE o_orderpriority IS NOT NULL
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select($("o_orderpriority"))
      .where($("o_orderpriority").isNotNull)
      .distinct()
      .orderBy($("o_orderpriority"))
  }

  /** A1 duplicate-key audit: groupBy(key).count.filter(>1)
    * (02_bronze.ipynb:254). lineitem's l_orderkey repeats per line, so
    * the audit finds real duplicates here.
    */
  val a1_dup_audit = OpQuery(
    "a1_dup_audit",
    """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_orderkey
      |HAVING COUNT(*) > 3
      |ORDER BY l_orderkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy($("l_orderkey"))
      .agg(count(lit(1)).as("n"))
      .filter($("n") > 3)
      .orderBy($("l_orderkey"))
  }

  /** A8 approximate median — PERCENTILE_APPROX(x, 0.5)
    * (05_dashboard_queries.ipynb:877). At full accuracy on integer cents
    * Spark returns the actual element at rank ceil(n/2) (smallest rank >=
    * p*n); the oracle pins exactly that rank. Cents via truncation on
    * both sides (Spark double->long cast truncates; DuckDB CAST rounds,
    * so the oracle uses TRUNC explicitly).
    */
  val a8_percentile = OpQuery(
    "a8_percentile",
    """WITH c AS (
      |  SELECT c_nationkey, CAST(TRUNC(c_acctbal * 100) AS BIGINT) AS cents FROM customer
      |), r AS (
      |  SELECT c_nationkey, cents,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cents) AS rn,
      |         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM c
      |)
      |SELECT c_nationkey, cents AS median_cents
      |FROM r WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "customer")
      .withColumn("cents", ($("c_acctbal") * 100).cast("long"))
      .groupBy($("c_nationkey"))
      .agg(percentile_approx($("cents"), lit(0.5), lit(1000000)).as("median_cents"))
      .orderBy($("c_nationkey"))
  }

  /** A9 group-by-computed-expression histogram bucketing —
    * GROUP BY FLOOR(x/3600) (05_dashboard_queries.ipynb:549-560).
    */
  val a9_histogram = OpQuery(
    "a9_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .groupBy(floor($("o_totalprice") / 50000).cast("long").as("price_bucket"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($("price_bucket"))
  }

  /** A10 ratio-of-aggregates — AVG(part)*100/AVG(total) segment share
    * (05_dashboard_queries.ipynb:436-439).
    */
  val a10_ratio_of_aggs = OpQuery(
    "a10_ratio_of_aggs",
    """SELECT l_returnflag,
      |       CAST(ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,2))) AS DOUBLE) * 100
      |             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS DOUBLE) AS discount_share_pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .groupBy($("l_returnflag"))
      .agg(
        round(
          sum(dec($("l_extendedprice") * $("l_discount"))).cast("double") * 100 /
            sum(dec($("l_extendedprice"))).cast("double"),
          4).as("discount_share_pct"))
      .orderBy($("l_returnflag"))
  }

  // ---------------------------------------------------------------------
  // Projection / filter / predicates (SURVEY §2.2)
  // ---------------------------------------------------------------------

  /** P1/P2/P3 projection with column add + drop (03_silver.ipynb:581-608),
    * P4 equality filter (03_silver.ipynb:103). Filter + pruning reach the
    * parquet scan (PushedFilters in explain).
    */
  val p1_project_filter = OpQuery(
    "p1_project_filter",
    """SELECT o_orderkey, o_custkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_dec
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    // DECIMAL internally; DOUBLE in the final schema — raw DECIMAL output
    // columns diverge at the driver's hash layer (DuckDB client coerces
    // DECIMAL -> float64, so '100.50' vs '100.5').
    t(spark, dir, "orders")
      .filter($("o_orderstatus") === "F")
      .withColumn("total_dec", dec($("o_totalprice")).cast("double"))
      .select($("o_orderkey"), $("o_custkey"), $("total_dec"))
      .orderBy($("o_orderkey"))
  }

  /** P7 null-sentinel normalization: value -> NULL via when/otherwise
    * folded over columns (02_bronze.ipynb:139-143), plus P5 null
    * predicates on the result.
    */
  val p7_null_sentinel = OpQuery(
    "p7_null_sentinel",
    """WITH norm AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS priority_n
      |  FROM orders
      |)
      |SELECT
      |  CAST(SUM(CASE WHEN priority_n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(SUM(CASE WHEN priority_n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_set
      |FROM norm""".stripMargin) { (spark, dir) =>
    val norm = Seq("o_orderpriority").foldLeft(t(spark, dir, "orders")) { (df, c) =>
      df.withColumn(
        "priority_n",
        when(col(c) === "1-URGENT", lit(null)).otherwise(col(c)))
    }
    norm.agg(
      sum(when($("priority_n").isNull, 1).otherwise(0)).as("n_null"),
      sum(when($("priority_n").isNotNull, 1).otherwise(0)).as("n_set"))
  }

  /** P6/P8 compound boolean predicates mixing AND/OR/comparison
    * (03_silver.ipynb:466-480, view WHEREs 05:440).
    */
  val p8_compound_predicates = OpQuery(
    "p8_compound_predicates",
    """SELECT l_orderkey, l_linenumber
      |FROM lineitem
      |WHERE (l_returnflag = 'R' AND l_quantity > 45)
      |   OR (l_discount > 0.09 AND l_tax < 0.02)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    t(spark, dir, "lineitem")
      .filter(
        ($("l_returnflag") === "R" && $("l_quantity") > 45) ||
          ($("l_discount") > 0.09 && $("l_tax") < 0.02))
      .select($("l_orderkey"), $("l_linenumber"))
      .orderBy($("l_orderkey"), $("l_linenumber"))
  }

  // ---------------------------------------------------------------------
  // Joins (SURVEY §2.3)
  // ---------------------------------------------------------------------

  /** J1/J2 left join to a small mapping table — auto-broadcast
    * (04b_gold_dim_countries.ipynb:258-267). nation (25 rows) broadcasts;
    * no shuffle of customer at any scale.
    */
  val j1_left_join_broadcast = OpQuery(
    "j1_left_join_broadcast",
    """SELECT c.c_custkey, n.n_name
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |ORDER BY c.c_custkey""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(c("c_custkey"), n("n_name"))
      .orderBy($("c_custkey"))
  }

  /** J3–J6 star-schema fact->dims multi-join with per-dim aggregation
    * (04d_gold_fact_race_results.ipynb:178-224, 460-478). Dims broadcast;
    * the single shuffle is the final group-by.
    */
  val j3_star_join = OpQuery(
    "j3_star_join",
    """SELECT n.n_name, r.r_name,
      |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |       CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem l
      |JOIN orders o   ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n   ON c.c_nationkey = n.n_nationkey
      |JOIN region r   ON n.n_regionkey = r.r_regionkey
      |GROUP BY n.n_name, r.r_name
      |ORDER BY n.n_name, r.r_name""".stripMargin) { (spark, dir) =>
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name"), r("r_name"))
      .agg(
        sum(dec(l("l_extendedprice")) * dec(lit(1) - l("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($("n_name"), $("r_name"))
  }

  /** J8 year-over-year offset self-join (05_dashboard_queries
    * .ipynb:674-702), implemented as the reference's literal
    * `curr.year = prev.year + 1` self-join over the per-year aggregate
    * (tiny — broadcast, no meaningful cost). NB lag() over an ordered
    * window is NOT substituted here: it diverges when a year is missing
    * from the domain (lag reads the previous existing row; the self-join
    * reads year-1 or NULL).
    */
  val j8_yoy_lag = OpQuery(
    "j8_yoy_lag",
    """WITH yearly AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1
      |)
      |SELECT curr.order_year, curr.total_value, curr.n_orders,
      |       prev.total_value AS prev_value,
      |       CAST(ROUND(COALESCE((curr.total_value - prev.total_value) * 100.0
      |            / NULLIF(prev.total_value, 0), 0), 4) AS DOUBLE) AS yoy_pct
      |FROM yearly curr LEFT JOIN yearly prev ON curr.order_year = prev.order_year + 1
      |ORDER BY curr.order_year""".stripMargin) { (spark, dir) =>
    val yearly = t(spark, dir, "orders")
      .groupBy(year($("o_orderdate")).as("order_year"))
      .agg(
        sum(dec($("o_totalprice"))).cast("double").as("total_value"),
        count(lit(1)).as("n_orders"))
    val prev = yearly.select(
      ($("order_year") + 1).as("order_year"),
      $("total_value").as("prev_value"))
    yearly
      .join(broadcast(prev), Seq("order_year"), "left")
      .withColumn(
        "yoy_pct",
        round(
          coalesce(
            ($("total_value") - $("prev_value")) * 100.0 /
              nullif($("prev_value"), lit(0)),
            lit(0)),
          4).cast("double"))
      .select($("order_year"), $("total_value"), $("n_orders"),
        $("prev_value"), $("yoy_pct"))
      .orderBy($("order_year"))
  }

  /** J9 vertical union with schema drift — unionByName(allowMissing)
    * (02_bronze.ipynb:184-186). One slice lacks a column; it resurfaces
    * as NULL, exactly the reference's stacking semantics.
    */
  val j9_union_by_name = OpQuery(
    "j9_union_by_name",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority
      |FROM (
      |  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, NULL AS o_orderpriority FROM orders WHERE o_orderstatus <> 'F'
      |)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir, "orders")
    val withPriority = o.filter($("o_orderstatus") === "F")
      .select($("o_orderkey"), $("o_orderstatus"), $("o_orderpriority"))
    val missingCol = o.filter($("o_orderstatus") =!= "F")
      .select($("o_orderkey"), $("o_orderstatus"))
    Seq(withPriority, missingCol)
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .orderBy($("o_orderkey"))
  }

  /** Semi/anti joins — the building blocks of the Delta-MERGE emulation
    * (SURVEY §7.3): EXISTS / NOT EXISTS as left_semi / left_anti.
    */
  val j10_semi_anti = OpQuery(
    "j10_semi_anti",
    """SELECT c_custkey, has_order FROM (
      |  SELECT c_custkey, TRUE AS has_order FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, FALSE AS has_order FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select($("o_custkey").as("c_custkey"))
    val semi = c.join(o, Seq("c_custkey"), "left_semi")
      .select($("c_custkey"), lit(true).as("has_order"))
    val anti = c.join(o, Seq("c_custkey"), "left_anti")
      .select($("c_custkey"), lit(false).as("has_order"))
    semi.unionByName(anti).orderBy($("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // Windows (SURVEY §2.5)
  // ---------------------------------------------------------------------

  /** W1 dedup-rank row_number with null-aware ordering
    * (02_bronze.ipynb:210-218): row_number() OVER (PARTITION BY ...
    * ORDER BY x ASC NULLS LAST, y ASC).
    */
  val w1_row_number = OpQuery(
    "w1_row_number",
    """SELECT o_orderkey, rn FROM (
      |  SELECT o_orderkey,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |              ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC) AS INT) AS rn
      |  FROM orders
      |)
      |WHERE rn <= 2
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy($("o_custkey"))
      .orderBy($("o_orderdate").asc_nulls_last, $("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($("rn") <= 2)
      .select($("o_orderkey"), $("rn"))
      .orderBy($("o_orderkey"))
  }

  /** W2 latest-record-per-key pick — the canonical top-1-per-group dedup
    * (04a_gold_dim_athletes.ipynb:159-170): rank then keep rn == 1.
    */
  val w2_top1_per_group = OpQuery(
    "w2_top1_per_group",
    """SELECT o_custkey, o_orderkey AS latest_order, strftime(o_orderdate, '%Y-%m-%d') AS latest_date
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |              ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC) AS rn
      |  FROM orders
      |)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy($("o_custkey"))
      .orderBy($("o_orderdate").desc_nulls_last, $("o_orderkey").desc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($("rn") === 1)
      .select(
        $("o_custkey"),
        $("o_orderkey").as("latest_order"),
        date_format($("o_orderdate"), "yyyy-MM-dd").as("latest_date"))
      .orderBy($("o_custkey"))
  }

  /** W3 windowed share-of-total: aggregate first, then SUM() OVER a
    * partition of the aggregate (05_dashboard_queries.ipynb:228, 375).
    */
  val w3_share_of_total = OpQuery(
    "w3_share_of_total",
    """SELECT order_year, o_orderstatus, n_orders,
      |       CAST(ROUND(n_orders * 100.0 / SUM(n_orders) OVER (PARTITION BY order_year), 4) AS DOUBLE) AS pct_of_year
      |FROM (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year, o_orderstatus,
      |         CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1, 2
      |)
      |ORDER BY order_year, o_orderstatus""".stripMargin) { (spark, dir) =>
    val agged = t(spark, dir, "orders")
      .groupBy(
        year($("o_orderdate")).as("order_year"),
        $("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy($("order_year"))
    agged
      .withColumn(
        "pct_of_year",
        round($("n_orders") * 100.0 / sum($("n_orders")).over(w), 4)
          .cast("double"))
      .orderBy($("order_year"), $("o_orderstatus"))
  }

  // ---------------------------------------------------------------------
  // Sorts / limits / top-k (SURVEY §2.6)
  // ---------------------------------------------------------------------

  /** O1/O2 multi-column order-by + limit — Spark plans
    * TakeOrderedAndProject, the scalable top-k (no full sort at scale).
    * Tie-broken to a total order so the oracle matches.
    */
  val o2_topk = OpQuery(
    "o2_topk",
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select($("o_orderkey"), dec($("o_totalprice")).cast("double").as("price"), $("o_totalprice"))
      .orderBy($("o_totalprice").desc, $("o_orderkey").asc)
      .limit(10)
      .select($("o_orderkey"), $("price"))
  }

  val all: Seq[OpQuery] = Seq(
    q1_agg, a5_conditional_agg, a4_count_distinct, a3_distinct, a1_dup_audit,
    a8_percentile, a9_histogram, a10_ratio_of_aggs,
    p1_project_filter, p7_null_sentinel, p8_compound_predicates,
    j1_left_join_broadcast, j3_star_join, j8_yoy_lag, j9_union_by_name,
    j10_semi_anti,
    w1_row_number, w2_top1_per_group, w3_share_of_total,
    o2_topk)
}
