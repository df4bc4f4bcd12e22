package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Round-4 batch 101: bounded k-core graph peeling, the multiclass
  * F1 report (macro / micro / weighted), and the Excel serial-date
  * codec.
  */
object Round4Ops101 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** 3-round k-core peeling ([[Graph.kCore]], k=3) over the
    * customer–supplier graph (an edge when the customer's order has the
    * supplier on line 1). The oracle replays the exact synchronous-peel
    * contract as three chained degree/restrict CTEs — the gate proves
    * the loop of semi-joins ≡ the relational unrolling.
    */
  val graph_kcore = OpQuery(
    "graph_kcore",
    """WITH e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_linenumber = 1
      |), n1 AS (
      |  SELECT id FROM (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
      |  GROUP BY 1 HAVING COUNT(*) >= 3
      |), e1 AS (
      |  SELECT a, b FROM e0
      |  WHERE a IN (SELECT id FROM n1) AND b IN (SELECT id FROM n1)
      |), n2 AS (
      |  SELECT id FROM (SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1)
      |  GROUP BY 1 HAVING COUNT(*) >= 3
      |), e2 AS (
      |  SELECT a, b FROM e1
      |  WHERE a IN (SELECT id FROM n2) AND b IN (SELECT id FROM n2)
      |), n3 AS (
      |  SELECT id FROM (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2)
      |  GROUP BY 1 HAVING COUNT(*) >= 3
      |), e3 AS (
      |  SELECT a, b FROM e2
      |  WHERE a IN (SELECT id FROM n3) AND b IN (SELECT id FROM n3)
      |)
      |SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
      |FROM (SELECT a AS id FROM e3 UNION ALL SELECT b FROM e3)
      |GROUP BY 1 ORDER BY id""".stripMargin) { (spark, dir) =>
    val e0 = t(spark, dir, "lineitem")
      .filter(col("l_linenumber") === 1)
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct()
    Graph.kCore(e0, k = 3, rounds = 3)
      .select(col("id"), col("degree").cast("long").as("degree"))
      .orderBy("id")
  }

  /** Multiclass F1 report: per-class precision/recall/F1 from a
    * deterministic synthetic classifier (nation bucket, perturbed on
    * every 7th customer), plus the three aggregation conventions —
    * macro (unweighted class mean), micro (global accuracy), weighted
    * (support-weighted) — as windowed sums over the 5-row class table.
    */
  val eval_f1_multi = OpQuery(
    "eval_f1_multi",
    """WITH p AS (
      |  SELECT c_nationkey % 5 AS y,
      |         (c_nationkey + CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END)
      |           % 5 AS yh
      |  FROM customer
      |), tcnt AS (SELECT y AS cls, COUNT(*) AS n_true FROM p GROUP BY 1),
      |pcnt AS (SELECT yh AS cls, COUNT(*) AS n_pred FROM p GROUP BY 1),
      |tpos AS (SELECT y AS cls, COUNT(*) AS tp FROM p WHERE y = yh GROUP BY 1),
      |f AS (
      |  SELECT tcnt.cls, tcnt.n_true,
      |         COALESCE(pcnt.n_pred, 0) AS n_pred,
      |         COALESCE(tpos.tp, 0) AS tp,
      |         COALESCE(tpos.tp, 0) * 1.0 / COALESCE(pcnt.n_pred, 1) AS prec,
      |         COALESCE(tpos.tp, 0) * 1.0 / tcnt.n_true AS rec
      |  FROM tcnt LEFT JOIN pcnt ON tcnt.cls = pcnt.cls
      |  LEFT JOIN tpos ON tcnt.cls = tpos.cls
      |), f2 AS (
      |  SELECT cls, n_true, n_pred, tp, prec, rec,
      |         CASE WHEN prec + rec = 0 THEN 0.0
      |              ELSE 2 * prec * rec / (prec + rec) END AS f1
      |  FROM f
      |)
      |SELECT CAST(cls AS INT) AS cls,
      |       CAST(n_true AS BIGINT) AS n_true,
      |       CAST(n_pred AS BIGINT) AS n_pred,
      |       CAST(tp AS BIGINT) AS tp,
      |       CAST(ROUND(prec, 6) AS DOUBLE) AS precision,
      |       CAST(ROUND(rec, 6) AS DOUBLE) AS recall,
      |       CAST(ROUND(f1, 6) AS DOUBLE) AS f1,
      |       CAST(ROUND(AVG(f1) OVER (), 6) AS DOUBLE) AS macro_f1,
      |       CAST(ROUND(SUM(tp) OVER () * 1.0 / SUM(n_true) OVER (), 6)
      |         AS DOUBLE) AS micro_f1,
      |       CAST(ROUND(SUM(f1 * n_true) OVER () / SUM(n_true) OVER (), 6)
      |         AS DOUBLE) AS weighted_f1
      |FROM f2 ORDER BY cls""".stripMargin) { (spark, dir) =>
    val p = t(spark, dir, "customer").select(
      (col("c_nationkey") % 5).as("y"),
      ((col("c_nationkey") +
        when(col("c_custkey") % 7 === 0, 1).otherwise(0)) % 5).as("yh"))
    val tcnt = p.groupBy(col("y").as("cls")).agg(count(lit(1)).as("n_true"))
    val pcnt = p.groupBy(col("yh").as("cls")).agg(count(lit(1)).as("n_pred"))
    val tpos = p.filter(col("y") === col("yh"))
      .groupBy(col("y").as("cls")).agg(count(lit(1)).as("tp"))
    val f = tcnt.join(pcnt, Seq("cls"), "left").join(tpos, Seq("cls"), "left")
      .select(col("cls"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("tp"), lit(0L)) * lit(1.0) /
          coalesce(col("n_pred"), lit(1L))).as("prec"),
        (coalesce(col("tp"), lit(0L)) * lit(1.0) / col("n_true")).as("rec"))
    val f2 = f.withColumn("f1",
      when(col("prec") + col("rec") === 0, 0.0)
        .otherwise(lit(2) * col("prec") * col("rec") /
          (col("prec") + col("rec"))))
    val w = Window.partitionBy()
    f2.select(col("cls").cast("int").as("cls"),
        col("n_true").cast("long").as("n_true"),
        col("n_pred").cast("long").as("n_pred"),
        col("tp").cast("long").as("tp"),
        round(col("prec"), 6).cast("double").as("precision"),
        round(col("rec"), 6).cast("double").as("recall"),
        round(col("f1"), 6).cast("double").as("f1"),
        round(avg(col("f1")).over(w), 6).cast("double").as("macro_f1"),
        round(sum(col("tp")).over(w) * lit(1.0) /
          sum(col("n_true")).over(w), 6).cast("double").as("micro_f1"),
        round(sum(col("f1") * col("n_true")).over(w) /
          sum(col("n_true")).over(w), 6).cast("double").as("weighted_f1"))
      .orderBy("cls")
  }

  /** Excel serial-date codec: days since 1899-12-30 (the modern
    * convention ignoring Lotus's phantom 1900-02-29) and the exact
    * round trip back, as strings — spreadsheet interchange without a
    * UDF, pure datediff/date_add arithmetic at the scan.
    */
  val f_excel_date = OpQuery(
    "f_excel_date",
    """SELECT o_orderkey,
      |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |       CAST(datediff('day', DATE '1899-12-30',
      |            CAST(o_orderdate AS DATE)) AS INT) AS excel_serial,
      |       strftime(DATE '1899-12-30' +
      |            CAST(datediff('day', DATE '1899-12-30',
      |                 CAST(o_orderdate AS DATE)) AS INT), '%Y-%m-%d')
      |         AS roundtrip,
      |       DATE '1899-12-30' +
      |            CAST(datediff('day', DATE '1899-12-30',
      |                 CAST(o_orderdate AS DATE)) AS INT)
      |         = CAST(o_orderdate AS DATE) AS ok
      |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin) {
    (spark, dir) =>
    val epoch = to_date(lit("1899-12-30"))
    val d = to_date(col("o_orderdate"))
    val serial = datediff(d, epoch).cast("int")
    t(spark, dir, "orders").filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        date_format(d, "yyyy-MM-dd").as("order_date"),
        serial.as("excel_serial"),
        date_format(date_add(epoch, serial), "yyyy-MM-dd").as("roundtrip"),
        (date_add(epoch, serial) === d).as("ok"))
      .orderBy("o_orderkey")
  }

  val all: Seq[OpQuery] = Seq(graph_kcore, eval_f1_multi, f_excel_date)
}
