package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 105: k-fold stratification audit, the Jarque–Bera
  * normality test, periodogram seasonality detection, and a
  * ULID-style Crockford base32 codec.
  */
object Round4Ops105 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** k-fold assignment audit: customers deterministically folded by a
    * Knuth multiplicative hash, then each (fold, segment) cell compared
    * against its expected count from the margins — the pre-training
    * check that a hash split didn't skew any stratum. One scan, two
    * 5-row margin aggregates joined back.
    */
  val ml_kfold = OpQuery(
    "ml_kfold",
    """WITH a AS (
      |  SELECT (c_custkey * 2654435761) % 5 AS fold, c_mktsegment AS seg
      |  FROM customer
      |), cnt AS (SELECT fold, seg, COUNT(*) AS n FROM a GROUP BY 1, 2),
      |fm AS (SELECT fold, SUM(n) AS nf FROM cnt GROUP BY 1),
      |sm AS (SELECT seg, SUM(n) AS ns FROM cnt GROUP BY 1),
      |tot AS (SELECT SUM(n) AS nn FROM cnt)
      |SELECT CAST(cnt.fold AS INT) AS fold, cnt.seg,
      |       CAST(cnt.n AS BIGINT) AS n,
      |       CAST(ROUND(CAST(fm.nf AS DOUBLE) * sm.ns / tot.nn, 4) AS DOUBLE)
      |         AS expected,
      |       CAST(ROUND(cnt.n / (CAST(fm.nf AS DOUBLE) * sm.ns / tot.nn), 6)
      |         AS DOUBLE) AS ratio
      |FROM cnt JOIN fm ON cnt.fold = fm.fold JOIN sm ON cnt.seg = sm.seg
      |CROSS JOIN tot
      |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    val a = t(spark, dir, "customer").select(
      ((col("c_custkey") * 2654435761L) % 5).as("fold"),
      col("c_mktsegment").as("seg"))
    val cnt = a.groupBy("fold", "seg").agg(count(lit(1)).as("n"))
    val fm = cnt.groupBy("fold").agg(sum(col("n")).as("nf"))
    val sm = cnt.groupBy("seg").agg(sum(col("n")).as("ns"))
    val tot = cnt.agg(sum(col("n")).as("nn"))
    val expected = col("nf").cast("double") * col("ns") / col("nn")
    cnt.join(fm, "fold").join(sm, "seg").crossJoin(tot)
      .select(col("fold").cast("int").as("fold"), col("seg"),
        col("n").cast("long").as("n"),
        round(expected, 4).cast("double").as("expected"),
        round(col("n") / expected, 6).cast("double").as("ratio"))
      .orderBy("fold", "seg")
  }

  /** Jarque–Bera normality test on order totals: skewness and excess
    * kurtosis from raw power sums of the 1e5-scaled value (keeps x⁴
    * inside double precision), JB = n/6·(S² + K²/4). The scale factor
    * cancels in both moment ratios, so the statistic is unchanged —
    * documented contract.
    */
  val a83_jarque_bera = OpQuery(
    "a83_jarque_bera",
    """WITH s AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) / 100000 AS x FROM orders
      |), m AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2,
      |         SUM(x * x * x) AS s3, SUM(x * x * x * x) AS s4
      |  FROM s
      |), c AS (
      |  SELECT n, s1 / n AS mu,
      |         s2 / n - s1 / n * (s1 / n) AS m2,
      |         s3 / n - 3 * (s1 / n) * (s2 / n)
      |           + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
      |         s4 / n - 4 * (s1 / n) * (s3 / n)
      |           + 6 * (s1 / n) * (s1 / n) * (s2 / n)
      |           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      |  FROM m
      |)
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(ROUND(m3 / POW(m2, 1.5), 6) AS DOUBLE) AS skewness,
      |       CAST(ROUND(m4 / (m2 * m2) - 3, 6) AS DOUBLE) AS ex_kurtosis,
      |       CAST(ROUND(n / 6.0 * (m3 / POW(m2, 1.5) * (m3 / POW(m2, 1.5))
      |            + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4), 4)
      |         AS DOUBLE) AS jb
      |FROM c""".stripMargin) { (spark, dir) =>
    val x = col("o_totalprice").cast("double") / 100000
    val m = t(spark, dir, "orders").select(x.as("x")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("s1"),
      sum(col("x") * col("x")).as("s2"),
      sum(col("x") * col("x") * col("x")).as("s3"),
      sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val n = col("n")
    val mu = col("s1") / n
    val m2 = col("s2") / n - mu * mu
    val m3 = col("s3") / n - lit(3) * mu * (col("s2") / n) +
      lit(2) * mu * mu * mu
    val m4 = col("s4") / n - lit(4) * mu * (col("s3") / n) +
      lit(6) * mu * mu * (col("s2") / n) - lit(3) * mu * mu * mu * mu
    val skew = m3 / pow(m2, 1.5)
    val kurt = m4 / (m2 * m2) - 3
    m.select(n.cast("long").as("n"),
      round(skew, 6).cast("double").as("skewness"),
      round(kurt, 6).cast("double").as("ex_kurtosis"),
      round(n / lit(6.0) * (skew * skew + kurt * kurt / 4), 4)
        .cast("double").as("jb"))
  }

  /** Periodogram over the mean-centered daily revenue series: spectral
    * power at candidate periods 2–14 days as a share of total power,
    * with the dominant period flagged on the ROUNDED share (engine-
    * stable). O(n·k) trig sums — never an FFT's data reshuffle — and k
    * is a constant 13, so the scan dominates at scale.
    */
  val ts_periodogram = OpQuery(
    "ts_periodogram",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1
      |), idx AS (
      |  SELECT v, ROW_NUMBER() OVER (ORDER BY d) - 1 AS ti FROM daily
      |), st AS (SELECT COUNT(*) AS n, AVG(v) AS mu FROM idx),
      |per AS (SELECT unnest(generate_series(2, 14)) AS p),
      |terms AS (
      |  SELECT per.p,
      |         (idx.v - st.mu) * COS(2 * PI() * idx.ti / per.p) AS c,
      |         (idx.v - st.mu) * SIN(2 * PI() * idx.ti / per.p) AS s
      |  FROM idx CROSS JOIN per CROSS JOIN st
      |), pw AS (
      |  SELECT p, SUM(c) AS a, SUM(s) AS b FROM terms GROUP BY 1
      |), sh AS (
      |  SELECT p,
      |         ROUND((a * a + b * b) /
      |           (SELECT SUM(a * a + b * b) FROM pw), 6) AS power_share
      |  FROM pw
      |)
      |SELECT CAST(p AS INT) AS period,
      |       CAST(power_share AS DOUBLE) AS power_share,
      |       power_share = MAX(power_share) OVER () AS dominant
      |FROM sh ORDER BY period""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val idx = graft.operators.TotalOrder
      .checkBounded(daily, "daily-value-spine").select(col("v"),
      // bounded: one row per calendar day after the aggregation
      (row_number().over(
        graft.operators.TotalOrder.boundedGlobal(col("d"))) - 1).as("ti"))
    val st = idx.agg(count(lit(1)).as("n"), avg(col("v")).as("mu"))
    val per = t(spark, dir, "region").limit(1)
      .select(explode(sequence(lit(2), lit(14))).as("p"))
    val terms = idx.crossJoin(per).crossJoin(st).select(col("p"),
      ((col("v") - col("mu")) *
        cos(lit(2) * lit(math.Pi) * col("ti") / col("p"))).as("c"),
      ((col("v") - col("mu")) *
        sin(lit(2) * lit(math.Pi) * col("ti") / col("p"))).as("s"))
    val pw = terms.groupBy("p")
      .agg(sum(col("c")).as("a"), sum(col("s")).as("b"))
    val tot = pw.agg(sum(col("a") * col("a") + col("b") * col("b")).as("tp"))
    val sh = pw.crossJoin(tot).select(col("p"),
      round((col("a") * col("a") + col("b") * col("b")) / col("tp"), 6)
        .as("power_share"))
    sh.select(col("p").cast("int").as("period"),
        col("power_share").cast("double").as("power_share"),
        (col("power_share") ===
          max(col("power_share")).over(Window.partitionBy())).as("dominant"))
      .orderBy("period")
  }

  /** ULID-style Crockford base32 codec: a 50-bit id encoded to 10
    * symbols by pure div/mod digit extraction (no UDF, no codegen
    * break) and decoded back by positional lookup — the gate pins the
    * exact round trip. PI()-free integer arithmetic, identical in both
    * engines modulo the `//` vs `DIV` spelling.
    */
  val f_ulid = OpQuery(
    "f_ulid",
    """WITH base AS (
      |  SELECT event_id,
      |         (event_id * 2654435761) % 1125899906842624 AS n
      |  FROM events WHERE event_id < 150
      |), enc AS (
      |  SELECT event_id, n,
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 35184372088832) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 1099511627776) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 34359738368) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 1073741824) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 33554432) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 1048576) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 32768) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 1024) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST((n // 32) % 32 AS INT) + 1, 1) ||
      |    substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
      |      CAST(n % 32 AS INT) + 1, 1) AS ulid
      |  FROM base
      |), dec AS (
      |  SELECT event_id, n, ulid,
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 1, 1)) - 1 AS BIGINT)
      |      * 35184372088832 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 2, 1)) - 1 AS BIGINT)
      |      * 1099511627776 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 3, 1)) - 1 AS BIGINT)
      |      * 34359738368 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 4, 1)) - 1 AS BIGINT)
      |      * 1073741824 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 5, 1)) - 1 AS BIGINT)
      |      * 33554432 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 6, 1)) - 1 AS BIGINT)
      |      * 1048576 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 7, 1)) - 1 AS BIGINT)
      |      * 32768 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 8, 1)) - 1 AS BIGINT)
      |      * 1024 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 9, 1)) - 1 AS BIGINT)
      |      * 32 +
      |    CAST(strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 10, 1)) - 1 AS BIGINT)
      |      AS decoded
      |  FROM enc
      |)
      |SELECT event_id, CAST(n AS BIGINT) AS n, ulid,
      |       CAST(decoded AS BIGINT) AS decoded, decoded = n AS ok
      |FROM dec ORDER BY event_id""".stripMargin) { (spark, dir) =>
    t(spark, dir, "events").filter(col("event_id") < 150)
      .createOrReplaceTempView("graft_ulid_events")
    val alpha = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    val pows = Seq(35184372088832L, 1099511627776L, 34359738368L,
      1073741824L, 33554432L, 1048576L, 32768L, 1024L, 32L, 1L)
    val encExpr = pows.map(p =>
      s"substr('$alpha', CAST((n DIV $p) % 32 AS INT) + 1, 1)")
      .mkString(" || ")
    val decExpr = pows.zipWithIndex.map { case (p, i) =>
      s"CAST(instr('$alpha', substr(ulid, ${i + 1}, 1)) - 1 AS BIGINT) * ${p}L"
    }.mkString(" + ")
    spark.sql(
      s"""WITH base AS (
         |  SELECT event_id,
         |         (event_id * 2654435761) % 1125899906842624 AS n
         |  FROM graft_ulid_events
         |), enc AS (
         |  SELECT event_id, n, $encExpr AS ulid FROM base
         |), dec AS (
         |  SELECT event_id, n, ulid, $decExpr AS decoded FROM enc
         |)
         |SELECT event_id, CAST(n AS BIGINT) AS n, ulid,
         |       CAST(decoded AS BIGINT) AS decoded, decoded = n AS ok
         |FROM dec ORDER BY event_id""".stripMargin)
  }

  val all: Seq[OpQuery] = Seq(ml_kfold, a83_jarque_bera, ts_periodogram,
    f_ulid)
}
