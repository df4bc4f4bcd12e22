package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 batch 73: Bollinger bands with breakout flags, the
  * nearest-value join, and process-capability (Cp/Cpk) indices.
  */
object Round4Ops73 {

  /** Bollinger bands over daily purchase totals: 7-day rolling mean ±2σ
    * with breakout flags. The rolling moments come from rolling sums of
    * integer cents and their squares — exact under any evaluation
    * order — with the band math done once per day in doubles. One
    * window pass; emitted only where the window is full.
    */
  val ts_bollinger = OpQuery(
    "ts_bollinger",
    """WITH daily AS (
      |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1),
      |rolled AS (
      |  SELECT day, c,
      |         SUM(c) OVER w AS s,
      |         SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) OVER w AS sq,
      |         COUNT(*) OVER w AS n,
      |         ROW_NUMBER() OVER (ORDER BY day) AS rn
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |bands AS (
      |  SELECT day, CAST(c AS DOUBLE) / 100 AS total,
      |         CAST(s AS DOUBLE) / n / 100 AS mean,
      |         sqrt(CAST(sq AS DOUBLE) / n - POW(CAST(s AS DOUBLE) / n, 2)) / 100 AS sd
      |  FROM rolled WHERE rn >= 7)
      |SELECT day, CAST(ROUND(total, 2) AS DOUBLE) AS total,
      |       CAST(ROUND(mean, 4) AS DOUBLE) AS mean,
      |       CAST(ROUND(sd, 4) AS DOUBLE) AS sd,
      |       (total > mean + 2 * sd OR total < mean - 2 * sd) AS breakout
      |FROM bands
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("c"))
    // bounded: one row per calendar day after the aggregation
    val w = graft.operators.TotalOrder.boundedGlobal(col("day")).rowsBetween(-6, 0)
    val rolled = graft.operators.TotalOrder
      .checkBounded(daily, "daily-purchase-spine")
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("sq",
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        graft.operators.TotalOrder.boundedGlobal(col("day"))))
      .filter(col("rn") >= 7)
    val mean = col("s").cast("double") / col("n") / 100
    val sd = sqrt(col("sq").cast("double") / col("n") -
      pow(col("s").cast("double") / col("n"), 2)) / 100
    val total = col("c").cast("double") / 100
    rolled.select(col("day"),
        round(total, 2).cast("double").as("total"),
        round(mean, 4).cast("double").as("mean"),
        round(sd, 4).cast("double").as("sd"),
        (total > mean + lit(2) * sd || total < mean - lit(2) * sd).as("breakout"))
      .orderBy("day")
  }

  /** Nearest-value join: each order matched to the part whose retail
    * price is CLOSEST to the order total / 100 — no equality key at
    * all. Instead of the quadratic cross join, both sides are unioned
    * and sorted once; IGNORE NULLS value windows carry the nearest
    * candidate below and above each probe, and a final projection picks
    * the closer (ties to the lower candidate — pinned). O(n log n), and
    * the sort shuffle is the only data movement.
    */
  val j24_nearest_join = OpQuery(
    "j24_nearest_join",
    """WITH probes AS (
      |  SELECT o_orderkey AS id, o_totalprice / 100 AS price
      |  FROM orders WHERE o_orderkey < 2000),
      |cands AS (
      |  SELECT p_partkey AS pk, p_retailprice AS price FROM part),
      |u AS (
      |  SELECT price, 0 AS side, pk, CAST(NULL AS BIGINT) AS id FROM cands
      |  UNION ALL
      |  SELECT price, 1 AS side, CAST(NULL AS BIGINT) AS pk, id FROM probes),
      |walked AS (
      |  SELECT price, side, pk, id,
      |         last_value(CASE WHEN side = 0 THEN price END IGNORE NULLS)
      |           OVER (ORDER BY price, side, COALESCE(pk, id)
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below_p,
      |         last_value(CASE WHEN side = 0 THEN pk END IGNORE NULLS)
      |           OVER (ORDER BY price, side, COALESCE(pk, id)
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below_pk,
      |         last_value(CASE WHEN side = 0 THEN price END IGNORE NULLS)
      |           OVER (ORDER BY price DESC, side, COALESCE(pk, id)
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS above_p,
      |         last_value(CASE WHEN side = 0 THEN pk END IGNORE NULLS)
      |           OVER (ORDER BY price DESC, side, COALESCE(pk, id)
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS above_pk
      |  FROM u)
      |SELECT id AS o_orderkey, CAST(price AS DOUBLE) AS probe_price,
      |       CASE WHEN above_p IS NULL THEN below_pk
      |            WHEN below_p IS NULL THEN above_pk
      |            WHEN price - below_p <= above_p - price THEN below_pk
      |            ELSE above_pk END AS nearest_partkey,
      |       CAST(CASE WHEN above_p IS NULL THEN below_p
      |            WHEN below_p IS NULL THEN above_p
      |            WHEN price - below_p <= above_p - price THEN below_p
      |            ELSE above_p END AS DOUBLE) AS nearest_price
      |FROM walked WHERE side = 1
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val probes = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice") / 100).as("price"))
    val cands = Tables.load(spark, dir, "part")
      .select(col("p_partkey").as("pk"), col("p_retailprice").as("price"))
    val u = cands.select(col("price"), lit(0).as("side"), col("pk"),
        lit(null).cast("long").as("id"))
      .unionByName(probes.select(col("price"), lit(1).as("side"),
        lit(null).cast("long").as("pk"), col("id")))
    // The union frame is candidate-table-sized, so the two LAST_VALUE
    // IGNORE NULLS walks run as ONE distributed TotalOrder pass: the
    // below-candidate is the prefix MAX of struct(price, pk) among
    // candidates (side sorts cands before the probe at equal price, pk
    // ascending → max pk breaks price ties) and the above-candidate is
    // the SUFFIX max of struct(-price, pk) in the same ascending layout
    // — one range shuffle carries both walks. The suffix form excludes
    // equal-price candidates (they sort before the probe), but those
    // always appear in the below walk at distance 0, which the
    // ties-to-below rule then picks — output-identical to the oracle's
    // descending walk.
    val T = graft.operators.TotalOrder
    val ordKey = coalesce(col("pk"), col("id"))
    val walkedBoth = T.prefixAggs(
      u.withColumn("__b",
          when(col("side") === 0, struct(col("price"), col("pk"))))
        .withColumn("__a",
          when(col("side") === 0, struct((-col("price")).as("np"), col("pk")))),
      Seq(col("price"), col("side"), ordKey),
      maxes = Seq("__b" -> "__below"),
      suffixMaxes = Seq("__a" -> "__above"))
    val walked = walkedBoth
      .withColumn("below_p", col("__below.price"))
      .withColumn("below_pk", col("__below.pk"))
      .withColumn("above_p", -col("__above.np"))
      .withColumn("above_pk", col("__above.pk"))
    val takeBelow = col("above_p").isNull ||
      (col("below_p").isNotNull && col("price") - col("below_p") <= col("above_p") - col("price"))
    walked.filter(col("side") === 1)
      .select(col("id").as("o_orderkey"),
        col("price").cast("double").as("probe_price"),
        when(takeBelow, col("below_pk")).otherwise(col("above_pk")).as("nearest_partkey"),
        when(takeBelow, col("below_p")).otherwise(col("above_p"))
          .cast("double").as("nearest_price"))
      .orderBy("o_orderkey")
  }

  /** Process capability Cp / Cpk of order totals per priority band
    * against fixed spec limits — the SPC summary that says whether a
    * pipeline metric fits its tolerance. Moments from DECIMAL cents
    * sums; one grouped pass.
    */
  val a52_cpk = OpQuery(
    "a52_cpk",
    """WITH base AS (
      |  SELECT o_orderpriority AS band,
      |         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |m AS (
      |  SELECT band, COUNT(*) AS n,
      |         SUM(CAST(c AS DECIMAL(38,0))) AS s,
      |         SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS sq
      |  FROM base GROUP BY band),
      |stats AS (
      |  SELECT band, n,
      |         CAST(s AS DOUBLE) / n / 100 AS mu,
      |         sqrt(CAST(sq AS DOUBLE) / n - POW(CAST(s AS DOUBLE) / n, 2)) / 100 AS sd
      |  FROM m)
      |SELECT band, CAST(n AS BIGINT) AS n,
      |       CAST(ROUND(mu, 4) AS DOUBLE) AS mu,
      |       CAST(ROUND((600000 - 1000) / (6 * sd), 6) AS DOUBLE) AS cp,
      |       CAST(ROUND(LEAST((600000 - mu) / (3 * sd), (mu - 1000) / (3 * sd)), 6)
      |            AS DOUBLE) AS cpk
      |FROM stats
      |ORDER BY band""".stripMargin) { (spark, dir) =>
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("band"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val m = base.groupBy("band").agg(
      count(lit(1)).as("n"),
      sum(col("c").cast("decimal(38,0)")).as("s"),
      sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).as("sq"))
    val mu = col("s").cast("double") / col("n") / 100
    val sd = sqrt(col("sq").cast("double") / col("n") -
      pow(col("s").cast("double") / col("n"), 2)) / 100
    m.select(col("band"), col("n").cast("long").as("n"),
        round(mu, 4).cast("double").as("mu"),
        round(lit(600000 - 1000) / (lit(6) * sd), 6).cast("double").as("cp"),
        round(least((lit(600000) - mu) / (lit(3) * sd),
          (mu - lit(1000)) / (lit(3) * sd)), 6).cast("double").as("cpk"))
      .orderBy("band")
  }

  val all: Seq[OpQuery] = Seq(ts_bollinger, j24_nearest_join, a52_cpk)
}
