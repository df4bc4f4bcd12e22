package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Round-6 batch 11: temporal dimension enrichment — the query every
  * SCD2 dimension exists FOR: attach to each fact row the dimension
  * version that was valid AT THE FACT'S TIME, via [[AsOfJoin]] on the
  * version's `valid_from` (correct because SCD2 versions are
  * contiguous: the latest version opened at-or-before the event IS the
  * covering version; events before the first version enrich to NULL).
  *
  * The version history is derived arithmetically from customer keys
  * (1 + key%3 versions opening in 1995/1996/1997), so the oracle
  * constructs the identical SCD2 table and states the textbook
  * correlated pick (max valid_from ≤ event year) directly.
  */
object Round6Ops11 {

  val scd2_asof_enrichment = OpQuery(
    "scd2_asof_enrichment",
    """WITH versions AS (
      |  SELECT c.c_custkey AS k, v.v AS v,
      |         1995 + v.v AS valid_from,
      |         (c.c_custkey + v.v * 7) % 5 AS attr
      |  FROM customer c, (SELECT unnest([0, 1, 2]) AS v) v
      |  WHERE v.v <= c.c_custkey % 3
      |), facts AS (
      |  SELECT o_orderkey, o_custkey AS k,
      |         CAST(strftime(o_orderdate, '%Y') AS INT) AS event_year
      |  FROM orders WHERE o_orderkey % 7 = 0
      |), picked AS (
      |  SELECT f.o_orderkey, f.k, f.event_year,
      |         MAX(ver.valid_from) AS vf
      |  FROM facts f LEFT JOIN versions ver
      |    ON ver.k = f.k AND ver.valid_from <= f.event_year
      |  GROUP BY 1, 2, 3
      |)
      |SELECT p.o_orderkey, p.event_year,
      |       CAST(ver.attr AS BIGINT) AS asof_attr,
      |       CAST(p.vf AS INT) AS asof_valid_from
      |FROM picked p LEFT JOIN versions ver
      |  ON ver.k = p.k AND ver.valid_from = p.vf
      |ORDER BY p.o_orderkey""".stripMargin) { (spark, dir) =>
    val versions = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        explode(sequence(lit(0L), col("c_custkey") % 3)).as("v"))
      .select(col("k"),
        (lit(1995) + col("v")).cast("int").as("valid_from"),
        ((col("k") + col("v") * 7) % 5).cast("long").as("attr"))
    val facts = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("k"),
        year(col("o_orderdate")).cast("int").as("event_year"))
    AsOfJoin.asOf(facts, versions, keys = Seq("k"),
        leftTime = "event_year", rightTime = "valid_from")
      .select(col("o_orderkey"), col("event_year"),
        col("asof_attr"),
        col("asof_valid_from").cast("int").as("asof_valid_from"))
      .orderBy(col("o_orderkey"))
  }

  val all: Seq[OpQuery] = Seq(scd2_asof_enrichment)
}
