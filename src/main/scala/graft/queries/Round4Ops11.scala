package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables

/** Round-4 batch 11: robust statistics (MAD), bitwise operators,
  * cross-engine table checksums, and schema'd JSON parsing.
  */
object Round4Ops11 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Median absolute deviation per group — the robust dispersion
    * statistic (outlier-immune alternative to stddev). Two exact
    * interpolated-percentile passes over cents; the deviation stays in
    * BIGINT so the second median is as exact as the first.
    */
  val a21_mad = OpQuery(
    "a21_mad",
    """WITH c AS (
      |  SELECT l_returnflag AS g,
      |         CAST(TRUNC(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem
      |), med AS (
      |  SELECT g, CAST(ROUND(quantile_cont(cents, 0.5), 4) AS DOUBLE) AS m
      |  FROM c GROUP BY g
      |), dev AS (
      |  SELECT c.g, CAST(ABS(cents - CAST(m AS BIGINT)) AS BIGINT) AS d
      |  FROM c JOIN med ON c.g = med.g
      |)
      |SELECT g,
      |       CAST(ROUND(quantile_cont(d, 0.5), 4) AS DOUBLE) AS mad_cents
      |FROM dev GROUP BY g
      |ORDER BY g""".stripMargin) { (spark, dir) =>
    val c = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice") * 100).cast("long").as("cents"))
    val med = c.groupBy(col("g"))
      .agg(round(percentile(col("cents"), lit(0.5)), 4).as("m"))
    c.join(broadcast(med), "g")
      .select(col("g"), abs(col("cents") - col("m").cast("long")).as("d"))
      .groupBy(col("g"))
      .agg(round(percentile(col("d"), lit(0.5)), 4).as("mad_cents"))
      .orderBy(col("g"))
  }

  /** Bitwise operators: AND/OR/XOR/shifts over integer keys — flag
    * packing, bit-set membership, hash mixing all reduce to these.
    */
  val f_bitwise = OpQuery(
    "f_bitwise",
    """SELECT o_orderkey,
      |       CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
      |       CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
      |       CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS mixed,
      |       CAST(o_orderkey << 2 AS BIGINT) AS shl,
      |       CAST(o_orderkey >> 3 AS BIGINT) AS shr
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("low_byte"),
        col("o_orderkey").bitwiseOR(4096).as("with_flag"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("mixed"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"))
      .orderBy(col("o_orderkey"))
  }

  /** Cross-engine table checksum: an order-independent fingerprint —
    * SUM of a per-row md5-derived integer over a canonical string
    * rendering (numerics through DECIMAL casts). Any engine that can
    * md5 a string can recompute it: the standard reconciliation
    * primitive after a migration or replication hop. One scan, one
    * tiny aggregate.
    */
  val d14_checksum_audit = OpQuery(
    "d14_checksum_audit",
    """WITH canon AS (
      |  SELECT CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
      |         CAST(c_nationkey AS VARCHAR) || '|' ||
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
      |         c_mktsegment AS row_repr
      |  FROM customer
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(('0x' || substr(md5(row_repr), 1, 8)) AS BIGINT)) AS BIGINT)
      |         AS checksum
      |FROM canon""".stripMargin) { (spark, dir) =>
    val repr = concat_ws("|",
      col("c_custkey").cast("string"), col("c_name"),
      col("c_nationkey").cast("string"),
      col("c_acctbal").cast("decimal(18,2)").cast("string"),
      col("c_mktsegment"))
    t(spark, dir, "customer")
      .select(conv(substring(md5(repr), 1, 8), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
  }

  /** Schema'd JSON parsing: from_json with an explicit struct schema
    * (no inference), field access through the typed struct — the
    * structured counterpart to f_json's path extraction.
    */
  val p11_from_json = OpQuery(
    "p11_from_json",
    """SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin) { (spark, dir) =>
    val schema = StructType(Seq(StructField("k", IntegerType)))
    t(spark, dir, "events")
      .select(from_json(col("props"), schema).as("p"))
      .select((col("p.k") % 10).as("k_bucket"), col("p.k").as("k"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("k_bucket"))
  }

  val all: Seq[OpQuery] = Seq(
    a21_mad, f_bitwise, d14_checksum_audit, p11_from_json)
}
