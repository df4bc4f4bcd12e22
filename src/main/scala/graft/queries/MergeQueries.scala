package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Merge

/** SURVEY.md §2.1 S6/S7 — the Delta-MERGE emulation, surfaced as oracle
  * queries: target/source are deterministic slices of `orders`/`customer`
  * and the oracle SQL states the MERGE contract relationally, so the
  * DuckDB compare proves the rewrite's semantics (not just row counts).
  */
object MergeQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** S6 insert-only MERGE: keys already in the target are never updated;
    * absent keys are inserted. Target = orders with key % 3 != 0; source =
    * all orders restamped 'SRC' (so any update would be visible).
    * Ref: 02_bronze.ipynb:300-320 (cell-8).
    */
  val s6_insert_only_merge = OpQuery(
    "s6_insert_only_merge",
    """WITH target AS (
      |  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
      |), source AS (
      |  SELECT o_orderkey, 'SRC' AS o_orderstatus FROM orders
      |)
      |SELECT o_orderkey, o_orderstatus FROM target
      |UNION ALL
      |SELECT s.o_orderkey, s.o_orderstatus FROM source s
      |WHERE NOT EXISTS (SELECT 1 FROM target x WHERE x.o_orderkey = s.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
    val orders = t(spark, dir, "orders")
    val target = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val source = orders.select(col("o_orderkey"), lit("SRC").as("o_orderstatus"))
    Merge.insertOnly(target, source, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** S7 SCD1 MERGE: matched keys take the source's listed attributes and
    * keep the rest; unmatched source keys are inserted whole. Target =
    * customers with key % 4 != 0 plus a 'stable' column the merge must
    * not touch; source = all customers with an updated segment.
    * Ref: 04a_gold_dim_athletes.ipynb:300-333 (cell-10).
    */
  val s7_scd1_merge = OpQuery(
    "s7_scd1_merge",
    """WITH target AS (
      |  SELECT c_custkey, c_mktsegment, concat('orig_', CAST(c_nationkey AS VARCHAR)) AS stable
      |  FROM customer WHERE c_custkey % 4 <> 0
      |), source AS (
      |  SELECT c_custkey, concat('NEW_', c_mktsegment) AS c_mktsegment,
      |         'src_stable' AS stable
      |  FROM customer
      |)
      |SELECT t.c_custkey, s.c_mktsegment, t.stable
      |FROM target t JOIN source s ON t.c_custkey = s.c_custkey
      |UNION ALL
      |SELECT s.c_custkey, s.c_mktsegment, s.stable
      |FROM source s
      |WHERE NOT EXISTS (SELECT 1 FROM target x WHERE x.c_custkey = s.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val customer = t(spark, dir, "customer")
    val target = customer.filter(col("c_custkey") % 4 =!= 0)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        concat(lit("orig_"), col("c_nationkey").cast("string")).as("stable"))
    val source = customer.select(
      col("c_custkey"),
      concat(lit("NEW_"), col("c_mktsegment")).as("c_mktsegment"),
      lit("src_stable").as("stable"))
    Merge.scd1(target, source, Seq("c_custkey"), updateCols = Seq("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** SCD Type 2 MERGE: effective-dated dimension history. Target =
    * current snapshot (keys % 3 != 0) plus closed historical rows for
    * keys % 5 = 0; source = all customers with the segment moved for
    * keys % 4 = 0. The oracle states every clause relationally: history
    * passes through, unchanged matches pass, changed matches close out
    * at the effective date AND re-open as the new current version, and
    * brand-new keys insert as current. `is_current` emitted as INT (the
    * driver hash has no verified bool parity rule).
    */
  val s15_scd2_merge = OpQuery(
    "s15_scd2_merge",
    """WITH cur AS (
      |  SELECT c_custkey, c_mktsegment,
      |         '2023-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, TRUE AS cur_flag
      |  FROM customer WHERE c_custkey % 3 <> 0
      |), hist AS (
      |  SELECT c_custkey, concat('OLD_', c_mktsegment) AS c_mktsegment,
      |         '2022-01-01' AS valid_from, '2023-01-01' AS valid_to, FALSE AS cur_flag
      |  FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 0
      |), src AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 4 = 0 THEN 'SEG_MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer
      |), changed AS (
      |  SELECT c.c_custkey FROM cur c JOIN src s USING (c_custkey)
      |  WHERE s.c_mktsegment IS DISTINCT FROM c.c_mktsegment
      |)
      |SELECT c_custkey, c_mktsegment, valid_from, valid_to, CAST(cur_flag AS INT) AS is_current
      |FROM (
      |  SELECT * FROM hist
      |  UNION ALL
      |  SELECT c.* FROM cur c
      |  WHERE NOT EXISTS (SELECT 1 FROM changed ch WHERE ch.c_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT c.c_custkey, c.c_mktsegment, c.valid_from, '2024-06-01', FALSE
      |  FROM cur c JOIN changed ch ON ch.c_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT s.c_custkey, s.c_mktsegment, '2024-06-01', NULL, TRUE
      |  FROM src s JOIN changed ch ON ch.c_custkey = s.c_custkey
      |  UNION ALL
      |  SELECT s.c_custkey, s.c_mktsegment, '2024-06-01', NULL, TRUE
      |  FROM src s
      |  WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = s.c_custkey)
      |)
      |ORDER BY c_custkey, valid_from, is_current""".stripMargin) { (spark, dir) =>
    val customer = t(spark, dir, "customer")
    val cur = customer.filter(col("c_custkey") % 3 =!= 0)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        lit("2023-01-01").as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current"))
    val hist = customer.filter(col("c_custkey") % 3 =!= 0 && col("c_custkey") % 5 === 0)
      .select(
        col("c_custkey"), concat(lit("OLD_"), col("c_mktsegment")).as("c_mktsegment"),
        lit("2022-01-01").as("valid_from"),
        lit("2023-01-01").as("valid_to"),
        lit(false).as("is_current"))
    val source = customer.select(
      col("c_custkey"),
      when(col("c_custkey") % 4 === 0, lit("SEG_MOVED"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    Merge.scd2(cur.unionByName(hist), source,
        keys = Seq("c_custkey"), trackCols = Seq("c_mktsegment"),
        effectiveDate = "2024-06-01")
      .withColumn("is_current", col("is_current").cast("int"))
      .orderBy(col("c_custkey"), col("valid_from"), col("is_current"))
  }

  /** Full-sync MERGE (`WHEN NOT MATCHED BY SOURCE THEN DELETE`): the
    * target mirrors the source extract exactly — matched rows take the
    * source's segment and keep target-only columns, unmatched source
    * rows insert, and target keys missing from the source drop.
    */
  val s16_full_sync_merge = OpQuery(
    "s16_full_sync_merge",
    """WITH target AS (
      |  SELECT c_custkey, c_mktsegment,
      |         concat('keep_', CAST(c_nationkey AS VARCHAR)) AS stable
      |  FROM customer WHERE c_custkey % 3 <> 0
      |), source AS (
      |  SELECT c_custkey, concat('SYNC_', c_mktsegment) AS c_mktsegment,
      |         'src_stable' AS stable
      |  FROM customer WHERE c_custkey % 2 = 0
      |)
      |SELECT t.c_custkey, s.c_mktsegment, t.stable
      |FROM target t JOIN source s ON t.c_custkey = s.c_custkey
      |UNION ALL
      |SELECT s.c_custkey, s.c_mktsegment, s.stable
      |FROM source s
      |WHERE NOT EXISTS (SELECT 1 FROM target x WHERE x.c_custkey = s.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val customer = t(spark, dir, "customer")
    val target = customer.filter(col("c_custkey") % 3 =!= 0)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        concat(lit("keep_"), col("c_nationkey").cast("string")).as("stable"))
    val source = customer.filter(col("c_custkey") % 2 === 0)
      .select(
        col("c_custkey"),
        concat(lit("SYNC_"), col("c_mktsegment")).as("c_mktsegment"),
        lit("src_stable").as("stable"))
    Merge.fullSync(target, source, Seq("c_custkey"), updateCols = Seq("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Partition-aligned SCD1 MERGE through the store: the target is a
    * partitioned table (part = c_custkey % 5), the source touches ONLY
    * partitions {0,1} (updates for key % 4 = 0 plus brand-new keys at
    * +200000 — which stay in-partition because 200000 % 5 = 0), and
    * [[Merge.scd1PartitionAligned]] rewrites only those two partitions;
    * partitions 2-4 pass through from files never reopened. The oracle
    * states the full merge relationally, so the compare proves the
    * pruned rewrite equals the unpruned semantics.
    */
  val s18_scd1_aligned = OpQuery(
    "s18_scd1_aligned",
    """WITH target AS (
      |  SELECT c_custkey, CAST(c_custkey % 5 AS INT) AS part, c_mktsegment,
      |         concat('orig_', CAST(c_nationkey AS VARCHAR)) AS stable
      |  FROM customer
      |), source AS (
      |  SELECT c_custkey, CAST(c_custkey % 5 AS INT) AS part,
      |         concat('NEW_', c_mktsegment) AS c_mktsegment, 'src_stable' AS stable
      |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 5 IN (0, 1)
      |  UNION ALL
      |  SELECT c_custkey + 200000, CAST((c_custkey + 200000) % 5 AS INT),
      |         'INSERTED', 'ins_stable'
      |  FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 5 IN (0, 1)
      |)
      |SELECT t.c_custkey, t.part, s.c_mktsegment, t.stable
      |FROM target t JOIN source s ON t.c_custkey = s.c_custkey
      |UNION ALL
      |SELECT t.c_custkey, t.part, t.c_mktsegment, t.stable
      |FROM target t
      |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = t.c_custkey)
      |UNION ALL
      |SELECT s.c_custkey, s.part, s.c_mktsegment, s.stable
      |FROM source s
      |WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.c_custkey = s.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-scd1a-gate-")
    val store = new graft.operators.TableStore(spark, scratch.toString)
    val customer = t(spark, dir, "customer")
    // part cast to INT so the in-memory source matches the partition-dir
    // inferred type on read-back (alignSchemas refuses type conflicts)
    val part = (col("c_custkey") % 5).cast("int").as("part")
    store.overwrite("dim", customer.select(
      col("c_custkey"), part, col("c_mktsegment"),
      concat(lit("orig_"), col("c_nationkey").cast("string")).as("stable")),
      partitionBy = Seq("part"))
    val updates = customer
      .filter(col("c_custkey") % 4 === 0 && (col("c_custkey") % 5).isin(0, 1))
      .select(col("c_custkey"), part,
        concat(lit("NEW_"), col("c_mktsegment")).as("c_mktsegment"),
        lit("src_stable").as("stable"))
    val inserts = customer
      .filter(col("c_custkey") % 97 === 0 && (col("c_custkey") % 5).isin(0, 1))
      .select((col("c_custkey") + 200000).as("c_custkey"),
        ((col("c_custkey") + 200000) % 5).cast("int").as("part"),
        lit("INSERTED").as("c_mktsegment"), lit("ins_stable").as("stable"))
    Merge.scd1PartitionAligned(store, "dim", updates.unionByName(inserts),
      Seq("c_custkey"), updateCols = Seq("c_mktsegment"), partCol = "part")
    store.read("dim")
      .select(col("c_custkey"), col("part").cast("int").as("part"),
        col("c_mktsegment"), col("stable"))
      .orderBy(col("c_custkey"))
  }

  /** Partition-aligned SCD2 MERGE through the store: history maintenance
    * that opens only the partitions the source touches. Bootstrap load
    * at 2024-01-01 (everything current), then a second load confined to
    * partitions {0,1}: segment moved for key % 4 = 0, brand-new keys at
    * +200000. Changed keys close out and reopen IN their partition;
    * partitions 2-4 keep their bootstrap files untouched. Oracle states
    * every SCD2 clause relationally over the same two loads.
    */
  val s19_scd2_aligned = OpQuery(
    "s19_scd2_aligned",
    """WITH cur AS (
      |  SELECT c_custkey, CAST(c_custkey % 5 AS INT) AS part, c_mktsegment,
      |         '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to, TRUE AS f
      |  FROM customer
      |), src AS (
      |  SELECT c_custkey, CAST(c_custkey % 5 AS INT) AS part,
      |         CASE WHEN c_custkey % 4 = 0 THEN 'SEG_MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 5 IN (0, 1)
      |  UNION ALL
      |  SELECT c_custkey + 200000, CAST((c_custkey + 200000) % 5 AS INT), 'BRAND_NEW'
      |  FROM customer WHERE c_custkey % 97 = 0 AND c_custkey % 5 IN (0, 1)
      |), changed AS (
      |  SELECT c.c_custkey FROM cur c JOIN src s ON s.c_custkey = c.c_custkey
      |  WHERE s.c_mktsegment IS DISTINCT FROM c.c_mktsegment
      |)
      |SELECT c_custkey, part, c_mktsegment, valid_from, valid_to,
      |       CAST(f AS INT) AS is_current
      |FROM (
      |  SELECT c.c_custkey, c.part, c.c_mktsegment, c.valid_from, c.valid_to, c.f
      |  FROM cur c
      |  WHERE NOT EXISTS (SELECT 1 FROM changed ch WHERE ch.c_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT c.c_custkey, c.part, c.c_mktsegment, c.valid_from, '2024-06-01', FALSE
      |  FROM cur c JOIN changed ch ON ch.c_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT s.c_custkey, s.part, s.c_mktsegment, '2024-06-01', NULL, TRUE
      |  FROM src s JOIN changed ch ON ch.c_custkey = s.c_custkey
      |  UNION ALL
      |  SELECT s.c_custkey, s.part, s.c_mktsegment, '2024-06-01', NULL, TRUE
      |  FROM src s
      |  WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = s.c_custkey)
      |)
      |ORDER BY c_custkey, valid_from, is_current""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-scd2a-gate-")
    val store = new graft.operators.TableStore(spark, scratch.toString)
    val customer = t(spark, dir, "customer")
    val part = (col("c_custkey") % 5).cast("int").as("part")
    Merge.scd2PartitionAligned(store, "dim",
      customer.select(col("c_custkey"), part, col("c_mktsegment")),
      keys = Seq("c_custkey"), trackCols = Seq("c_mktsegment"),
      effectiveDate = "2024-01-01", partCol = "part")
    val load2 = customer.filter((col("c_custkey") % 5).isin(0, 1))
      .select(col("c_custkey"), part,
        when(col("c_custkey") % 4 === 0, lit("SEG_MOVED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      .unionByName(customer
        .filter(col("c_custkey") % 97 === 0 && (col("c_custkey") % 5).isin(0, 1))
        .select((col("c_custkey") + 200000).as("c_custkey"),
          ((col("c_custkey") + 200000) % 5).cast("int").as("part"),
          lit("BRAND_NEW").as("c_mktsegment")))
    Merge.scd2PartitionAligned(store, "dim", load2,
      keys = Seq("c_custkey"), trackCols = Seq("c_mktsegment"),
      effectiveDate = "2024-06-01", partCol = "part")
    store.read("dim")
      .select(col("c_custkey"), col("part").cast("int").as("part"),
        col("c_mktsegment"), col("valid_from"), col("valid_to"),
        col("is_current").cast("int").as("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"), col("is_current"))
  }

  /** DML surface: UPDATE then DELETE as versioned generations on the
    * store. The update's assignments see OLD row values (both reference
    * c_acctbal before the change); the delete drops key % 11 = 0; the
    * oracle states both relationally. Each DML lands as its own
    * generation, so v0→v2 history stays queryable.
    */
  val s17_update_delete = OpQuery(
    "s17_update_delete",
    """SELECT c_custkey,
      |       CASE WHEN c_custkey % 6 = 0 THEN concat('U_', c_mktsegment)
      |            ELSE c_mktsegment END AS c_mktsegment,
      |       CAST(CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS DOUBLE) AS bal,
      |       CAST(CASE WHEN c_custkey % 6 = 0 THEN c_acctbal ELSE 0.0 END AS DOUBLE) AS old_bal
      |FROM customer
      |WHERE c_custkey % 11 <> 0
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-dml-gate-")
    val store = new graft.operators.TableStore(spark, scratch.toString)
    val customer = t(spark, dir, "customer")
    store.overwrite("t", customer.select(
      col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal").as("bal"), lit(0.0).as("old_bal")))
    // both assignments reference the PRE-update bal — SQL UPDATE semantics
    store.updateWhere("t", col("c_custkey") % 6 === 0, Map(
      "c_mktsegment" -> concat(lit("U_"), col("c_mktsegment")),
      "bal" -> (col("bal") + 100),
      "old_bal" -> col("bal")))
    store.deleteWhere("t", col("c_custkey") % 11 === 0)
    store.read("t").orderBy(col("c_custkey"))
  }

  /** Change data feed over the versioned store: customer is written as
    * generation 0, then overwritten with deletes (key % 7 = 0 removed)
    * and updates (segment rewritten for key % 10 = 0) as generation 1;
    * `changes(0, 1)` must emit exactly the delete/insert row diff the
    * oracle derives relationally with EXCEPT ALL. Updates appear as
    * their delete+insert pair, so an updated key sorts as two rows.
    */
  val cdc_changes = OpQuery(
    "cdc_changes",
    """WITH v0 AS (
      |  SELECT c_custkey, c_mktsegment FROM customer
      |), v1 AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 7 <> 0
      |)
      |SELECT c_custkey, c_mktsegment, 'insert' AS change_type
      |FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)
      |UNION ALL
      |SELECT c_custkey, c_mktsegment, 'delete' AS change_type
      |FROM (SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1)
      |ORDER BY c_custkey, change_type""".stripMargin) { (spark, dir) =>
    val scratch = graft.queries.GateScratch.dir("graft-cdc-gate-")
    val store = new graft.operators.TableStore(spark, scratch.toString)
    val customer = t(spark, dir, "customer")
    val v0 = customer.select(col("c_custkey"), col("c_mktsegment"))
    val v1 = customer.filter(col("c_custkey") % 7 =!= 0)
      .select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    store.overwrite("t", v0)
    store.overwrite("t", v1)
    store.changes("t", 0, 1)
      .withColumnRenamed("_change_type", "change_type")
      .orderBy(col("c_custkey"), col("change_type"))
  }

  /** Incremental view maintenance: the customer table mutates v0 → v1
    * (same recipe as `cdc_changes`: key % 7 = 0 deleted, segment
    * rewritten for key % 10 = 0), and the maintained per-segment
    * aggregate — built over v0, refreshed ONLY with the CDC delta —
    * must equal the oracle's direct full aggregation of v1.
    */
  val ivm_refresh = OpQuery(
    "ivm_refresh",
    """WITH v1 AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment,
      |         c_acctbal
      |  FROM customer WHERE c_custkey % 7 <> 0
      |)
      |SELECT c_mktsegment,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_c_acctbal
      |FROM v1
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    import graft.operators.{IncrementalAgg, TableStore}
    val scratch = graft.queries.GateScratch.dir("graft-ivm-gate-")
    val store = new TableStore(spark, scratch.toString)
    val customer = t(spark, dir, "customer")
    val v0 = customer.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val v1 = customer.filter(col("c_custkey") % 7 =!= 0)
      .select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("CHANGED"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        col("c_acctbal"))
    store.overwrite("base", v0)
    store.overwrite("agg",
      IncrementalAgg.fullAggregate(store.read("base"), Seq("c_mktsegment"), "c_acctbal"))
    store.overwrite("base", v1)
    IncrementalAgg.refresh(store, "agg", "base", 0, 1,
      Seq("c_mktsegment"), "c_acctbal")
    store.read("agg")
      .select(
        col("c_mktsegment"), col("n_rows"),
        col("total_c_acctbal").cast("double").as("total_c_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[OpQuery] = Seq(
    s6_insert_only_merge, s7_scd1_merge, s15_scd2_merge, s16_full_sync_merge,
    s17_update_delete, cdc_changes, ivm_refresh, s18_scd1_aligned,
    s19_scd2_aligned)
}
