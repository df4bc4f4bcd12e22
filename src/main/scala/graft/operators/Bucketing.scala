package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (hash-clustered) tables — the storage-layout contract that
  * makes repeated large joins and aggregations on a key SHUFFLE-FREE.
  *
  * At 100 TB the dominant cost of `fact ⨝ fact` is the exchange of both
  * sides; bucketing pays that shuffle ONCE at write time and amortizes
  * it over every subsequent join/aggregation on the bucket key: the scan
  * reports `HashPartitioning(key, nBuckets)` and `EnsureRequirements`
  * inserts no Exchange. Spark's bucket id is `pmod(murmur3(key), n)` —
  * the same function as a `repartition(n, key)` shuffle — so a
  * pre-repartitioned write produces exactly ONE file per bucket (each
  * task holds precisely the rows of its own bucket), which also
  * preserves the `sortBy` order per bucket (multi-file buckets lose the
  * sorted-scan guarantee).
  *
  * The reference pins its lakehouse tables to Delta + Unity Catalog
  * (01_config.ipynb:193-226); clustered layout there is Z-ORDER /
  * liquid clustering. This engine's [[ZOrder]] covers the multi-column
  * skipping half; bucketing covers the co-located-join half, which the
  * Delta OSS protocol itself expresses as Hive-style bucket specs.
  */
object Bucketing {

  /** Drop `table` from the session catalog AND clear its stale warehouse
    * directory. The in-memory catalog forgets tables between JVMs while
    * their managed directories persist — `saveAsTable` then refuses to
    * overwrite a location it no longer owns, so rerunnability across
    * sessions requires purging both.
    */
  def drop(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, table.toLowerCase)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  /** Write `df` as a managed parquet table bucketed into `buckets` on
    * `keys`, sorted within each bucket on the same keys, one file per
    * bucket (see object doc for why the pre-repartition guarantees
    * that). Idempotent: drops any prior incarnation first.
    */
  def writeBucketed(
      spark: SparkSession, table: String, df: DataFrame,
      keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key column")
    drop(spark, table)
    df.repartition(buckets, keys.map(col): _*)
      .write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Number of `Exchange hashpartitioning` nodes over any of `keys` in
    * the current (possibly adaptive) physical plan — the thing bucketing
    * exists to make ZERO for joins on the bucket key.
    */
  def keyExchanges(df: DataFrame, keys: Seq[String]): Int = {
    val plan = df.queryExecution.executedPlan.toString
    val pat = ("Exchange hashpartitioning\\((" + keys.mkString("|") + ")").r
    pat.findAllIn(plan).size
  }
}
