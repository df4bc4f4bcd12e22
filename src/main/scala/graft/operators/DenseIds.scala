package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dictionary encoding to DENSE LONG ids (VERDICT r10 item 5): every
  * integral-id entry point in the ANN/top-k family
  * ([[Similarity.bruteForceTopK]], [[Similarity.hardNegatives]],
  * [[AnnIndex]], [[PqIndex]] — all of them ride ids through the
  * bounded-heap [[graft.expressions.TopKAgg]] as longs and loudly
  * REFUSE anything else) previously left a string-keyed corpus to
  * hand-roll its own id mapping. This operator closes that: dense
  * 1..k long ids over the distinct keys plus the REVERSIBLE mapping
  * table, both deterministic and SQL-replayable.
  *
  * Determinism: ids are assigned in KEY ORDER (the distributed
  * [[TotalOrder.rowNumber]] over the distinct-key set — a range
  * shuffle + per-partition offsets, never a single-reducer window), so
  * the assignment is `DENSE_RANK() OVER (ORDER BY key)` exactly: the
  * same corpus always encodes the same way, any SQL engine replays the
  * mapping (the `ids_dense_roundtrip` gate hash-oracles it), and —
  * unlike `zipWithUniqueId`, whose ids depend on partitioning — the
  * encoding is stable across layouts and reruns. The price is one
  * distinct + one sort-shuffle of the KEY SET (distinct-cardinality-
  * sized, not corpus-sized); at 100 TB the mapping is built once and
  * persisted next to the corpus like any dimension table.
  *
  * NULL keys cannot be dictionary-encoded: they get a NULL id
  * (retained, visibly unassigned — the row then falls out of every
  * integral-id operator's key join the same way a NULL join key
  * does everywhere else in SQL) rather than fusing into a fake shared
  * id or being silently dropped.
  */
object DenseIds {

  /** Encode: returns (df + `outCol` dense long id, mapping table
    * (`outCol`, keyCol)). The mapping's ids are 1..k in `keyCol` order
    * over the DISTINCT non-null keys.
    */
  def withDenseIds(df: DataFrame, keyCol: String,
      outCol: String = "dense_id"): (DataFrame, DataFrame) = {
    require(!df.columns.contains(outCol),
      s"withDenseIds: output column '$outCol' already exists")
    val mapping = TotalOrder.rowNumber(
        df.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct(),
        Seq(col(keyCol).asc), outCol)
      .select(col(outCol).cast("long").as(outCol), col(keyCol))
    // left join: a NULL-keyed row keeps its row with a NULL id; the
    // mapping side is distinct-cardinality-sized, so Catalyst
    // broadcasts it when it fits and hash-joins otherwise
    (df.join(mapping, Seq(keyCol), "left"), mapping)
  }

  /** INCREMENTAL dictionary growth: extend an existing mapping with the
    * keys of a new batch, appending new keys AFTER the current max id
    * (in key order among themselves) and leaving every existing id
    * untouched — the production contract for a persisted dictionary
    * (re-encoding the history on every ingest would invalidate every
    * downstream index keyed on the old ids). The cost is O(new batch
    * distinct + mapping anti-join), never a re-rank of the dictionary.
    *
    * Note the deliberate asymmetry with [[withDenseIds]]: a one-shot
    * build is globally key-ordered; a grown dictionary is key-ordered
    * only WITHIN each ingest generation. Rebuild from scratch when
    * global order matters more than id stability.
    */
  def extendDenseIds(mapping: DataFrame, df: DataFrame, keyCol: String,
      outCol: String = "dense_id"): DataFrame = {
    val maxId = mapping.agg(coalesce(max(col(outCol)), lit(0L)))
      .head().getLong(0)
    val newKeys = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct()
      .join(mapping.select(col(keyCol)), Seq(keyCol), "left_anti")
    val appended = TotalOrder.rowNumber(newKeys, Seq(col(keyCol).asc), outCol)
      .select((col(outCol).cast("long") + maxId).as(outCol), col(keyCol))
    mapping.unionByName(appended)
  }

  /** Decode: replace the dense id column `idCol` of `df` with the
    * original key, via the mapping returned by [[withDenseIds]]
    * (`mappingIdCol`/`mappingKeyCol` name the mapping's columns; the
    * restored key lands as `outCol`, defaulting to the mapping's key
    * name — pass distinct outCols when decoding several id columns of
    * one frame). Ids absent from the mapping (including NULL) decode
    * to NULL — visible, never dropped.
    */
  def decode(df: DataFrame, mapping: DataFrame, idCol: String,
      mappingIdCol: String, mappingKeyCol: String,
      outCol: String = ""): DataFrame = {
    val out = if (outCol.isEmpty) mappingKeyCol else outCol
    val m = mapping.select(col(mappingIdCol).as(idCol),
      col(mappingKeyCol).as(s"__key_$idCol"))
    df.join(m, Seq(idCol), "left")
      .drop(idCol)
      .withColumnRenamed(s"__key_$idCol", out)
  }
}
