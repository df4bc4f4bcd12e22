package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dense-id dictionary encoding: DENSE_RANK-by-key assignment, layout
  * independence, NULL-key visibility, decode inverse, and the collision
  * guard. The SQL replay of the id↔key bijection is the
  * `ids_dense_roundtrip` gate's territory.
  */
class DenseIdsSpec extends SparkSpec {
  import spark.implicits._

  test("ids are 1..k in key order, stable across partitionings") {
    val df = Seq("cherry", "apple", "banana", "apple", "cherry", "date")
      .toDF("key")
    val (enc, mapping) = DenseIds.withDenseIds(df, "key")
    val m = mapping.orderBy("dense_id")
      .as[(Long, String)].collect().toSeq
    assert(m === Seq((1L, "apple"), (2L, "banana"), (3L, "cherry"), (4L, "date")))
    assert(enc.count() === 6)
    // same data, different layout → identical assignment (the property
    // zipWithUniqueId does NOT have)
    val (_, m13) = DenseIds.withDenseIds(df.repartition(13), "key")
    assert(m13.orderBy("dense_id").as[(Long, String)].collect().toSeq === m)
  }

  test("NULL keys get NULL ids — retained and visible, never fused or dropped") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("key")
    val (enc, mapping) = DenseIds.withDenseIds(df, "key")
    assert(mapping.count() === 2) // NULL is not in the dictionary
    val rows = enc.select($"key", $"dense_id")
      .as[(Option[String], Option[Long])].collect()
    assert(rows.length === 4)
    assert(rows.filter(_._1.isEmpty).forall(_._2.isEmpty))
    assert(rows.filter(_._1.nonEmpty).forall(_._2.nonEmpty))
  }

  test("decode is the inverse of encode; unknown ids decode to NULL") {
    val df = Seq((10L, "x"), (20L, "y"), (30L, "x")).toDF("n", "key")
    val (enc, mapping) = DenseIds.withDenseIds(df, "key")
    val back = DenseIds.decode(enc.drop("key"), mapping,
        "dense_id", "dense_id", "key")
      .select($"n", $"key").as[(Long, String)].collect().toSet
    assert(back === Set((10L, "x"), (20L, "y"), (30L, "x")))
    val stray = Seq((99L, 777L)).toDF("n", "dense_id")
    val dec = DenseIds.decode(stray, mapping, "dense_id", "dense_id", "key")
      .select($"key").as[Option[String]].head()
    assert(dec.isEmpty)
  }

  test("extendDenseIds: existing ids frozen, new keys append after max in key order") {
    val df1 = Seq("banana", "date", "apple").toDF("key")
    val (_, m1) = DenseIds.withDenseIds(df1, "key")
    // second ingest: two known keys, two new ones (one sorting BEFORE
    // every existing key — it must still append, never re-rank)
    val df2 = Seq("apple", "cherry", "aardvark", "date").toDF("key")
    val m2 = DenseIds.extendDenseIds(m1, df2, "key")
    val got = m2.orderBy("dense_id").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "apple"), (2L, "banana"), (3L, "date"),
      (4L, "aardvark"), (5L, "cherry")))
    // idempotent growth: extending with already-known keys is a no-op
    assert(DenseIds.extendDenseIds(m2, df2, "key").count() === 5)
    // growing an EMPTY mapping is a plain build from id 1
    val empty = m1.limit(0)
    val fresh = DenseIds.extendDenseIds(empty, df1, "key")
      .orderBy("dense_id").as[(Long, String)].collect().toSeq
    assert(fresh === Seq((1L, "apple"), (2L, "banana"), (3L, "date")))
  }

  test("an existing output column is refused loudly") {
    val df = Seq(("a", 1L)).toDF("key", "dense_id")
    intercept[IllegalArgumentException] {
      DenseIds.withDenseIds(df, "key")
    }
  }
}
