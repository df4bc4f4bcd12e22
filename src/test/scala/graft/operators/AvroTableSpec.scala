package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AvroTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro-").toString

  test("roundtrip: all supported primitive types, nulls included, multiset-exact") {
    val df = Seq(
      (1L, Some(10), Some(1.5), Some(2.5f), Some(true), Some("ab"), Some(Array[Byte](1, 2))),
      (2L, None, None, None, None, None, None),
      (3L, Some(-7), Some(-0.25), Some(0f), Some(false), Some(""), Some(Array.empty[Byte])))
      .toDF("id", "i", "d", "f", "b", "s", "bin")
    val dir = tmp()
    AvroTable.write(df, dir)
    val back = AvroTable.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    def canon(x: org.apache.spark.sql.DataFrame) = x
      .select($"id", $"i", $"d", $"f", $"b", $"s", hex($"bin").as("bin"))
      .collect().map(_.toString).sorted.toSeq
    assert(canon(back) === canon(df))
  }

  test("roundtrip at table scale splits into per-partition files and preserves counts") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice".cast("double").as("p"),
        $"o_orderstatus")
      .repartition(4)
    val dir = tmp()
    AvroTable.write(orders, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = AvroTable.read(spark, dir)
    assert(back.count() === orders.count())
    // exact decimal sums: double aggregation is order-sensitive in the
    // last ulp and partitions land in different orders per run
    val a = back.agg(sum($"p".cast("decimal(18,2)")), sum($"o_orderkey")).head()
    val b = orders.agg(sum($"p".cast("decimal(18,2)")), sum($"o_orderkey")).head()
    assert(a === b)
  }

  test("nested and decimal columns are refused at write; divergent schemas at read") {
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[IllegalArgumentException](AvroTable.write(nested, tmp()))
    assert(e.getMessage.contains("flat primitive"))
    val dec = Seq((1L, BigDecimal(1.5))).toDF("id", "d")
    intercept[IllegalArgumentException](AvroTable.write(dec, tmp()))
    // two writes with different schemas into one dir → loud refusal
    val dir = tmp()
    AvroTable.write(Seq((1L, "x")).toDF("id", "s"), dir)
    val extra = java.nio.file.Files.createTempDirectory("graft-avro2-").toString
    AvroTable.write(Seq((1L, 2L)).toDF("id", "n"), extra)
    val moved = new java.io.File(extra).listFiles().head
    java.nio.file.Files.move(moved.toPath,
      java.nio.file.Paths.get(dir, "part-zzz.avro"))
    val e2 = intercept[IllegalArgumentException](AvroTable.read(spark, dir))
    assert(e2.getMessage.contains("divergent schemas"))
  }
}
