package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.ScaleExtras

class ScaleExtrasSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within its configured relative error") {
    val rows = ScaleExtras.a11_approx_distinct.build(spark, sf).collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr < 0.1, s"flag ${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("salted aggregation equals direct groupBy exactly") {
    val orders = Tables.load(spark, sf, "orders")
    val direct = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_rows"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedCountSum(orders, "o_custkey", "o_totalprice", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join as a multiset") {
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey".as("c_custkey"))
    val customer = Tables.load(spark, sf, "customer").select($"c_custkey", $"c_name")
    val plain = orders.join(customer, "c_custkey")
      .select($"o_orderkey", $"c_name").as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(orders, customer, Seq("c_custkey"), 4)
      .select($"o_orderkey", $"c_name").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }
}
