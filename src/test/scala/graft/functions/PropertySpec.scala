package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.IronmanExprs._

/** Property-based pins (SURVEY.md §5): the D1 parser and the dashboard
  * formatter are mutual inverses over the valid domain, evaluated
  * through the real Spark expressions (one DataFrame per property batch,
  * not per case, to keep Spark round-trips bounded).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("parse(format(s)) == s for all positive seconds (batched samples)") {
    val secs = Gen.listOfN(300, Gen.chooseNum(1, 48 * 3600)).sample.get
    val rows = secs.toDF("s")
      .select($"s", parseTimeToSeconds(formatSeconds($"s")).cast("int").as("p"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"roundtrip broke at ${r.getInt(0)}"))
  }

  test("format(parse(t)) == t for canonical H:MM:SS strings") {
    val gen = for {
      h <- Gen.chooseNum(0, 47)
      m <- Gen.chooseNum(0, 59)
      s <- Gen.chooseNum(0, 59)
      if h + m + s > 0
    } yield f"$h%d:$m%02d:$s%02d"
    val strs = Gen.listOfN(300, gen).sample.get
    val rows = strs.toDF("t")
      .select($"t", formatSeconds(parseTimeToSeconds($"t")).as("f"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("status flags partition every designation into at most one true flag") {
    val gen = Gen.oneOf(
      Gen.oneOf("Finisher", "DNF", "DNS", "DQ", "finisher", "dnf", ""),
      Gen.alphaStr)
    val vals = Gen.listOfN(200, gen).sample.get
    val rows = vals.toDF("d")
      .select(
        statusFlag($"d", "FINISHER").cast("int") +
          statusFlag($"d", "DNF").cast("int") +
          statusFlag($"d", "DNS").cast("int") +
          statusFlag($"d", "DQ").cast("int"))
      .as[Int].collect()
    rows.foreach(n => assert(n <= 1))
  }

  test("surrogate key is deterministic and non-negative except Int.MinValue edge") {
    val vals = Gen.listOfN(200, Gen.alphaNumStr).sample.get
    val df = vals.toDF("v")
    val a = df.select(surrogateKey($"v")).as[Int].collect().toSeq
    val b = df.select(surrogateKey($"v")).as[Int].collect().toSeq
    assert(a == b)
    // abs(hash) >= 0 unless hash == Int.MinValue (documented edge, D4)
    a.foreach(k => assert(k >= 0 || k == Int.MinValue))
  }
}
