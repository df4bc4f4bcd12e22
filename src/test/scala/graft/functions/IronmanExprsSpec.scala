package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec
import graft.functions.IronmanExprs._

class IronmanExprsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def evalTimes(values: Seq[String]): Seq[Option[Int]] =
    values.toDF("t")
      .select(parseTimeToSeconds($"t").cast("int").as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq

  test("D1 parse_time_to_seconds: H:MM:SS, nulls, zero-as-null") {
    val in = Seq("8:06:22", "0:47:50", "16:59:59", null, "0:00:00")
    assert(evalTimes(in) == Seq(
      Some(8 * 3600 + 6 * 60 + 22), Some(47 * 60 + 50),
      Some(16 * 3600 + 59 * 60 + 59), None, None))
  }

  test("D1 partial/malformed input coalesces missing parts to 0") {
    // "5:30" -> 5h 30m (parts 0,1 present, second missing -> 0)
    assert(evalTimes(Seq("5:30")) == Seq(Some(5 * 3600 + 30 * 60)))
    assert(evalTimes(Seq("bad")) == Seq(None)) // all parts null -> sum 0 -> NULL
  }

  test("formatSeconds round-trips parse for H:MM:SS values") {
    val secs = Seq(29182, 2870, 61199, 3600, 59, 86399)
    val out = secs.toDF("s")
      .select(formatSeconds($"s").as("f"))
      .as[String].collect().toSeq
    assert(out == Seq("8:06:22", "0:47:50", "16:59:59", "1:00:00", "0:00:59", "23:59:59"))
    // round trip (parse(format(s)) == s) holds for all nonzero seconds
    val rt = secs.toDF("s")
      .select(parseTimeToSeconds(formatSeconds($"s")).cast("int").as("p"), $"s")
      .collect()
    rt.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("D2/D3 name cleaning strips punctuation, diacritics and lowercases") {
    val df = Seq("Lucy Charles-Barclay", "Solveig Løvseth", "Sam Laidlow")
      .toDF("name").select(cleanName($"name").as("c")).as[String].collect().toSeq
    assert(df == Seq("lucycharlesbarclay", "solveiglvseth", "samlaidlow"))
  }

  test("D3 natural key: null country becomes UNKNOWN") {
    val df = Seq(("Kat Matthews", null: String), ("Sam Laidlow", "FR"))
      .toDF("name", "country")
      .select(athleteNaturalKey($"name", $"country").as("k")).as[String].collect().toSeq
    assert(df == Seq("katmatthews_unknown", "samlaidlow_fr"))
  }

  test("D4 surrogate keys equal abs(hash(...)) with Spark Murmur3") {
    val df = Seq(("Sam Laidlow", "FR"), ("Kat Matthews", null: String))
      .toDF("name", "country")
    val ours = df.select(athleteSurrogateKey($"name", $"country").as("k"))
      .as[Int].collect().toSeq
    // D3/D4 asymmetry: hash input for null country is concat_ws("_", name)
    val expected = df.select(abs(hash(concat_ws("_", $"name", $"country"))).as("k"))
      .as[Int].collect().toSeq
    assert(ours == expected)
    // null-country hash differs from hashing "name_UNKNOWN"
    val unk = spark.sql("SELECT abs(hash('Kat Matthews_UNKNOWN'))").as[Int].head()
    assert(ours(1) != unk)
  }

  test("D5 status flags never null, equality on UPPER") {
    val df = Seq("Finisher", "DNF", "dns", "DQ", null)
      .toDF("d")
      .select(
        statusFlag($"d", "FINISHER").as("f"),
        statusFlag($"d", "DNS").as("dns"))
      .collect()
    assert(df.map(_.getBoolean(0)).toSeq == Seq(true, false, false, false, false))
    assert(df.map(_.getBoolean(1)).toSeq == Seq(false, false, true, false, false))
  }

  test("D6 calculated total propagates nulls") {
    val rows = Seq(
      (Some(100), Some(10), Some(200), Some(10), Some(300)),
      (Some(100), None, Some(200), Some(10), Some(300)))
      .toDF("sw", "t1", "bk", "t2", "rn")
      .select(calculatedTotalSeconds($"sw", $"t1", $"bk", $"t2", $"rn").as("c"))
      .collect()
    assert(rows(0).getInt(0) == 620)
    assert(rows(1).isNullAt(0))
  }

  test("D9 name split: single-token names have null last_name") {
    val rows = Seq("Sam Laidlow", "Madonna", "Jan Van Der Berg")
      .toDF("n")
      .select(firstName($"n").as("f"), lastName($"n").as("l"))
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Sam", "Madonna", "Jan"))
    assert(rows.map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("Laidlow"), None, Some("Berg")))
  }

  test("D10 division parsing: gender, pro, age bounds, description") {
    val dims = Table(
      ("division", "gender", "pro", "start", "end", "desc"),
      ("MPRO", "M", true, None, None, "Male Professional"),
      ("FPRO", "F", true, None, None, "Female Professional"),
      ("M18-24", "M", false, Some(18), Some(24), "Male Age 18 to 24"),
      ("F80-84", "F", false, Some(80), Some(84), "Female Age 80 to 84"),
      ("HC", "UNKNOWN", false, None, None, "HC"),
      ("PC/ID", "UNKNOWN", false, None, None, "PC/ID"),
      ("MGUIDE", "M", false, None, None, "MGUIDE"))
    forAll(dims) { (division, gender, pro, start, end, desc) =>
      val r = Seq(division).toDF("division")
        .select(
          divisionGender($"division").as("g"),
          isProfessional($"division").as("p"),
          ageGroupStart($"division").as("s"),
          ageGroupEnd($"division").as("e"),
          divisionDescription(
            $"division", divisionGender($"division"), isProfessional($"division"),
            ageGroupStart($"division"), ageGroupEnd($"division")).as("d"))
        .head()
      assert(r.getString(0) == gender)
      assert(r.getBoolean(1) == pro)
      assert((if (r.isNullAt(2)) None else Some(r.getInt(2))) == start)
      assert((if (r.isNullAt(3)) None else Some(r.getInt(3))) == end)
      assert(r.getString(4) == desc)
    }
  }
}
