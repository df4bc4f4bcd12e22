package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintenance invariant on random mutation sequences: refreshing the
  * aggregate with each generation's CDC delta must equal the full
  * re-aggregation of the final generation — across inserts, deletes,
  * group-emptying, and brand-new groups.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(store: TableStore): Map[String, (Long, BigDecimal)] =
    store.read("agg").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
      .toMap

  test("incremental refresh across 3 random generations == full reagg (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val store = new TableStore(spark,
        Files.createTempDirectory(s"graft-ivm-$seed-").toString, retainVersions = 10)
      val groups = Seq("a", "b", "c", "d")
      def randomRows(n: Int): Seq[(Long, String, Double)] =
        (1 to n).map(_ => (rnd.nextInt(1000).toLong,
          groups(rnd.nextInt(groups.size)),
          math.round(rnd.nextDouble() * 10000) / 100.0))

      var current = randomRows(200).distinct
      store.overwrite("base", current.toDF("k", "g", "v"))
      store.overwrite("agg",
        IncrementalAgg.fullAggregate(store.read("base"), Seq("g"), "v"))

      (1 to 3).foreach { gen =>
        // mutate: drop ~1/3, add fresh rows, sometimes empty a group
        val dropped = current.filter(_ => rnd.nextInt(3) > 0)
        val victim = groups(rnd.nextInt(groups.size))
        val next = (dropped.filterNot(_._2 == victim) ++ randomRows(60)).distinct
        store.overwrite("base", next.toDF("k", "g", "v"))
        IncrementalAgg.refresh(store, "agg", "base", gen - 1, gen, Seq("g"), "v")
        current = next
      }

      val expected = IncrementalAgg
        .fullAggregate(store.read("base"), Seq("g"), "v")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)))))
        .toMap
      assert(agg(store) == expected, s"seed $seed diverged")
    }
  }

  test("NULL group keys maintain as ONE group, matching groupBy semantics") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivm-n-").toString, retainVersions = 10)
    store.overwrite("base",
      Seq((1L, Option("x"), 5.0), (2L, Option.empty[String], 7.0),
        (3L, Option.empty[String], 3.0)).toDF("k", "g", "v"))
    store.overwrite("agg",
      IncrementalAgg.fullAggregate(store.read("base"), Seq("g"), "v"))
    // delta touches the null group: one delete, one insert
    store.overwrite("base",
      Seq((1L, Option("x"), 5.0), (3L, Option.empty[String], 3.0),
        (4L, Option.empty[String], 9.0)).toDF("k", "g", "v"))
    IncrementalAgg.refresh(store, "agg", "base", 0, 1, Seq("g"), "v")
    val got = store.read("agg").collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1),
        r.getDecimal(2).doubleValue()))).toMap
    assert(got == Map(Some("x") -> ((1L, 5.0)), None -> ((2L, 12.0))),
      s"null group split or lost: $got")
  }

  test("groups reaching zero count disappear from the aggregate") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivm-z-").toString, retainVersions = 10)
    store.overwrite("base", Seq((1L, "x", 5.0), (2L, "y", 7.0)).toDF("k", "g", "v"))
    store.overwrite("agg",
      IncrementalAgg.fullAggregate(store.read("base"), Seq("g"), "v"))
    store.overwrite("base", Seq((2L, "y", 7.0)).toDF("k", "g", "v"))
    IncrementalAgg.refresh(store, "agg", "base", 0, 1, Seq("g"), "v")
    assert(agg(store).keySet == Set("y"))
  }

  private def mm(store: TableStore): Map[String, (Long, Any, Any)] =
    store.read("mm").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.get(2), r.get(3)))).toMap

  private def mmExpected(store: TableStore): Map[String, (Long, Any, Any)] =
    IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.get(2), r.get(3)))).toMap

  test("min/max refresh across random generations == full reagg (rescan only when hit)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val store = new TableStore(spark,
        Files.createTempDirectory(s"graft-ivmm-$seed-").toString, retainVersions = 10)
      val groups = Seq("a", "b", "c")
      def rows(n: Int) = (1 to n).map(_ => (rnd.nextInt(1000).toLong,
        groups(rnd.nextInt(groups.size)), rnd.nextInt(500).toDouble))

      var current = rows(120).distinct
      store.overwrite("base", current.toDF("k", "g", "v"))
      store.overwrite("mm",
        IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
      (1 to 3).foreach { gen =>
        val next = (current.filter(_ => rnd.nextInt(3) > 0) ++ rows(40)).distinct
        store.overwrite("base", next.toDF("k", "g", "v"))
        IncrementalAgg.refreshMinMax(store, "mm", "base", gen - 1, gen, Seq("g"), "v")
        current = next
      }
      assert(mm(store) == mmExpected(store), s"seed $seed diverged")
    }
  }

  test("min/max: deleting the stored minimum forces the rescan to the true runner-up") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmm-hit-").toString, retainVersions = 10)
    store.overwrite("base",
      Seq((1L, "g", 1.0), (2L, "g", 5.0), (3L, "g", 9.0)).toDF("k", "g", "v"))
    store.overwrite("mm",
      IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
    // delete the min row AND insert something above the runner-up: the
    // incremental path alone would keep min=1.0
    store.overwrite("base",
      Seq((2L, "g", 5.0), (3L, "g", 9.0), (4L, "g", 7.0)).toDF("k", "g", "v"))
    IncrementalAgg.refreshMinMax(store, "mm", "base", 0, 1, Seq("g"), "v")
    assert(mm(store) == Map("g" -> ((3L, 5.0, 9.0))))
  }

  test("min/max: interior deletes refresh without touching the extrema") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmm-int-").toString, retainVersions = 10)
    store.overwrite("base",
      Seq((1L, "g", 1.0), (2L, "g", 5.0), (3L, "g", 9.0)).toDF("k", "g", "v"))
    store.overwrite("mm",
      IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
    store.overwrite("base",
      Seq((1L, "g", 1.0), (3L, "g", 9.0), (4L, "g", 2.0)).toDF("k", "g", "v"))
    IncrementalAgg.refreshMinMax(store, "mm", "base", 0, 1, Seq("g"), "v")
    assert(mm(store) == Map("g" -> ((3L, 1.0, 9.0))))
  }

  test("min/max: a NULL-keyed group hit at its extremum is rescanned, not dropped") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmm-null-").toString, retainVersions = 10)
    store.overwrite("base",
      Seq((1L, None, 5.0), (2L, None, 9.0), (3L, Some("g"), 1.0))
        .toDF("k", "g", "v"))
    store.overwrite("mm",
      IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
    // delete the NULL group's min: the rescan join must match NULL keys
    store.overwrite("base",
      Seq((2L, None, 9.0), (3L, Some("g"), 1.0)).toDF("k", "g", "v"))
    IncrementalAgg.refreshMinMax(store, "mm", "base", 0, 1, Seq("g"), "v")
    val nullGroup = store.read("mm").filter(col("g").isNull)
      .select("n_rows", "min_v", "max_v").collect()
    assert(nullGroup.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ===
      Seq((1L, 9.0, 9.0)))
  }

  test("min/max: a group emptied by deletes disappears") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft-ivmm-gone-").toString, retainVersions = 10)
    store.overwrite("base",
      Seq((1L, "x", 5.0), (2L, "y", 7.0)).toDF("k", "g", "v"))
    store.overwrite("mm",
      IncrementalAgg.fullMinMax(store.read("base"), Seq("g"), "v"))
    store.overwrite("base", Seq((2L, "y", 7.0)).toDF("k", "g", "v"))
    IncrementalAgg.refreshMinMax(store, "mm", "base", 0, 1, Seq("g"), "v")
    assert(mm(store).keySet == Set("y"))
  }
}
